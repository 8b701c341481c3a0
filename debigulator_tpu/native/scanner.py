"""Python-facing wrappers over the native scanner / inflate / checksums."""

from __future__ import annotations

import ctypes

import numpy as np

from debigulator_tpu import constants as C
from debigulator_tpu.native import get_lib
from debigulator_tpu.ops.inflate_ref import BlockInfo, InflateError


class _BlockRec(ctypes.Structure):
    _fields_ = [
        ("start_bit", ctypes.c_uint64),
        ("data_start_bit", ctypes.c_uint64),
        ("end_bit", ctypes.c_uint64),
        ("out_start", ctypes.c_uint64),
        ("out_size", ctypes.c_uint64),
        ("btype", ctypes.c_int32),
        ("bfinal", ctypes.c_int32),
    ]


def available() -> bool:
    return get_lib() is not None


def _scan_raw(data: bytes, produce_output: bool, cell_bits: int = 0):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    max_blocks = max(64, len(data) // 16 + 16)
    blocks = (_BlockRec * max_blocks)()
    lengths = np.zeros(max_blocks * 320, np.int32)
    out_cap = 0
    out_buf = None
    out_ptr = None
    if produce_output:
        # DEFLATE expands at most 1032x (stored floor ~). Start from a
        # generous heuristic and retry on -3.
        out_cap = max(1024, len(data) * 4)
    out_size = ctypes.c_uint64(0)
    cell_states = cell_pend = None
    cs_ptr = cp_ptr = None
    max_cells = 0
    n_cells = ctypes.c_int64(0)
    mct = ctypes.c_int32(0)

    def _alloc_cells():
        # Every block is padded to a cell boundary, so the bound must grow
        # with max_blocks (streams like extraturns.png pack 800+ sub-cell
        # fixed blocks into a few KB).
        nonlocal cell_states, cell_pend, cs_ptr, cp_ptr, max_cells
        max_cells = (len(data) * 8) // cell_bits + max_blocks + 16
        cell_states = np.zeros(max_cells, np.int64)
        cell_pend = np.zeros(max_cells, np.int32)
        cs_ptr = cell_states.ctypes.data_as(ctypes.c_void_p)
        cp_ptr = cell_pend.ctypes.data_as(ctypes.c_void_p)

    if cell_bits:
        _alloc_cells()
    while True:
        if produce_output:
            out_buf = np.zeros(out_cap, np.uint8)
            out_ptr = out_buf.ctypes.data_as(ctypes.c_void_p)
        nb = lib.dbg_scan(
            data,
            len(data),
            ctypes.cast(blocks, ctypes.c_void_p),
            max_blocks,
            lengths.ctypes.data_as(ctypes.c_void_p),
            out_ptr,
            out_cap,
            ctypes.byref(out_size),
            cell_bits,
            cs_ptr,
            cp_ptr,
            max_cells,
            ctypes.byref(n_cells),
            ctypes.byref(mct),
        )
        if nb == -3 and produce_output:
            out_cap *= 4
            continue
        if nb == -2:
            max_blocks *= 4
            blocks = (_BlockRec * max_blocks)()
            lengths = np.zeros(max_blocks * 320, np.int32)
            if cell_bits:
                _alloc_cells()
            continue
        if nb == -4 and cell_bits:
            max_blocks *= 4
            blocks = (_BlockRec * max_blocks)()
            lengths = np.zeros(max_blocks * 320, np.int32)
            _alloc_cells()
            continue
        if nb < 0:
            raise InflateError(f"native scan failed (code {nb})")
        break
    cells = None
    if cell_bits:
        cells = (cell_states[: n_cells.value], cell_pend[: n_cells.value],
                 int(mct.value))
    return int(nb), blocks, lengths, out_buf, int(out_size.value), cells


def scan_stream(data: bytes, cell_bits: int = 0):
    """Block index + per-block code lengths via native code (no output).

    With cell_bits > 0 also returns exact per-cell entry states (appended
    as a third element): (blocks, lengths, (cell_states, cell_pend)).
    """
    nb, blocks, lengths, _, _, cells = _scan_raw(
        data, produce_output=False, cell_bits=cell_bits)
    infos, lens = [], []
    for i in range(nb):
        r = blocks[i]
        infos.append(
            BlockInfo(
                start_bit=int(r.start_bit),
                data_start_bit=int(r.data_start_bit),
                end_bit=int(r.end_bit),
                btype=int(r.btype),
                bfinal=bool(r.bfinal),
                out_start=int(r.out_start),
                out_size=int(r.out_size),
            )
        )
        if r.btype == C.BTYPE_STORED:
            lens.append(None)
        else:
            ll = lengths[i * 320 : i * 320 + 288].copy()
            dd = lengths[i * 320 + 288 : i * 320 + 320].copy()
            lens.append((ll, dd))
    if cell_bits:
        return infos, lens, cells
    return infos, lens


def scan_stream_records(data: bytes, cell_bits: int):
    """v8 scan: block index + exact cell entries + dense token records.

    Returns (blocks, lengths, cells, recs) where recs is a dict with
    ``m_pos``/``m_meta`` (match output offsets + len<<16|dist),
    ``r_pos``/``r_cell``/``r_j0len`` (literal runs in tape coordinates),
    ``max_cell_tokens`` and ``out_size``.  The (cell, slot) coordinates
    mirror the device chase tape layout (ops.inflate_v3.chase_cells).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    max_blocks = max(64, len(data) // 16 + 16)
    # Worst case one token per compressed bit; start smaller and grow.
    max_m = max(1024, len(data) * 2)
    max_r = max(1024, len(data) * 2)
    max_l = max(1024, len(data) * 8)
    while True:
        blocks = (_BlockRec * max_blocks)()
        lengths = np.zeros(max_blocks * 320, np.int32)
        max_cells = (len(data) * 8) // cell_bits + max_blocks + 16
        cell_states = np.zeros(max_cells, np.int64)
        cell_pend = np.zeros(max_cells, np.int32)
        m_pos = np.zeros(max_m, np.int32)
        m_meta = np.zeros(max_m, np.int32)
        r_pos = np.zeros(max_r, np.int32)
        r_cell = np.zeros(max_r, np.int32)
        r_j0len = np.zeros(max_r, np.int32)
        lit_bytes = np.zeros(max_l, np.uint8)
        n_cells = ctypes.c_int64(0)
        n_m = ctypes.c_int64(0)
        n_r = ctypes.c_int64(0)
        n_l = ctypes.c_int64(0)
        mct = ctypes.c_int32(0)
        out_size = ctypes.c_uint64(0)
        nb = lib.dbg_scan2(
            data, len(data),
            ctypes.cast(blocks, ctypes.c_void_p), max_blocks,
            lengths.ctypes.data_as(ctypes.c_void_p),
            cell_bits,
            cell_states.ctypes.data_as(ctypes.c_void_p),
            cell_pend.ctypes.data_as(ctypes.c_void_p),
            max_cells, ctypes.byref(n_cells),
            m_pos.ctypes.data_as(ctypes.c_void_p),
            m_meta.ctypes.data_as(ctypes.c_void_p),
            max_m, ctypes.byref(n_m),
            r_pos.ctypes.data_as(ctypes.c_void_p),
            r_cell.ctypes.data_as(ctypes.c_void_p),
            r_j0len.ctypes.data_as(ctypes.c_void_p),
            max_r, ctypes.byref(n_r),
            ctypes.byref(mct),
            ctypes.byref(out_size),
            lit_bytes.ctypes.data_as(ctypes.c_void_p),
            max_l, ctypes.byref(n_l),
        )
        if nb == -2 or nb == -4:
            max_blocks *= 4
            continue
        if nb == -5:
            max_m *= 4
            max_r *= 4
            max_l *= 4
            continue
        if nb < 0:
            raise InflateError(f"native scan2 failed (code {nb})")
        break
    infos, lens = [], []
    for i in range(nb):
        r = blocks[i]
        infos.append(
            BlockInfo(
                start_bit=int(r.start_bit),
                data_start_bit=int(r.data_start_bit),
                end_bit=int(r.end_bit),
                btype=int(r.btype),
                bfinal=bool(r.bfinal),
                out_start=int(r.out_start),
                out_size=int(r.out_size),
            )
        )
        if r.btype == C.BTYPE_STORED:
            lens.append(None)
        else:
            lens.append((lengths[i * 320 : i * 320 + 288].copy(),
                         lengths[i * 320 + 288 : i * 320 + 320].copy()))
    cells = (cell_states[: n_cells.value], cell_pend[: n_cells.value],
             int(mct.value))
    recs = {
        "m_pos": m_pos[: n_m.value].copy(),
        "m_meta": m_meta[: n_m.value].copy(),
        "r_pos": r_pos[: n_r.value].copy(),
        "r_cell": r_cell[: n_r.value].copy(),
        "r_j0len": r_j0len[: n_r.value].copy(),
        "lit_bytes": lit_bytes[: n_l.value].copy(),
        "max_cell_tokens": int(mct.value),
        "out_size": int(out_size.value),
    }
    return infos, lens, cells, recs


def pack_groups(m_pos: np.ndarray, m_meta: np.ndarray,
                seg_bytes: int, n_seg: int):
    """Pack matches into conflict-free groups of 8 for the v9 kernel (see
    dbg_pack_groups in native/dbg_native.cpp).

    Returns (g_pos, g_meta, seg_lo, seg_hi) or None when the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(m_pos)
    m_pos = np.ascontiguousarray(m_pos, np.int32)
    m_meta = np.ascontiguousarray(m_meta, np.int32)
    max_slots = 8 * (4 * max(n, 1) + 2 * n_seg + 64)
    while True:  # RLE-chain-heavy streams can need ~9 groups per match
        g_pos = np.zeros(max_slots, np.int32)
        g_meta = np.zeros(max_slots, np.int32)
        seg_lo = np.zeros(n_seg, np.int32)
        seg_hi = np.zeros(n_seg, np.int32)
        n_slots = lib.dbg_pack_groups(
            m_pos.ctypes.data_as(ctypes.c_void_p),
            m_meta.ctypes.data_as(ctypes.c_void_p),
            n, seg_bytes, n_seg,
            g_pos.ctypes.data_as(ctypes.c_void_p),
            g_meta.ctypes.data_as(ctypes.c_void_p),
            max_slots,
            seg_lo.ctypes.data_as(ctypes.c_void_p),
            seg_hi.ctypes.data_as(ctypes.c_void_p),
        )
        if n_slots >= 0:
            return g_pos[:n_slots], g_meta[:n_slots], seg_lo, seg_hi
        max_slots *= 4


def taint_matches(m_pos: np.ndarray, m_meta: np.ndarray, out_size: int,
                  shard_bytes: int, window: int = 32768,
                  n_shards: int | None = None):
    """Exact sequence-parallel taint analysis (dbg_taint, SURVEY §5.7).

    Returns (m_taint, tail_taint) — per-match "writes a byte that derives
    from its shard's incoming window" flags and per-shard "taint reaches
    the outgoing 32 KiB tail" flags — or None without the native library.

    n_shards: size tail_taint for the caller's shard count even when
    shard_bytes rounding leaves trailing shards with no output (the C
    loop clamps each shard's range to out_size, so extras stay 0).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(m_pos)
    if n_shards is None:
        n_shards = max(1, -(-out_size // shard_bytes))
    m_pos = np.ascontiguousarray(m_pos, np.int32)
    m_meta = np.ascontiguousarray(m_meta, np.int32)
    taint_buf = np.zeros(max(out_size, 1), np.uint8)
    m_taint = np.zeros(max(n, 1), np.uint8)
    tail_taint = np.zeros(n_shards, np.uint8)
    lib.dbg_taint(
        m_pos.ctypes.data_as(ctypes.c_void_p),
        m_meta.ctypes.data_as(ctypes.c_void_p),
        n, out_size, shard_bytes, window,
        taint_buf.ctypes.data_as(ctypes.c_void_p),
        m_taint.ctypes.data_as(ctypes.c_void_p),
        tail_taint.ctypes.data_as(ctypes.c_void_p),
        n_shards,
    )
    return m_taint[:n], tail_taint


def inflate_native(data: bytes):
    """Full serial native inflate → (bytes, blocks)."""
    nb, blocks, _, out_buf, out_size, _ = _scan_raw(data, produce_output=True)
    infos = []
    for i in range(nb):
        r = blocks[i]
        infos.append(
            BlockInfo(
                int(r.start_bit), int(r.data_start_bit), int(r.end_bit),
                int(r.btype), bool(r.bfinal), int(r.out_start), int(r.out_size),
            )
        )
    return out_buf[:out_size].tobytes(), infos


def crc32(data, crc: int = 0) -> int:
    lib = get_lib()
    data = bytes(memoryview(data))
    return int(lib.dbg_crc32(data, len(data), crc))


def adler32(data, adler: int = 1) -> int:
    lib = get_lib()
    data = bytes(memoryview(data))
    return int(lib.dbg_adler32(data, len(data), adler))
