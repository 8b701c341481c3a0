"""Device-parallel inflate v3 — gather-minimal XLA pipeline.

Measured reality on TPU v5e (profiler-trace-verified): XLA gathers and
scatters execute serially at ~7.5 ns/element, while fused element-wise ops
stream at VPU rates.  v3 therefore spends its work in element-wise form:

* **Host rebase.**  The native scanner indexes blocks; the host bit-shifts
  every compressed block's payload onto a 64-bit-aligned *virtual stream*
  (NumPy word shifts).  Alignment makes every 64-bit cell's 128-state
  window a pure reshape of the global NXT table — no per-chunk gathers —
  and block entry states coincide with pinned cell starts.
* **Per-cell parameters.**  Each cell belongs to one block, so per-length
  decode parameters (count/first/base, RFC 1951 §3.2.2) broadcast from
  per-cell vectors (small one-hot f32 matmuls over NB), not per-position
  gathers.  The per-position symbol lookups (litlen + dist) are exact
  int8 one-hot MXU matmuls against 7-bit table planes — direct for
  NB <= 64, tile-paged (lax.scan + dynamic 32-block table window) for
  merged batches, serial-gather fallback for dense-block streams.  The
  hot path has NO per-position gathers or scatters at all.
* **Cell chase with exact fixpoint.**  Cells are lanes.  A decode step is
  ``next = Σ_k onehot(s_local)·T_cell[k]`` — element-wise multiply +
  reduce over the 128-entry cell window, no gather.  Entry states feed
  forward (exit of cell c−1 → entry of cell c; block starts pinned) until
  a fixpoint — self-synchronizing Huffman makes that 2-3 sweeps, and the
  convergence check makes it exact.  Emissions land in per-cell tape rows
  (dense column writes), already in stream order.

Phase B (LZ77) consumes the tape through the v6 full-tape Pallas kernel
(ops.lz77_pallas._tape_kernel_v6): literal runs commit as rolled masked
vector stores straight from the tape rows, matches resolve in speculative
groups of 8 (all loads issue before all stores, so clean groups pipeline
instead of stalling on read-after-write), and output segments scan with a
32 KiB window carry.  An XLA fallback resolver covers vmap/shard_map
paths.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from debigulator_tpu import constants as C
from debigulator_tpu.ops.inflate_ref import BlockInfo

#: Cell size in bits.  With exact scanner entries there is no self-sync
#: constraint, and chase work scales ∝ CELL_BITS (steps = densest cell's
#: symbol count while per-step work is N-proportional) — so small cells
#: win outright.
CELL_BITS = 64
CELL_STATES = 2 * CELL_BITS
#: Tape slots per cell.  CELL_BITS is always exact (every token consumes
#: >=1 bit); smaller values are verified at runtime via the per-cell
#: emission count (overflow -> the caller retries with the exact bound).
#: 16 keeps the tape a 128-lane-friendly 8-cells-per-row layout.
DEFAULT_SLOTS = 16

# meta[state] packing: bits 0-15 payload (literal byte / distance),
# bits 16-24 pending length (at length-symbol states), bits 25-26 kind.
META_KIND_SHIFT = 25
K_NONE, K_LIT, K_DIST = 0, 1, 2

_LIT = 0
_DIST = 1

# Token packing (tape entries): literal = byte value in [0, 256);
# match = (1 << 30) | length << 16 | dist; empty slot = -1.
TOK_MATCH_BIT = 1 << 30

#: Terminal state after the final EOB: outside every cell window.
TERMINAL = -2

#: Symbol-lookup paging: NB <= DIRECT_NB_MAX uses one int8 matmul against
#: all blocks' tables; larger NB scans TILE_CELLS-cell tiles, each against
#: a dynamic PAGE_NB-block window (valid when cell_block is monotone and
#: no tile spans more than PAGE_NB blocks — checked on host).
DIRECT_NB_MAX = 64
PAGE_NB = 32
TILE_CELLS = 512


def _round_pow2(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


@dataclasses.dataclass
class PlanV3:
    vbytes: np.ndarray  # uint8 virtual stream (aligned blocks)
    n_bits: int  # virtual bit count (static, pow2)
    num_cells: int
    # per-cell
    cell_block: np.ndarray  # (Cells,) int32
    cell_entry: np.ndarray  # (Cells,) int32 pinned entry state or -1
    # per-block stacked tables
    ll_count: np.ndarray  # (NB,16)
    ll_first: np.ndarray
    ll_base: np.ndarray
    ll_aug: np.ndarray  # (NB,288) packed sym|extra|base
    d_count: np.ndarray
    d_first: np.ndarray
    d_base: np.ndarray
    d_aug: np.ndarray  # (NB,32)
    block_next_entry: np.ndarray  # (NB,)
    block_out_base: np.ndarray  # (NB,) stored bytes before block
    first_state: int
    out_size: int
    stored_pos: np.ndarray
    stored_val: np.ndarray
    slots: int
    #: True when cell_entry/cell_pend hold exact scanner-recorded entries
    #: for every cell (no fixpoint needed); False = speculative mode.
    exact_entries: bool = False
    cell_pend: np.ndarray | None = None
    #: True when `slots` is the scanner's exact per-cell token bound —
    #: tape overflow is impossible and no device probe is needed.
    slots_exact: bool = False
    #: Real virtual-layout extent in bits (the layout cursor BEFORE pow2
    #: rounding; >= one cell).  This can EXCEED 8*len(stream): each
    #: compressed block pads to cell alignment, so flush-heavy streams
    #: (e.g. Z_PARTIAL_FLUSH / Z_FIXED with many tiny blocks) use up to
    #: CELL_BITS-1 extra virtual bits per block.  Merged-plan trimming
    #: must use this, never the raw byte length.
    used_bits: int = 0


def _make_litlen_aug_table() -> np.ndarray:
    """Per-symbol packed litlen info: bits 0-8 value (literal byte or length
    base), bits 9-12 extra-bit count, bit 13 is_len, bit 14 is_eob."""
    t = np.zeros(288, np.int32)
    t[:256] = np.arange(256)
    t[256] = 1 << 14
    t[257:286] = C.LENGTH_BASE | (C.LENGTH_EXTRA_BITS << 9) | (1 << 13)
    return t  # 286/287 reserved → 0 (corrupt-stream garbage)


def _make_dist_aug_table() -> np.ndarray:
    """Per-symbol packed dist info: bits 0-14 base, bits 15-18 extra bits."""
    t = np.zeros(32, np.int32)
    t[:30] = C.DIST_BASE | (C.DIST_EXTRA_BITS << 15)
    return t


_LL_AUG_TABLE = _make_litlen_aug_table()
_D_AUG_TABLE = _make_dist_aug_table()


def _augment_litlen(syms: np.ndarray, nsyms: int) -> np.ndarray:
    return _LL_AUG_TABLE[np.asarray(syms, np.int64)]


def _augment_dist(syms: np.ndarray) -> np.ndarray:
    return _D_AUG_TABLE[np.asarray(syms, np.int64)]


def _batch_decode_tables(lengths_list, nsym_cap: int):
    """Vectorized-across-blocks canonical table construction.

    Semantics of huffman.build_decode_table for a LIST of length arrays
    (count/first_code/index_base (nb,16) + the (nb, nsym_cap) symbol
    permutation and per-block code count), built with O(1) NumPy calls
    total instead of ~15 per block — the per-block form cost ~47 us/call
    and dominated corpus host planning (1871 blocks = ~170 ms).
    """
    from debigulator_tpu.ops.huffman import HuffmanError

    nb = len(lengths_list)
    sizes = np.fromiter((len(x) for x in lengths_list), np.int64, nb)
    ids = np.repeat(np.arange(nb), sizes)
    lens = np.concatenate(lengths_list).astype(np.int64) if nb else \
        np.zeros(0, np.int64)
    if lens.size and (lens.min() < 0 or lens.max() > C.MAX_BITS):
        raise HuffmanError("code length out of range")
    count = np.bincount(ids * 16 + lens, minlength=nb * 16).reshape(nb, 16)
    count[:, 0] = 0
    first = np.zeros((nb, 16), np.int64)
    code = np.zeros(nb, np.int64)
    left = np.ones(nb, np.int64)
    for bits in range(1, C.MAX_BITS + 1):
        code = (code + count[:, bits - 1]) << 1
        first[:, bits] = code
        left = (left << 1) - count[:, bits]
        if (left < 0).any():
            raise HuffmanError(
                f"over-subscribed code at length {bits} "
                f"(block {int(np.nonzero(left < 0)[0][0])})")
    base = np.zeros((nb, 16), np.int64)
    base[:, 1:] = np.cumsum(count, axis=1)[:, :-1]

    # Symbol permutation per block: stable sort of (length, symbol) with
    # unused symbols keyed past every real length.
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = np.arange(len(lens)) - np.repeat(starts, sizes)
    lmat = np.full((nb, nsym_cap), C.MAX_BITS + 1, np.int64)
    lmat[ids, pos] = np.where(lens > 0, lens, C.MAX_BITS + 1)
    key = lmat * (nsym_cap + 1) + np.arange(nsym_cap)[None, :]
    syms = np.argsort(key, axis=1, kind="stable")
    ncodes = count.sum(axis=1)
    return (count.astype(np.int32), first.astype(np.int32),
            base.astype(np.int32), syms.astype(np.int64), ncodes)


def build_plan_v3(data: bytes, blocks: list[BlockInfo], block_lengths,
                  slots: int = DEFAULT_SLOTS, cells=None) -> PlanV3:
    buf = np.frombuffer(memoryview(data), np.uint8)
    src64 = np.zeros(len(buf) + 16, np.uint8)
    src64[: len(buf)] = buf

    nb = len(blocks)
    ll_count = np.zeros((nb, 16), np.int32)
    ll_first = np.zeros((nb, 16), np.int32)
    ll_base = np.zeros((nb, 16), np.int32)
    ll_aug = np.zeros((nb, 288), np.int32)
    d_count = np.zeros((nb, 16), np.int32)
    d_first = np.zeros((nb, 16), np.int32)
    d_base = np.zeros((nb, 16), np.int32)
    d_aug = np.zeros((nb, 32), np.int32)
    block_next_entry = np.zeros(nb, np.int32)
    block_out_base = np.zeros(nb, np.int32)

    stored_pos_parts, stored_val_parts = [], []
    stored_before = 0

    # --- virtual layout ---
    vbase = np.zeros(nb, np.int64)
    vb_parts = []
    cursor = 0
    comp_blocks = []
    for b, info in enumerate(blocks):
        block_out_base[b] = stored_before
        if info.btype == C.BTYPE_STORED:
            sb = info.data_start_bit // 8
            stored_pos_parts.append(
                np.arange(info.out_start, info.out_start + info.out_size,
                          dtype=np.int32)
            )
            stored_val_parts.append(buf[sb : sb + info.out_size])
            stored_before += info.out_size
            vbase[b] = -1
            continue
        comp_blocks.append(b)
        nbits = info.end_bit - info.data_start_bit
        ncells = max(1, -(-nbits // CELL_BITS))
        vbase[b] = cursor
        # Bit-shift the block payload to virtual alignment.
        sbyte = info.data_start_bit // 8
        r = info.data_start_bit % 8
        nbytes = ncells * CELL_BITS // 8
        seg = src64[sbyte : sbyte + nbytes + 1].astype(np.uint16)
        shifted = ((seg[:-1] >> r) | (seg[1:] << (8 - r))).astype(np.uint8) if r else src64[sbyte : sbyte + nbytes]
        part = np.zeros(nbytes, np.uint8)
        part[: len(shifted)] = shifted[:nbytes]
        # Zero bits past the block's real end to keep padding deterministic.
        vb_parts.append(part)
        cursor += ncells * CELL_BITS

    # Decode tables for all compressed blocks, batched (one NumPy pass).
    if comp_blocks:
        cb_idx = np.asarray(comp_blocks)
        llc, llf, llb, llsym, llnc = _batch_decode_tables(
            [np.asarray(block_lengths[b][0], np.int64) for b in comp_blocks],
            288)
        dc, df, db_, dsym, dnc = _batch_decode_tables(
            [np.asarray(block_lengths[b][1], np.int64) for b in comp_blocks],
            32)
        ll_count[cb_idx] = llc
        ll_first[cb_idx] = llf
        ll_base[cb_idx] = llb
        lane = np.arange(288)[None, :]
        ll_aug[cb_idx] = np.where(lane < llnc[:, None],
                                  _LL_AUG_TABLE[llsym], 0)
        d_count[cb_idx] = dc
        d_first[cb_idx] = df
        d_base[cb_idx] = db_
        d_aug[cb_idx] = np.where(np.arange(32)[None, :] < dnc[:, None],
                                 _D_AUG_TABLE[dsym], 0)

    n_bits_used = max(cursor, CELL_BITS)
    n_bits = _round_pow2(n_bits_used, 1 << 10)
    vbytes = np.zeros(n_bits // 8 + 16, np.uint8)
    if vb_parts:
        allp = np.concatenate(vb_parts)
        vbytes[: len(allp)] = allp

    # Chain EOBs: block b → next compressed block's entry (or TERMINAL=-2,
    # which lies outside every cell window so chases go inactive there).
    next_entry = TERMINAL
    for b in reversed(range(nb)):
        block_next_entry[b] = next_entry
        if vbase[b] >= 0:
            next_entry = int(vbase[b]) * 2 + _LIT
    first_state = next_entry

    num_cells = n_bits // CELL_BITS
    cell_block = np.zeros(num_cells, np.int32)
    cell_entry = np.full(num_cells, -1, np.int32)
    cell_pend = np.zeros(num_cells, np.int32)
    exact = False
    cells_used = 0
    for b in comp_blocks:
        info = blocks[b]
        nbits_b = info.end_bit - info.data_start_bit
        ncells = max(1, -(-nbits_b // CELL_BITS))
        c0 = int(vbase[b]) // CELL_BITS
        cell_block[c0 : c0 + ncells] = b
        cells_used = c0 + ncells
        cell_entry[c0] = int(vbase[b]) * 2 + _LIT
    if comp_blocks:
        # Trailing padding cells inherit the last block id so cell_block
        # stays monotone (required by the paged symbol lookup).
        cell_block[cells_used:] = comp_blocks[-1]
    slots_exact = False
    if cells is not None:
        # Exact scanner-recorded entries: one per used cell; -1 = no code
        # starts in the cell (its lane stays inactive).
        if len(cells) == 3:
            states, pends, mct = cells
            # Scanner-exact tape bound: no overflow probe needed (mct == 0
            # means a token-free stream — any slot count is a valid bound).
            slots = next(s for s in (8, 16, 32, 64, 128) if s >= max(mct, 1))
            slots_exact = True
        else:
            states, pends = cells
        exact = True
        used = len(states)
        cell_entry[:used] = states.astype(np.int64)
        cell_entry[used:] = -1
        cell_pend[:used] = pends

    return PlanV3(
        vbytes=vbytes,
        n_bits=n_bits,
        num_cells=num_cells,
        cell_block=cell_block,
        cell_entry=cell_entry,
        ll_count=ll_count,
        ll_first=ll_first,
        ll_base=ll_base,
        ll_aug=ll_aug,
        d_count=d_count,
        d_first=d_first,
        d_base=d_base,
        d_aug=d_aug,
        block_next_entry=block_next_entry,
        block_out_base=block_out_base,
        first_state=first_state,
        out_size=(blocks[-1].out_start + blocks[-1].out_size) if blocks else 0,
        stored_pos=(np.concatenate(stored_pos_parts) if stored_pos_parts
                    else np.zeros(0, np.int32)),
        stored_val=(np.concatenate(stored_val_parts) if stored_val_parts
                    else np.zeros(0, np.uint8)),
        slots=slots,
        exact_entries=exact,
        cell_pend=cell_pend,
        slots_exact=slots_exact,
        used_bits=n_bits_used,
    )


def tile_page_map(cell_block: np.ndarray, nb: int) -> np.ndarray | None:
    """Per-tile table-page base for the paged symbol lookup, or None when
    paging can't cover this plan (non-monotone cell_block or a tile
    spanning more than PAGE_NB blocks)."""
    num_cells = len(cell_block)
    tc = min(TILE_CELLS, num_cells)
    if num_cells % tc:
        return None
    if np.any(np.diff(cell_block.astype(np.int64)) < 0):
        return None
    cb2 = cell_block.reshape(-1, tc)
    nbp = max(nb, PAGE_NB)
    pb = np.minimum(cb2[:, 0], nbp - PAGE_NB).astype(np.int32)
    if np.any(cb2[:, -1] - pb >= PAGE_NB):
        return None
    return pb


def plan_arrays_v3(plan: PlanV3) -> dict:
    arrays = {}
    nb = plan.ll_count.shape[0]
    if nb > DIRECT_NB_MAX:
        pb = tile_page_map(plan.cell_block, nb)
        if pb is not None:
            arrays["tile_page"] = jnp.asarray(pb)
    arrays.update({
        "vbytes": jnp.asarray(plan.vbytes),
        "cell_block": jnp.asarray(plan.cell_block),
        "cell_entry": jnp.asarray(plan.cell_entry),
        "cell_pend": jnp.asarray(
            plan.cell_pend
            if plan.cell_pend is not None
            else np.zeros(plan.num_cells, np.int32)
        ),
        "ll_count": jnp.asarray(plan.ll_count),
        "ll_first": jnp.asarray(plan.ll_first),
        "ll_base": jnp.asarray(plan.ll_base),
        "ll_aug_flat": jnp.asarray(plan.ll_aug.reshape(-1)),
        "d_count": jnp.asarray(plan.d_count),
        "d_first": jnp.asarray(plan.d_first),
        "d_base": jnp.asarray(plan.d_base),
        "d_aug_flat": jnp.asarray(plan.d_aug.reshape(-1)),
        "block_next_entry": jnp.asarray(plan.block_next_entry),
        # Host-expanded per-cell EOB successor ((Cells,) is cheap to ship;
        # avoids both an N-gather and a (Cells,NB) one-hot at large NB).
        "bne_cell": jnp.asarray(
            plan.block_next_entry[plan.cell_block].astype(np.int32)
        ),
        # Host-expanded per-cell stored-bytes offset (block_out_base[cb]).
        "bob_cell": jnp.asarray(
            plan.block_out_base[plan.cell_block].astype(np.int32)
        ),
        "block_out_base": jnp.asarray(plan.block_out_base),
        "stored_pos": jnp.asarray(plan.stored_pos),
        "stored_val": jnp.asarray(plan.stored_val),
        "first_state": jnp.int32(plan.first_state),
    })
    return arrays


def _rev15(x):
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x5555)) << 1) | ((x & jnp.uint32(0xAAAA)) >> 1)
    x = ((x & jnp.uint32(0x3333)) << 2) | ((x & jnp.uint32(0xCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x & jnp.uint32(0xF0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF)) << 8) | ((x & jnp.uint32(0xFF00)) >> 8)
    return (x >> jnp.uint32(1)).astype(jnp.int32)


def build_graph_v3(arrays, n_bits: int):
    """NXT / EMIT over 2*n_bits states — gather-free on the hot path.

    Measured on v5e: XLA gathers/scatters run serially (~7.5 ns/element),
    so every per-position lookup here is either a broadcast from per-cell
    vectors (free inside fusion) or an MXU one-hot matmul:

    * per-(cell,length) decode params (count/first/base) come from six
      tiny f32 HIGHEST matmuls (Cells,NB)x(NB,16) — exact (< 2^24);
    * the canonical-offset -> packed-symbol lookup is an int8 one-hot
      matmul against 7-bit planes of the table (5 planes cover 35 bits),
      exact by construction, with a gather fallback for very large NB.
    """
    num_cells = n_bits // CELL_BITS
    b8 = arrays["vbytes"].astype(jnp.uint32)
    w = b8[:-3] | (b8[1:-2] << 8) | (b8[2:-1] << 16) | (b8[3:] << 24)
    # 32-valid-bit windows at every position: two-word combine.
    n_bytes = n_bits // 8
    w_lo = jnp.repeat(w[:n_bytes], 8)
    w_hi = jnp.repeat(w[4 : n_bytes + 4], 8)
    sh = jnp.tile(jnp.arange(8, dtype=jnp.uint32), n_bytes)
    win = (w_lo >> sh) | jnp.where(sh > 0, w_hi << (jnp.uint32(32) - sh), 0)

    rev = _rev15(win & jnp.uint32(0x7FFF))  # (N,)

    cb = arrays["cell_block"]  # (Cells,)
    nb = arrays["ll_count"].shape[0]
    # Lookup mode (static at trace time): small NB uses the direct int8
    # matmul; large NB with a valid page map scans cell tiles, each matmul
    # against a dynamic PAGE_NB-block table window; otherwise gather.
    if nb <= DIRECT_NB_MAX:
        mode = "direct"
    elif "tile_page" in arrays:
        mode = "paged"
    else:
        mode = "gather"
    N_PLANES = 5  # 7-bit planes: 35 bits >= 27 used by packed aug values

    def planes_of(aug_flat, aug_stride, rows):
        tabs = aug_flat.reshape(rows, aug_stride)
        return jnp.stack(
            [(tabs >> (7 * k)) & 0x7F for k in range(N_PLANES)], axis=2
        )  # (rows, stride, P) values in [0,127] — int8-safe

    def combine_planes(picked):  # (M, P) int32 -> (M,) packed value
        aug = picked[:, 0]
        for k in range(1, N_PLANES):
            aug = aug | (picked[:, k] << (7 * k))
        return aug

    def length_loop(rev2, count_c, first_c, base_c, rows):
        length = jnp.zeros((rows, CELL_BITS), jnp.int32)
        offset = jnp.zeros((rows, CELL_BITS), jnp.int32)
        for l in range(1, C.MAX_BITS + 1):
            cnt = count_c[:, l][:, None]  # broadcast — no gather
            fst = first_c[:, l][:, None]
            bse = base_c[:, l][:, None]
            code_l = rev2 >> (C.MAX_BITS - l)
            off_l = code_l - fst
            ok = (off_l >= 0) & (off_l < cnt) & (length == 0)
            length = jnp.where(ok, l, length)
            offset = jnp.where(ok, bse + off_l, offset)
        unmatched = length == 0
        length = jnp.where(unmatched, C.MAX_BITS, length)
        return length, offset, unmatched

    if mode != "paged":
        # Per-cell decode params via one small f32 matmul each (exact:
        # all values < 2^24; HIGHEST avoids bf16 multi-pass truncation).
        cellsel = (
            cb[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # (Cells, NB)

        def percell(tab):  # (NB,16) -> (Cells,16) int32
            return jnp.dot(
                cellsel, tab.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)

    def decode(count_t, first_t, base_t, aug_flat, aug_stride):
        rev2 = rev.reshape(num_cells, CELL_BITS)
        length, offset, unmatched = length_loop(
            rev2, percell(count_t), percell(first_t), percell(base_t),
            num_cells,
        )
        if mode == "direct":
            # Exact int8 MXU lookup: one-hot(offset) x 7-bit table planes.
            t8 = planes_of(aug_flat, aug_stride, nb).transpose(1, 0, 2)
            t8 = t8.reshape(aug_stride, nb * N_PLANES).astype(jnp.int8)
            oh = (
                offset.reshape(-1)[:, None]
                == jnp.arange(aug_stride, dtype=jnp.int32)[None, :]
            ).astype(jnp.int8)
            out = jax.lax.dot_general(
                oh, t8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(-1, nb, N_PLANES)
            blk_full = jnp.repeat(cb, CELL_BITS)
            sel = (
                blk_full[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
            )[:, :, None]
            aug = combine_planes(jnp.sum(jnp.where(sel, out, 0), axis=1))
        else:
            idx = cb[:, None] * aug_stride + offset
            aug = aug_flat[idx.reshape(-1)]
        aug = jnp.where(unmatched.reshape(-1), 0, aug)
        return aug, length.reshape(-1)

    def decode_paged(count_t, first_t, base_t, aug_flat, aug_stride):
        """lax.scan over cell tiles; every per-tile lookup hits only the
        dynamic [page, page+PAGE_NB) window of the block tables."""
        tc = min(TILE_CELLS, num_cells)
        n_tiles = num_cells // tc
        nbp = max(nb, PAGE_NB)
        padn = nbp - nb
        count_p = jnp.pad(count_t, ((0, padn), (0, 0))).astype(jnp.float32)
        first_p = jnp.pad(first_t, ((0, padn), (0, 0))).astype(jnp.float32)
        base_p = jnp.pad(base_t, ((0, padn), (0, 0))).astype(jnp.float32)
        planes_p = jnp.pad(
            planes_of(aug_flat, aug_stride, nb), ((0, padn), (0, 0), (0, 0))
        ).astype(jnp.int8)  # (nbp, stride, P)
        iota_stride = jnp.arange(aug_stride, dtype=jnp.int32)
        iota_page = jnp.arange(PAGE_NB, dtype=jnp.int32)
        rev_t = rev.reshape(n_tiles, tc, CELL_BITS)
        cb_t = cb.reshape(n_tiles, tc)
        pb_t = arrays["tile_page"]

        def tile_fn(carry, xs):
            rev2, cbt, pb = xs
            lblk = cbt - pb  # (tc,) in [0, PAGE_NB)
            csel = (lblk[:, None] == iota_page[None, :]).astype(jnp.float32)

            def percell_p(tab_p):
                page = jax.lax.dynamic_slice(tab_p, (pb, 0), (PAGE_NB, 16))
                return jnp.dot(
                    csel, page, precision=jax.lax.Precision.HIGHEST
                ).astype(jnp.int32)

            length, offset, unmatched = length_loop(
                rev2, percell_p(count_p), percell_p(first_p),
                percell_p(base_p), tc,
            )
            page_pl = jax.lax.dynamic_slice(
                planes_p, (pb, 0, 0), (PAGE_NB, aug_stride, N_PLANES)
            )
            t8 = page_pl.transpose(1, 0, 2).reshape(
                aug_stride, PAGE_NB * N_PLANES
            )
            oh = (
                offset.reshape(-1)[:, None] == iota_stride[None, :]
            ).astype(jnp.int8)
            out = jax.lax.dot_general(
                oh, t8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(-1, PAGE_NB, N_PLANES)
            sel = (
                jnp.repeat(lblk, CELL_BITS)[:, None] == iota_page[None, :]
            )[:, :, None]
            aug = combine_planes(jnp.sum(jnp.where(sel, out, 0), axis=1))
            aug = jnp.where(unmatched.reshape(-1), 0, aug)
            return carry, (aug.reshape(tc, CELL_BITS), length)

        _, (aug_s, len_s) = jax.lax.scan(
            tile_fn, jnp.int32(0), (rev_t, cb_t, pb_t)
        )
        return aug_s.reshape(-1), len_s.reshape(-1)

    if mode == "paged":
        decode = decode_paged

    ll_aug, ll_len = decode(
        arrays["ll_count"], arrays["ll_first"], arrays["ll_base"],
        arrays["ll_aug_flat"], 288,
    )
    d_aug, d_len = decode(
        arrays["d_count"], arrays["d_first"], arrays["d_base"],
        arrays["d_aug_flat"], 32,
    )

    pos = jax.lax.broadcasted_iota(jnp.int32, (n_bits, 1), 0).reshape(-1)
    # Per-cell EOB successor — host-expanded vector, broadcast per position.
    bne_pos = jnp.broadcast_to(
        arrays["bne_cell"][:, None], (num_cells, CELL_BITS)
    ).reshape(-1)

    # litlen mode
    lval = ll_aug & 0x1FF
    leb = (ll_aug >> 9) & 0xF
    is_len = (ll_aug >> 13) & 1
    is_eob = (ll_aug >> 14) & 1
    lextra = (win >> ll_len.astype(jnp.uint32)).astype(jnp.int32) & ((1 << leb) - 1)
    length_val = lval + lextra
    adv_lit = ll_len + jnp.where(is_len == 1, leb, 0)
    nxt_lit = (pos + adv_lit) * 2 + jnp.where(is_len == 1, _DIST, _LIT)
    nxt_lit = jnp.where(is_eob == 1, bne_pos, nxt_lit)
    # lit-state meta: kind LIT with byte payload, or NONE carrying the
    # pending match length for length symbols.
    meta_lit = jnp.where(
        (is_len == 1) | (is_eob == 1),
        (K_NONE << META_KIND_SHIFT) | jnp.where(is_len == 1, length_val << 16, 0),
        (K_LIT << META_KIND_SHIFT) | lval,
    )

    # dist mode
    dbase = d_aug & 0x7FFF
    deb = (d_aug >> 15) & 0xF
    dextra = (win >> d_len.astype(jnp.uint32)).astype(jnp.int32) & ((1 << deb) - 1)
    dist_val = dbase + dextra
    nxt_dist = (pos + d_len + deb) * 2 + _LIT
    # dist-state meta: kind DIST with the distance payload (the match
    # length joins from the carried pending at chase time).
    meta_dist = (K_DIST << META_KIND_SHIFT) | dist_val

    nxt = jnp.stack([nxt_lit, nxt_dist], axis=1).reshape(-1)
    meta = jnp.stack([meta_lit, meta_dist], axis=1).reshape(-1)
    # No clipping: states past the stream (or the TERMINAL marker, -2) fall
    # outside every cell's window, so their lanes simply go inactive.
    return nxt, meta


def chase_cells(nxt, meta, cell_entry, n_bits: int, slots: int,
                max_steps: int | None = None, return_counts: bool = False,
                exact: bool = False, cell_pend=None):
    """Cell-parallel chase with exact entry fixpoint.

    Returns (tape (Cells, slots) int32, overflow flag ()).
    """
    num_cells = n_bits // CELL_BITS
    t_nxt = nxt.reshape(num_cells, CELL_STATES)
    t_meta = meta.reshape(num_cells, CELL_STATES)
    base = jax.lax.broadcasted_iota(jnp.int32, (num_cells, 1), 0).reshape(-1) * CELL_STATES
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (num_cells, CELL_STATES), 1)
    pinned = cell_entry >= 0
    spec_entry = jnp.where(pinned, cell_entry, base)  # state-space entries

    if max_steps is None:
        max_steps = CELL_BITS + 1

    def lane_lookup(table, s_local):
        oh = lane_iota == s_local[:, None]
        return jnp.sum(jnp.where(oh, table, 0), axis=1)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, slots + 1), 1)

    def chase(entry_state, entry_pend, tape):
        def cond(carry):
            s, p, k, tp, cnt, any_active = carry
            return any_active & (k < max_steps)

        def body(carry):
            s, p, k, tp, cnt, _ = carry
            s_local = s - base
            active = (s_local >= 0) & (s_local < CELL_STATES)
            sl = jnp.clip(s_local, 0, CELL_STATES - 1)
            nx = lane_lookup(t_nxt, sl)
            mt = lane_lookup(t_meta, sl)
            kind = mt >> META_KIND_SHIFT
            payload = mt & 0xFFFF
            pd = (mt >> 16) & 0x1FF
            is_dist = kind == K_DIST
            # Emit: literal byte, or match token with the carried pending.
            em = jnp.where(
                is_dist, TOK_MATCH_BIT | (p << 16) | payload,
                jnp.where(kind == K_LIT, payload, -1),
            )
            new_p = jnp.where(pd > 0, pd, p)
            new_p = jnp.where(is_dist, 0, new_p)
            do_emit = active & (em >= 0)
            if tp is not None:
                # One-hot masked write (elementwise, VPU) — a per-step XLA
                # scatter here costs ~7.5 ns/lane serially (measured).
                upd = (
                    slot_iota == cnt[:, None]
                ) & (do_emit & (cnt < slots))[:, None]
                tp = jnp.where(upd, em[:, None], tp)
            cnt = cnt + do_emit.astype(jnp.int32)
            s2 = jnp.where(active, nx, s)
            p2 = jnp.where(active, new_p, p)
            s_local2 = s2 - base
            still = (s_local2 >= 0) & (s_local2 < CELL_STATES)
            return s2, p2, k + 1, tp, cnt, jnp.any(still)

        cnt0 = jnp.zeros(num_cells, jnp.int32)
        s, p, k, tp, cnt, _ = jax.lax.while_loop(
            cond, body,
            (entry_state, entry_pend, jnp.int32(0), tape, cnt0, jnp.bool_(True)),
        )
        return s, p, cnt, tp

    if exact:
        # Scanner-recorded exact entries: no fixpoint at all.  cell_entry
        # == -1 marks cells where no code starts (s_local < 0 → inactive).
        e_s = cell_entry
        e_p = cell_pend if cell_pend is not None else jnp.zeros(num_cells, jnp.int32)
        sweeps = jnp.int32(0)
    else:
        # Speculative fixpoint on (entry_state, entry_pend).
        e_s = spec_entry
        e_p = jnp.zeros(num_cells, jnp.int32)

        def fix_cond(carry):
            _, _, changed, it = carry
            return changed & (it < num_cells + 2)

        def fix_body(carry):
            es, ep, _, it = carry
            xs, xp, _, _ = chase(es, ep, None)
            prev_s = jnp.concatenate([es[:1], xs[:-1]])
            prev_p = jnp.concatenate([ep[:1], xp[:-1]])
            ns = jnp.where(pinned, cell_entry, prev_s)
            np_ = jnp.where(pinned, 0, prev_p)
            changed = jnp.any((ns != es) | (np_ != ep))
            return ns, np_, changed, it + 1

        e_s, e_p, _, sweeps = jax.lax.while_loop(
            fix_cond, fix_body, (e_s, e_p, jnp.bool_(True), jnp.int32(0))
        )

    tape0 = jnp.full((num_cells, slots + 1), -1, jnp.int32)
    _, _, counts, tape = chase(e_s, e_p, tape0)
    overflow = jnp.any(counts > slots)
    if return_counts:
        return tape[:, :slots], overflow, counts, sweeps
    return tape[:, :slots], overflow, sweeps


def resolve_tape_xla(tape, cell_block, block_out_base, out_size: int,
                     stored_pos, stored_val):
    """XLA fallback LZ77 resolver (fill-forward scan + parent doubling).

    The production TPU path is the Pallas token kernel (ops.lz77_pallas);
    this resolver keeps the pipeline correct everywhere else.
    """
    cells, slots = tape.shape
    flat = tape.reshape(-1)
    valid = flat >= 0
    is_match = flat >= TOK_MATCH_BIT
    mlen = (flat >> 16) & 0x3FFF
    mdist = flat & 0xFFFF
    out_len = jnp.where(is_match, mlen, jnp.where(valid, 1, 0)).astype(jnp.int32)

    base = jnp.repeat(block_out_base[cell_block], slots)
    cum = jnp.cumsum(out_len)
    out_pos = base + cum - out_len

    out_val = jnp.zeros(out_size + 1, jnp.int32)
    lit_mask = valid & ~is_match
    lit_tgt = jnp.where(lit_mask, out_pos, out_size)
    out_val = out_val.at[lit_tgt].set(jnp.where(lit_mask, flat, 0), mode="drop")
    # Marker array: dist at match starts, 0 at literal starts/stored bytes.
    marker_val = jnp.where(is_match, mdist, 0)
    marker_set = valid
    mark_tgt = jnp.where(marker_set, out_pos, out_size)
    m_dist = jnp.zeros(out_size + 1, jnp.int32)
    m_dist = m_dist.at[mark_tgt].set(marker_val, mode="drop")
    m_mark = jnp.zeros(out_size + 1, jnp.bool_)
    m_mark = m_mark.at[mark_tgt].set(marker_set, mode="drop")
    if stored_val.shape[0]:
        out_val = out_val.at[stored_pos].set(stored_val.astype(jnp.int32), mode="drop")
        m_dist = m_dist.at[stored_pos].set(0, mode="drop")
        m_mark = m_mark.at[stored_pos].set(True, mode="drop")

    # Fill-forward: each byte inherits the last marker at or before it.
    def combine(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, bv, av), am | bm

    dist_ff, _ = jax.lax.associative_scan(combine, (m_dist, m_mark))
    i = jnp.arange(out_size + 1, dtype=jnp.int32)
    parent = jnp.where(dist_ff > 0, i - dist_ff, i)
    parent = jnp.clip(parent, 0, out_size)

    def dbl_cond(carry):
        _, changed = carry
        return changed

    def dbl_body(carry):
        p, _ = carry
        p2 = p[p]
        return p2, jnp.any(p2 != p)

    parent, _ = jax.lax.while_loop(dbl_cond, dbl_body, (parent, jnp.bool_(True)))
    return out_val[parent][:out_size].astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("n_bits", "slots", "out_size", "exact")
)
def _inflate_v3_jit(arrays, n_bits, slots, out_size, exact=False):
    nxt, meta = build_graph_v3(arrays, n_bits)
    tape, overflow, sweeps = chase_cells(
        nxt, meta, arrays["cell_entry"], n_bits, slots,
        exact=exact, cell_pend=arrays["cell_pend"],
    )
    out = resolve_tape_xla(
        tape, arrays["cell_block"], arrays["block_out_base"], out_size,
        arrays["stored_pos"], arrays["stored_val"],
    )
    return out, overflow, sweeps


def resolve_tape_fused(tape, cell_block, block_out_base, out_rows: int,
                       m_rows: int, stored_pos, stored_val, tail,
                       interpret: bool = False):
    """Phase B, fused form: XLA scatters literals + compacts matches, the
    Pallas match kernel resolves copies — all inside one jit.

    tail: (WINDOW,) int32 window prologue (zeros for a stream head).
    Returns the (out_rows, 128) int32 byte buffer (window at the front).
    """
    from debigulator_tpu.ops import lz77_pallas as lz

    cells, slots = tape.shape
    flat = tape.reshape(-1)
    valid = flat >= 0
    is_match = flat >= TOK_MATCH_BIT
    mlen = (flat >> 16) & 0x3FFF
    mdist = flat & 0xFFFF
    out_len = jnp.where(is_match, mlen, jnp.where(valid, 1, 0)).astype(jnp.int32)

    base = jnp.repeat(block_out_base[cell_block], slots)
    cum = jnp.cumsum(out_len)
    out_pos = base + cum - out_len + lz.PAD + lz.WINDOW

    total = out_rows * 128
    out_flat = jnp.zeros(total, jnp.int32)
    out_flat = out_flat.at[lz.PAD : lz.PAD + lz.WINDOW].set(tail)
    lit_mask = valid & ~is_match
    lit_tgt = jnp.where(lit_mask, out_pos, total)
    out_flat = out_flat.at[lit_tgt].set(jnp.where(lit_mask, flat, 0), mode="drop")
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos + lz.PAD + lz.WINDOW].set(
            stored_val.astype(jnp.int32), mode="drop"
        )

    # Compact matches in order (min match length 3 ⇒ m_rows*128 ≥ out/3
    # can never overflow).
    midx = jnp.cumsum(is_match.astype(jnp.int32)) - 1
    m_cap = m_rows * 128
    tgt = jnp.where(is_match, midx, m_cap)
    mpos = jnp.full(m_cap, lz.PAD + lz.WINDOW, jnp.int32)
    mpos = mpos.at[tgt].set(out_pos, mode="drop")
    mmeta = jnp.zeros(m_cap, jnp.int32)
    mmeta = mmeta.at[tgt].set(
        jnp.where(is_match, (mlen << 16) | mdist, 0), mode="drop"
    )

    out2d = lz.resolve_matches_v4(
        out_flat.reshape(out_rows, 128),
        mpos.reshape(m_rows, 128),
        mmeta.reshape(m_rows, 128),
        n_matches=jnp.sum(is_match.astype(jnp.int32)),
        interpret=interpret,
    )
    return out2d


#: Output segment bytes for the segmented resolver (VMEM budget:
#: (WINDOW + SEG) int32 bytes + per-segment match arrays).
SEG_BYTES = 512 * 1024


def resolve_tape_segmented(tape, cell_block, block_out_base, n_seg: int,
                           stored_pos, stored_val, interpret: bool = False):
    """Phase B for arbitrary output sizes: literals scatter into an HBM
    buffer, matches partition by output segment, and a lax.scan walks
    segments through the Pallas match kernel carrying the 32 KiB window
    tail — still ONE device call."""
    from debigulator_tpu.ops import lz77_pallas as lz

    cells, slots = tape.shape
    flat = tape.reshape(-1)
    valid = flat >= 0
    is_match = flat >= TOK_MATCH_BIT
    mlen = (flat >> 16) & 0x3FFF
    mdist = flat & 0xFFFF
    out_len = jnp.where(is_match, mlen, jnp.where(valid, 1, 0)).astype(jnp.int32)

    base = jnp.repeat(block_out_base[cell_block], slots)
    cum = jnp.cumsum(out_len)
    out_pos = base + cum - out_len  # body positions (no window offset)

    total = n_seg * SEG_BYTES
    out_flat = jnp.zeros(total, jnp.int32)
    lit_mask = valid & ~is_match
    lit_tgt = jnp.where(lit_mask, out_pos, total)
    out_flat = out_flat.at[lit_tgt].set(jnp.where(lit_mask, flat, 0), mode="drop")
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos].set(
            stored_val.astype(jnp.int32), mode="drop"
        )

    # Split boundary-crossing matches: only the single match covering a
    # segment edge crosses it (matches tile the output), so each match
    # becomes (A: up to the edge) + (B: remainder, possibly empty).
    boundary = (out_pos // SEG_BYTES + 1) * SEG_BYTES
    len_a = jnp.minimum(mlen, boundary - out_pos)
    len_b = mlen - len_a
    pos_ab = jnp.stack([out_pos, boundary], axis=1).reshape(-1)
    len_ab = jnp.stack([len_a, len_b], axis=1).reshape(-1)
    dist_ab = jnp.stack([mdist, mdist], axis=1).reshape(-1)
    real_ab = jnp.stack([is_match & (mlen > 0), is_match & (len_b > 0)],
                        axis=1).reshape(-1)

    # Per-segment slot = rank among real entries of the same segment
    # (array order is execution order within each segment).
    m_seg_cap = _round_pow2(SEG_BYTES // 3 + 4, 2048)
    m_seg_rows = m_seg_cap // 128
    seg_id = jnp.clip(pos_ab // SEG_BYTES, 0, n_seg - 1)
    within = jnp.zeros_like(seg_id)
    seg_counts = jnp.zeros(n_seg, jnp.int32)
    for s in range(n_seg):
        in_s = (seg_id == s) & real_ab
        within = jnp.where(in_s, jnp.cumsum(in_s.astype(jnp.int32)) - 1, within)
        seg_counts = seg_counts.at[s].set(jnp.sum(in_s.astype(jnp.int32)))
    tgt2 = jnp.where(real_ab & (within < m_seg_cap),
                     seg_id * m_seg_cap + within, n_seg * m_seg_cap)
    # Local position inside the segment buffer (pad + window prologue).
    local_pos = pos_ab - seg_id * SEG_BYTES + lz.PAD + lz.WINDOW
    mpos_s = jnp.zeros(n_seg * m_seg_cap + 1, jnp.int32)
    mmeta_s = jnp.zeros(n_seg * m_seg_cap + 1, jnp.int32)
    mpos_s = mpos_s.at[tgt2].set(jnp.where(real_ab, local_pos, 0), mode="drop")
    mmeta_s = mmeta_s.at[tgt2].set(
        jnp.where(real_ab, (len_ab << 16) | dist_ab, 0), mode="drop"
    )
    mpos_seg = mpos_s[:-1].reshape(n_seg, m_seg_rows, 128)
    mmeta_seg = mmeta_s[:-1].reshape(n_seg, m_seg_rows, 128)
    body_seg = out_flat.reshape(n_seg, SEG_BYTES // 128, 128)

    win_rows = lz.WINDOW // 128
    pad = jnp.zeros((lz.PAD // 128, 128), jnp.int32)
    slack = jnp.zeros((4, 128), jnp.int32)

    def seg_step(tail, inp):
        seg_body, mp, mm, cnt = inp
        init = jnp.concatenate([pad, tail, seg_body, slack], axis=0)
        out2d = lz.resolve_matches_v4(init, mp, mm, n_matches=cnt,
                                      interpret=interpret)
        body = out2d[lz.PAD // 128 + win_rows : -4]
        new_tail = out2d[-4 - win_rows : -4]
        return new_tail, body

    tail0 = jnp.zeros((win_rows, 128), jnp.int32)
    _, outs = jax.lax.scan(
        seg_step, tail0, (body_seg, mpos_seg, mmeta_seg, seg_counts)
    )
    return outs.reshape(-1)  # (n_seg * SEG_BYTES,)


def resolve_tape_segmented_v6(tape, counts, bob_cell, n_seg: int,
                              stored_pos, stored_val,
                              interpret: bool = False):
    """Phase B v6: the full-tape Pallas kernel consumes the chase tape
    directly — literals commit as rolled vector runs, matches resolve in
    speculative groups.  XLA prep is elementwise + one cells-sized cumsum;
    the only scatter left is the (tiny) stored-block byte placement."""
    from debigulator_tpu.ops import lz77_pallas as lz

    cells, slots = tape.shape
    sv6 = next(s for s in (16, 32, 64, 128) if s >= slots)
    if sv6 != slots:
        tape = jnp.pad(tape, ((0, 0), (0, sv6 - slots)), constant_values=-1)

    flat = tape.reshape(-1)
    valid = flat >= 0
    is_match = flat >= TOK_MATCH_BIT
    mlen = (flat >> 16) & 0x3FFF
    out_len = jnp.where(is_match, mlen, jnp.where(valid, 1, 0))
    cell_len = out_len.reshape(cells, sv6).sum(axis=1)
    cum = jnp.cumsum(cell_len)
    cbase = bob_cell + cum - cell_len
    cell_end = cbase + cell_len

    chunk_cells = max(128, lz.V6_MLIST_CAP // sv6)
    # Pad the cell axis so chunk-aligned DMA windows stay in bounds.
    cells_pad = (-(-cells // chunk_cells) + 1) * chunk_cells
    pad_c = cells_pad - cells
    tape2d = jnp.pad(tape, ((0, pad_c), (0, 0))).reshape(-1, 128)
    counts_p = jnp.pad(counts.astype(jnp.int32), (0, pad_c)).reshape(-1, 128)
    cbase_p = jnp.pad(cbase.astype(jnp.int32), (0, pad_c)).reshape(-1, 128)

    offs = jnp.arange(n_seg, dtype=jnp.int32) * SEG_BYTES
    lo = jnp.searchsorted(cell_end, offs, side="right").astype(jnp.int32)
    hi = jnp.searchsorted(cbase, offs + SEG_BYTES, side="left").astype(jnp.int32)

    total = n_seg * SEG_BYTES
    out_flat = jnp.zeros(total, jnp.int32)
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos].set(
            stored_val.astype(jnp.int32), mode="drop"
        )
    body_seg = out_flat.reshape(n_seg, SEG_BYTES // 128, 128)

    win_rows = lz.WINDOW // 128
    pad = jnp.zeros((lz.PAD // 128, 128), jnp.int32)
    slack = jnp.zeros((4, 128), jnp.int32)

    def seg_step(tail, inp):
        seg_body, lo_s, hi_s, off_s = inp
        init = jnp.concatenate([pad, tail, seg_body, slack], axis=0)
        out2d = lz.resolve_tape_v6(
            init, tape2d, counts_p, cbase_p, lo_s, hi_s, off_s, sv6,
            interpret=interpret,
        )
        body = out2d[lz.PAD // 128 + win_rows : -4]
        new_tail = out2d[-4 - win_rows : -4]
        return new_tail, body

    tail0 = jnp.zeros((win_rows, 128), jnp.int32)
    _, outs = jax.lax.scan(seg_step, tail0, (body_seg, lo, hi, offs))
    return outs.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_bits", "slots", "n_seg", "exact", "interpret"),
)
def _inflate_v5_jit(arrays, n_bits, slots, n_seg, exact=False, interpret=False):
    """Fused pipeline, segmented Phase B: arbitrary output size, one call."""
    nxt, meta = build_graph_v3(arrays, n_bits)
    tape, overflow, counts, sweeps = chase_cells(
        nxt, meta, arrays["cell_entry"], n_bits, slots,
        return_counts=True, exact=exact, cell_pend=arrays["cell_pend"],
    )
    body = resolve_tape_segmented_v6(
        tape, counts, arrays["bob_cell"], n_seg,
        arrays["stored_pos"], arrays["stored_val"], interpret=interpret,
    )
    return body, overflow


@functools.partial(
    jax.jit,
    static_argnames=("slots", "n_seg", "num_cells", "interpret"),
)
def _inflate_v7_jit(pa, arrays, slots, n_seg, num_cells, interpret=False):
    """Fused pipeline with the Pallas Phase A kernel: decode graph + chase
    run tile-resident in VMEM (ops.phase_a_pallas), then the segmented v6
    Phase B — still one device call, no HBM graph intermediates."""
    from debigulator_tpu.ops.phase_a_pallas import phase_a_pallas

    tape, counts = phase_a_pallas(pa, slots, interpret=interpret)
    tape = tape[:num_cells]
    counts = counts[:num_cells]
    overflow = jnp.any(counts > slots)
    body = resolve_tape_segmented_v6(
        tape, counts, arrays["bob_cell"], n_seg,
        arrays["stored_pos"], arrays["stored_val"], interpret=interpret,
    )
    return body, overflow


@functools.partial(
    jax.jit,
    static_argnames=("n_bits", "slots", "out_rows", "m_rows", "exact", "interpret"),
)
def _inflate_v4_jit(arrays, n_bits, slots, out_rows, m_rows, exact=False,
                    interpret=False):
    """Full fused pipeline: decode graph + chase + literal scatter + Pallas
    match kernel — ONE device call per stream."""
    nxt, meta = build_graph_v3(arrays, n_bits)
    tape, overflow, counts, sweeps = chase_cells(
        nxt, meta, arrays["cell_entry"], n_bits, slots,
        return_counts=True, exact=exact, cell_pend=arrays["cell_pend"],
    )
    out2d = resolve_tape_fused(
        tape, arrays["cell_block"], arrays["block_out_base"], out_rows, m_rows,
        arrays["stored_pos"], arrays["stored_val"],
        jnp.zeros(32768, jnp.int32), interpret=interpret,
    )
    return out2d, overflow


@functools.partial(jax.jit, static_argnames=("n_bits", "slots", "exact"))
def _tape_v3_jit(arrays, n_bits, slots, exact=False):
    """Phase A only: decode graph + chase → (tape, overflow, counts)."""
    nxt, meta = build_graph_v3(arrays, n_bits)
    tape, overflow, counts, sweeps = chase_cells(
        nxt, meta, arrays["cell_entry"], n_bits, slots,
        return_counts=True, exact=exact, cell_pend=arrays["cell_pend"],
    )
    return tape, overflow, counts, sweeps


def v15_stream_too_large(plan) -> bool:
    """True when ONE stream's lit-tape footprint exceeds the v15
    run-meta lit-row field (2^18 rows ≈ a 16 MB+ IDAT at 8 slots) — such
    streams decode through the capless v5 XLA pipeline instead; merged
    BATCHES chunk below the cap at the driver level."""
    from debigulator_tpu.ops.phase_a_pallas import TC

    cells_pad = -(-plan.num_cells // TC) * TC
    return cells_pad * plan.slots // 128 > (1 << 18)


def _use_pallas() -> bool:
    import jax

    from debigulator_tpu.utils.config import get_config

    if not get_config().use_pallas_lz77:
        return False
    return jax.default_backend() not in ("cpu",)


def flagship_jit():
    """The flagship device-resident pipeline entry (v15 Phase B by
    default; DBG_PHASE_B=v13 selects the previous generation)."""
    import os

    if os.environ.get("DBG_PHASE_B", "v15") == "v13":
        return _inflate_v13_jit
    return _inflate_v15_jit


def inflate_device_v3_dev(data: bytes, slots: int = DEFAULT_SLOTS,
                          force_pallas: bool | None = None,
                          scanned=None):
    """Device inflate returning the ON-DEVICE byte buffer.

    Returns (body, out_size): body is a flat int32 device array (one byte
    per element, >= out_size long).  Downstream device consumers (PNG
    unfilter, device checksums) keep working on it without a host
    round-trip; `inflate_device_v3` wraps this with a single readback.

    scanned: optional pre-computed (blocks, lengths, cells) from
    scan_stream_cells so container codecs that already indexed the stream
    (e.g. to find a gzip member's end) don't pay a second host scan.
    """
    from debigulator_tpu.ops.scanner import scan_stream_cells

    if scanned is not None:
        blocks, lengths, cells = scanned
    else:
        blocks, lengths, cells = scan_stream_cells(data, CELL_BITS)
    plan = build_plan_v3(data, blocks, lengths, slots=slots, cells=cells)
    if plan.first_state == TERMINAL:  # stored-only stream
        out = np.zeros(plan.out_size, np.uint8)
        out[plan.stored_pos] = plan.stored_val
        return jnp.asarray(out.astype(np.int32)), plan.out_size
    exact = plan.exact_entries
    use_pallas = (
        force_pallas if force_pallas is not None else _use_pallas()
    )
    from debigulator_tpu.ops import lz77_pallas as lz

    if use_pallas and exact:
        # Flagship device-resident path for ANY output size: Pallas Phase A
        # (on-chip Huffman decode, v13 op/lit tapes) + op-walk Phase B.
        import os as _os

        from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays

        pa = build_pa_arrays(plan, stage=False)
        if (pa is not None and v15_stream_too_large(plan)
                and len(cells) == 3):
            try:
                # Over the per-call run-meta cap: bounded v15 chunks with
                # the 32 KiB window carried on device between calls.
                body, out_size = inflate_device_long_stream(
                    data, blocks, lengths, cells)
                return body, out_size
            except SingleBlockTooLarge:
                # One un-splittable DEFLATE block over the cap (e.g. our
                # own encoder's single-block output at 16 MB+): native
                # serial inflate, result staged to device.
                from debigulator_tpu.native.scanner import inflate_native

                out = np.frombuffer(inflate_native(data), np.uint8)
                return jnp.asarray(out.astype(np.int32)), len(out)
        if pa is not None and not v15_stream_too_large(plan):
            n_seg = _round_pow2(max(1, -(-plan.out_size // SEG_BYTES)), 1)
            interp = jax.default_backend() == "cpu"
            if _os.environ.get("DBG_PHASE_B", "v15") != "v13":
                # ONE-transfer packed staging (tunnel latency is
                # ~21 ms per separate host->device array).
                buf, metas = pack_stage_arrays(pa, plan)
                dev_buf = jnp.asarray(buf)

                def call(slots):
                    return _inflate_v15_packed_jit(
                        dev_buf, metas, slots, n_seg, interpret=interp)
            else:
                pa = {k: jnp.asarray(v) for k, v in pa.items()}
                arrays7 = plan_arrays_v7(plan)

                def call(slots):
                    return flagship_jit()(
                        pa, arrays7, slots, n_seg, interpret=interp)

            body, overflow = call(plan.slots)
            if not plan.slots_exact and bool(overflow):
                body, overflow = call(CELL_BITS)
                assert not bool(overflow)
            return body, plan.out_size

    arrays = plan_arrays_v3(plan)
    if use_pallas and plan.out_size + lz.WINDOW + 512 > lz.OUT_CAP + lz.WINDOW:
        # Large stream off the v15 path (e.g. over the run-meta cap):
        # XLA Phase A + segmented v6 Pallas resolve — no size cap.
        n_seg = _round_pow2(max(1, -(-plan.out_size // SEG_BYTES)), 1)
        interp = jax.default_backend() == "cpu"
        body, overflow = _inflate_v5_jit(
            arrays, plan.n_bits, plan.slots, n_seg, exact=exact,
            interpret=interp,
        )
        if not plan.slots_exact and bool(overflow):
            body, overflow = _inflate_v5_jit(
                arrays, plan.n_bits, CELL_BITS, n_seg, exact=exact,
                interpret=interp,
            )
            assert not bool(overflow)
        return body, plan.out_size
    if use_pallas and plan.out_size + lz.WINDOW + 512 <= lz.OUT_CAP + lz.WINDOW:
        out_rows = _round_pow2(
            -(-(plan.out_size + lz.PAD + lz.WINDOW + lz.MAXLEN + 512) // 128), 64
        )
        m_rows = _round_pow2(-(-(plan.out_size // 3 + 130) // 128), 16)
        interp = jax.default_backend() == "cpu"
        out2d, overflow = _inflate_v4_jit(
            arrays, plan.n_bits, plan.slots, out_rows, m_rows, exact=exact,
            interpret=interp,
        )
        if bool(overflow):
            out2d, overflow = _inflate_v4_jit(
                arrays, plan.n_bits, CELL_BITS, out_rows, m_rows,
                exact=exact, interpret=interp,
            )
            assert not bool(overflow)
        start = lz.PAD + lz.WINDOW
        return out2d.reshape(-1)[start:], plan.out_size
    out_pad = _round_pow2(max(plan.out_size, 1), 256)
    out, overflow, sweeps = _inflate_v3_jit(
        arrays, plan.n_bits, plan.slots, out_pad, exact=exact
    )
    if bool(overflow):
        # Rare dense-stream case: retry with the exact per-cell bound.
        out, overflow, sweeps = _inflate_v3_jit(
            arrays, plan.n_bits, CELL_BITS, out_pad, exact=exact
        )
        assert not bool(overflow)
    return out.astype(jnp.int32), plan.out_size


def inflate_device_v3(data: bytes, slots: int = DEFAULT_SLOTS,
                      force_pallas: bool | None = None,
                      scanned=None) -> bytes:
    """Full v3 device inflate of one raw DEFLATE stream -> host bytes."""
    body, out_size = inflate_device_v3_dev(
        data, slots=slots, force_pallas=force_pallas, scanned=scanned
    )
    return np.asarray(body[:out_size]).astype(np.uint8).tobytes()


def plan_arrays_v7(plan: PlanV3) -> dict:
    """Minimal staged arrays for the device-resident pipelines (v7/v13).

    The Pallas Phase A kernel gets everything else via build_pa_arrays
    (incl. the per-cell stored-bytes offset as cellw row 4); only the
    (tiny) stored-block bytes ship separately.  Shipping just these cuts
    per-batch host->device staging ~5x vs plan_arrays_v3 (measured on
    the tunnel: staging was ~2/3 of honest e2e time in BENCH r3
    baseline).
    """
    return {
        "stored_pos": jnp.asarray(plan.stored_pos),
        "stored_val": jnp.asarray(plan.stored_val),
    }


def resolve_ops_segmented_v13(ma, mb, ra, rb, lit, cnt, outlen, bob_cell,
                              n_seg: int, stored_pos, stored_val,
                              slots: int, interpret: bool = False):
    """Phase B v13: segment scan over the op-walk kernel.

    ma/mb/ra/rb/lit: (slots, cells_pad) from phase_a13_pallas;
    cnt/outlen: (cells_pad,).  bob_cell: (num_cells,) stored-bytes offset
    per cell.
    """
    from debigulator_tpu.ops import lz77_pallas as lz

    cells_pad = ma.shape[1]
    cpr = 128 // slots
    chunk_cells = max(128, lz.V13_MLIST_CAP // slots)

    cl = outlen.astype(jnp.int32)
    bob = jnp.pad(bob_cell.astype(jnp.int32),
                  (0, cells_pad - bob_cell.shape[0]))
    cum = jnp.cumsum(cl)
    cbase = bob + cum - cl
    cell_end = cbase + cl

    offs = jnp.arange(n_seg, dtype=jnp.int32) * SEG_BYTES
    lo = jnp.searchsorted(cell_end, offs, side="right").astype(jnp.int32)
    hi = jnp.searchsorted(cbase, offs + SEG_BYTES, side="left").astype(jnp.int32)

    # Cell-major rows + one chunk of slack so chunk DMA windows stay
    # in bounds past the last live cell.
    pad_rows = chunk_cells // cpr

    def rows_of(t):  # (slots, cells_pad) -> (cells_pad*slots/128 + pad, 128)
        r = t.T.reshape(-1, 128)
        return jnp.pad(r, ((0, pad_rows), (0, 0)))

    ma2d, mb2d = rows_of(ma), rows_of(mb)
    ra2d, rb2d = rows_of(ra), rows_of(rb)
    lit2d = rows_of(lit)
    pad_c = chunk_cells
    cnt2d = jnp.pad(cnt.astype(jnp.int32), (0, pad_c)).reshape(-1, 128)
    cbase2d = jnp.pad(cbase, (0, pad_c)).reshape(-1, 128)

    total = n_seg * SEG_BYTES
    out_flat = jnp.zeros(total, jnp.int32)
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos].set(
            stored_val.astype(jnp.int32), mode="drop"
        )
    body_seg = out_flat.reshape(n_seg, SEG_BYTES // 128, 128)

    win_rows = lz.WINDOW // 128
    pad = jnp.zeros((lz.PAD // 128, 128), jnp.int32)
    slack = jnp.zeros((4, 128), jnp.int32)

    def seg_step(tail, inp):
        seg_body, lo_s, hi_s, off_s = inp
        init = jnp.concatenate([pad, tail, seg_body, slack], axis=0)
        out2d = lz.resolve_ops_v13(
            init, ma2d, mb2d, ra2d, rb2d, lit2d, cnt2d, cbase2d,
            lo_s, hi_s, off_s, slots, interpret=interpret,
        )
        body = out2d[lz.PAD // 128 + win_rows : -4]
        new_tail = out2d[-4 - win_rows : -4]
        return new_tail, body

    tail0 = jnp.zeros((win_rows, 128), jnp.int32)
    _, outs = jax.lax.scan(seg_step, tail0, (body_seg, lo, hi, offs))
    return outs.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("slots", "n_seg", "interpret"),
)
def _inflate_v13_jit(pa, arrays, slots, n_seg, interpret=False):
    """Flagship device-resident pipeline: v13 Phase A (match/run/lit
    tapes) + op-walk Phase B — every Huffman symbol decodes ON CHIP; XLA
    glue is one cells-sized cumsum + two searchsorteds (no token-granular
    work).

    Returns (body, overflow); overflow is False whenever plan.slots came
    from the scanner's exact bound.
    """
    from debigulator_tpu.ops.phase_a_pallas import phase_a13_pallas
    from debigulator_tpu.utils.profiling import named_scope

    with named_scope("phase_a_huffman"):
        ma, mb, ra, rb, lit, cnt, outlen = phase_a13_pallas(
            pa, slots, interpret=interpret
        )
    overflow = jnp.any(((cnt >> 16) > slots) | (((cnt >> 8) & 0xFF) > slots)
                       | ((cnt & 0xFF) > slots))
    with named_scope("phase_b_lz77"):
        body = resolve_ops_segmented_v13(
            ma, mb, ra, rb, lit, cnt, outlen, pa["cellw"][4, :], n_seg,
            arrays["stored_pos"], arrays["stored_val"], slots,
            interpret=interpret,
        )
    return body, overflow


def flagship_body(pa, arrays, slots, n_seg, interpret=False, tail0=None):
    """Traceable core of the flagship v15 pipeline (callable inside a
    larger jit, e.g. the fused PNG decode): Pallas Phase A + v15 Phase B.
    tail0: optional (256, 128) int32 window prologue (the long-stream
    chunked driver carries the 32 KiB window between bounded calls).
    Returns (body bytes-as-int32, overflow flag)."""
    from debigulator_tpu.ops.phase_a_pallas import phase_a13_pallas
    from debigulator_tpu.ops.phase_b_v15 import resolve_segmented_v15
    from debigulator_tpu.utils.profiling import named_scope

    with named_scope("phase_a_huffman"):
        ma, mb, ra, rb, lit, cnt, outlen = phase_a13_pallas(
            pa, slots, interpret=interpret
        )
    overflow = jnp.any(((cnt >> 16) > slots) | (((cnt >> 8) & 0xFF) > slots)
                       | ((cnt & 0xFF) > slots))
    with named_scope("phase_b_lz77"):
        body = resolve_segmented_v15(
            ma, mb, ra, rb, lit, cnt, outlen, pa["cellw"][4, :], n_seg,
            arrays["stored_pos"], arrays["stored_val"], slots, SEG_BYTES,
            interpret=interpret, tail0=tail0,
        )
    return body, overflow


@functools.partial(
    jax.jit,
    static_argnames=("slots", "n_seg", "interpret"),
)
def _inflate_v15_jit(pa, arrays, slots, n_seg, interpret=False):
    """Flagship device-resident pipeline, v15 Phase B: dense record
    lists (vectorized compact kernel) + frontier-batched hazard-free
    walk (scalar discovery pass, flat pipelined execution).  See
    ops.phase_b_v15 for the design; Phase A is unchanged from v13.
    """
    return flagship_body(pa, arrays, slots, n_seg, interpret=interpret)


# --- one-transfer staging ---------------------------------------------------
# Each host->device transfer costs ~21 ms of latency on the dev tunnel,
# and a fresh merged call stages 7 arrays (5 Phase A + 2 stored-bytes).
# pack_stage_arrays flattens them into ONE uint8 buffer on the host;
# unpack_stage_arrays rebuilds the typed views INSIDE the jit with
# static slices + bitcasts (free: XLA folds them into the consumers).

_PACK_KEYS = ("tile_pb", "cellw", "params", "ll_planes", "d_planes")


def pack_stage_arrays(pa_np: dict, plan) -> tuple[np.ndarray, tuple]:
    """Flatten Phase A arrays + stored bytes into (uint8 buffer, metas).

    pa_np: build_pa_arrays output (numpy or jax arrays accepted).
    metas is a hashable static spec: (name, dtype str, shape, off, nb).
    cellw row 2 (the 32-bit lookahead word) is w0 shifted by one cell,
    so only rows (0, 1, 3, 4) ship; unpack_pa_arrays rebuilds row 2
    with one in-jit roll — 20% off the largest staged array.
    """
    cellw = np.asarray(pa_np["cellw"])
    # Row 4 (per-cell stored-bytes offset) is identically zero unless the
    # stream has stored blocks — skip its transfer then (12.5% of the
    # dominant staged array; the tunnel moves ~55 MB/s).
    rows = [0, 1, 3] if not np.any(cellw[4]) else [0, 1, 3, 4]
    items = [("tile_pb", np.asarray(pa_np["tile_pb"])),
             (f"cellw{len(rows)}",
              np.ascontiguousarray(cellw[rows, :])),
             ("params", np.asarray(pa_np["params"])),
             ("ll_planes", np.asarray(pa_np["ll_planes"])),
             ("d_planes", np.asarray(pa_np["d_planes"]))]
    items.append(("stored_pos", np.asarray(plan.stored_pos, np.int32)))
    items.append(("stored_val", np.asarray(plan.stored_val, np.uint8)))
    metas = []
    off = 0
    for name, a in items:
        off = -(-off // 4) * 4  # 4-byte alignment for bitcasts
        nb = a.nbytes
        metas.append((name, a.dtype.str, a.shape, off, nb))
        off += nb
    buf = np.zeros(off, np.uint8)
    for (name, _, _, o, nb), (_, a) in zip(metas, items):
        buf[o : o + nb] = np.ascontiguousarray(a).view(np.uint8).reshape(-1)
    return buf, tuple(metas)


def unpack_stage_arrays(buf, metas) -> dict:
    """Traced inverse of pack_stage_arrays (static slices + bitcasts)."""
    out = {}
    for name, dstr, shape, off, nb in metas:
        dt = np.dtype(dstr)
        seg = jax.lax.slice(buf, (off,), (off + nb,))
        if dt.itemsize == 1:
            arr = jax.lax.bitcast_convert_type(seg, dt)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(-1, dt.itemsize), dt)
        out[name] = arr.reshape(shape)
    return out


def unpack_pa_arrays(buf, metas) -> tuple[dict, dict]:
    """Traced: packed buffer -> (pa dict, stored arrays dict).

    cellw ships as rows (0, 1, 3[, 4]): row 2 (the lookahead word)
    rebuilds as w0 shifted one cell, and row 4 (stored-bytes offsets) is
    zeros unless the stream has stored blocks."""
    d = unpack_stage_arrays(buf, metas)
    if "cellw4" in d:
        cw = d.pop("cellw4")
        row4 = cw[3]
    else:
        cw = d.pop("cellw3")
        row4 = jnp.zeros_like(cw[0])
    w2 = jnp.concatenate(
        [cw[0, 1:], jnp.zeros((1,), cw.dtype)])  # lookahead = w0 << 1 cell
    d["cellw"] = jnp.stack([cw[0], cw[1], w2, cw[2], row4])
    pa = {k: d[k] for k in _PACK_KEYS}
    arrays = {"stored_pos": d["stored_pos"], "stored_val": d["stored_val"]}
    return pa, arrays


@functools.partial(
    jax.jit, static_argnames=("metas", "slots", "n_seg", "interpret"),
)
def _inflate_v15_packed_jit(buf, metas, slots, n_seg, interpret=False):
    """Flagship v15 fed by the ONE-transfer packed staging buffer."""
    pa, arrays = unpack_pa_arrays(buf, metas)
    return flagship_body(pa, arrays, slots, n_seg, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("metas", "slots", "n_seg", "interpret"),
)
def _inflate_v15_packed_tail_jit(buf, tail0, metas, slots, n_seg,
                                 interpret=False):
    """Packed flagship with a carried window prologue (chunked driver)."""
    pa, arrays = unpack_pa_arrays(buf, metas)
    return flagship_body(pa, arrays, slots, n_seg, interpret=interpret,
                         tail0=tail0)


class SingleBlockTooLarge(RuntimeError):
    """One DEFLATE block alone exceeds the per-call v15 cap (cannot be
    split at a block boundary)."""


def inflate_device_long_stream(data: bytes, blocks, lengths, cells,
                               cap_rows: int = 1 << 18):
    """Decode ONE stream larger than the v15 run-meta cap: block-aligned
    sub-plans of bounded cell count run the flagship v15 pipeline in
    sequence with the 32 KiB window carried on DEVICE between calls —
    output stays device-resident throughout (the capless v5 XLA graph
    would materialize per-position NXT/META tables, ~10 GB at 80 MB of
    scanlines).  Returns (device body int32 (out_size_padded,), out_size).
    """
    import dataclasses as _dc

    from debigulator_tpu.ops.phase_a_pallas import TC, build_pa_arrays
    from debigulator_tpu.ops.phase_b_v15 import WIN_ROWS

    states, pends, mct = cells
    slots_bound = next(s for s in (8, 16, 32, 64, 128) if s >= max(mct, 1))
    cap_cells = (cap_rows * 128 // slots_bound) // (2 * TC) * TC

    # Block-aligned chunks: block b occupies cells [vcell(b), vcell(b+1))
    # on the virtual layout (every block is cell-aligned), so per-block cell
    # extents are host-known without decoding.
    ncells_b = [
        0 if b.btype == C.BTYPE_STORED
        else max(1, -(-(b.end_bit - b.data_start_bit) // CELL_BITS))
        for b in blocks
    ]
    if max(ncells_b, default=0) > cap_cells:
        raise SingleBlockTooLarge(
            f"a single block spans {max(ncells_b)} cells "
            f"(> cap {cap_cells})")
    chunks = []
    cur, cur_cells = [], 0
    for b, nc in enumerate(ncells_b):
        if cur and cur_cells + nc > cap_cells:
            chunks.append(cur)
            cur, cur_cells = [], 0
        cur.append(b)
        cur_cells += nc
    chunks.append(cur)

    interp = jax.default_backend() == "cpu"
    tail = jnp.zeros((WIN_ROWS, 128), jnp.int32)
    bodies = []
    cell0 = 0
    for chunk in chunks:
        b0, b1 = chunk[0], chunk[-1] + 1
        out0 = blocks[b0].out_start
        sub_blocks = [
            _dc.replace(b, out_start=b.out_start - out0)
            for b in blocks[b0:b1]
        ]
        nchunk_cells = sum(ncells_b[b0:b1])
        sub_states = states[cell0 : cell0 + nchunk_cells].astype(np.int64)
        sub_states = np.where(
            sub_states >= 0, sub_states - 2 * cell0 * CELL_BITS, -1)
        sub_cells = (sub_states.astype(np.int32),
                     pends[cell0 : cell0 + nchunk_cells], mct)
        plan = build_plan_v3(data, sub_blocks, lengths[b0:b1],
                             cells=sub_cells)
        pa_np = build_pa_arrays(plan, stage=False)
        assert pa_np is not None, "chunked long-stream plan not coverable"
        buf, metas = pack_stage_arrays(pa_np, plan)
        n_seg = _round_pow2(max(1, -(-plan.out_size // SEG_BYTES)), 1)
        body, overflow = _inflate_v15_packed_tail_jit(
            jnp.asarray(buf), tail, metas, plan.slots, n_seg,
            interpret=interp)
        bodies.append(body[: plan.out_size])
        tail = jnp.concatenate(
            [tail.reshape(-1), body[: plan.out_size]]
        )[-WIN_ROWS * 128:].reshape(WIN_ROWS, 128)
        cell0 += nchunk_cells
    out = jnp.concatenate(bodies)
    return out, int(out.shape[0])


