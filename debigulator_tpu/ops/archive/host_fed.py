"""Host-fed v12 pipeline prep (ARCHIVED generation).

The round-2 flagship: the host scan emits token records, packs matches
into conflict-free groups of 8 (native dbg_pack_groups) and precomputes
every piece's kernel scalars; the device only replays LZ77
(archive.inflate_generations._inflate_v10_jit).  Its device call is
faster than the flagship's but its host cost is O(symbols) per stream —
superseded by the device-resident v15/v16 pipeline.  Kept (with its
tests) as the measured-generation record; no production path imports
this module.
"""

from __future__ import annotations

import numpy as np

from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.parallel.merged import MergedPlan, _pad_rec_rows


def _pack_piece_words(dst_local, length, src_local):
    """Precompute the v12 kernel's per-piece scalar work as two words.

    w0 = dst_row<<16 | rp<<8 | (rp+len)   (store row, mask lo/hi)
    w1 = q_row<<16 |  r<<8  | (128-r)     (load row, roll, row-select)
    where rp = dst_local & 127 and q = src_local - rp (2-row load base on
    the dst row grid).  Requires the row-split invariant rp+len <= 128.
    """
    dst_local = dst_local.astype(np.int64)
    src_local = src_local.astype(np.int64)
    rp = dst_local & 127
    q = src_local - rp
    r = q & 127
    w0 = ((dst_local >> 7) << 16) | (rp << 8) | (rp + length)
    w1 = ((q >> 7) << 16) | (r << 8) | (128 - r)
    assert (q >= 0).all(), "negative load base"
    return w0.astype(np.int32), w1.astype(np.int32)


def build_v9_arrays(mp: MergedPlan, n_seg: int) -> dict | None:
    """Host prep for the group-driven Phase B (v12) from a merged plan's
    records; see build_piece_arrays."""
    if mp.recs is None:
        return None
    return build_piece_arrays(mp.recs, n_seg)


def build_piece_arrays(recs: dict, n_seg: int,
                       seg_bytes: int | None = None) -> dict | None:
    """Host prep for the group-driven Phase B (v12): pack matches into
    conflict-free groups of 8 (native dbg_pack_groups), turn literal
    runs into copy pieces sourced from the dense host literal array, and
    precompute every piece's kernel scalars into two packed words —
    the kernel never needs the Phase A tape.  Returns device arrays, or
    None without the native packer."""
    import jax.numpy as jnp

    from debigulator_tpu.native.scanner import pack_groups
    from debigulator_tpu.ops import lz77_pallas as lz
    from debigulator_tpu.ops.archive import lz77_generations as lzgen

    SEG = seg_bytes if seg_bytes is not None else v3.SEG_BYTES
    ORIGIN = lz.PAD + lz.WINDOW  # segment body start in local coords

    packed = pack_groups(recs["m_pos"], recs["m_meta"], SEG, n_seg)
    if packed is None:
        return None
    g_pos, g_meta, seg_lo, seg_hi = packed
    # Localize matches per segment and precompute kernel words.
    slot_seg = np.repeat(
        np.arange(n_seg, dtype=np.int64), (seg_hi - seg_lo).astype(np.int64))
    assert len(slot_seg) == len(g_pos), "segment ranges must cover all slots"
    m_dst_l = g_pos.astype(np.int64) - slot_seg * SEG + ORIGIN
    m_len = (g_meta.astype(np.int64) >> 16) & 0xFFFF
    m_src_l = m_dst_l - (g_meta.astype(np.int64) & 0xFFFF)
    g_pos, g_meta = _pack_piece_words(m_dst_l, m_len, m_src_l)

    # --- literal runs -> pieces over the dense literal array --------------
    # Piece = (dst, lit0, len); split at dst 128-byte row boundaries (run
    # len <= 64 so at most one split; rows also cover SEG boundaries), so
    # every piece satisfies (dst&127)+len <= 128 for the v11 narrow-piece
    # kernel.  Then bucket per segment and pad each segment's slot range
    # to a multiple of V9_GROUP.
    rln = (recs["r_j0len"].astype(np.int64) & 0xFF)
    dst = recs["r_pos"].astype(np.int64)
    lit0 = recs["r_lit0"].astype(np.int64)
    boundary = (dst // 128 + 1) * 128
    len_a = np.minimum(rln, boundary - dst)
    len_b = rln - len_a
    p_dst = np.stack([dst, boundary], 1).reshape(-1)
    p_lit = np.stack([lit0, lit0 + len_a], 1).reshape(-1)
    p_len = np.stack([len_a, len_b], 1).reshape(-1)
    keep = p_len > 0
    p_dst, p_lit, p_len = p_dst[keep], p_lit[keep], p_len[keep]
    # Array order is dst order (A/B interleave preserves it within a run
    # and across runs), so a stable per-segment bucketing keeps literal
    # offsets monotone inside each segment.
    seg_id = np.clip(p_dst // SEG, 0, n_seg - 1)
    order = np.argsort(seg_id, kind="stable")
    p_dst, p_lit, p_len, seg_id = (
        p_dst[order], p_lit[order], p_len[order], seg_id[order])
    counts = np.bincount(seg_id, minlength=n_seg)
    padded = -(-counts // lzgen.V9_GROUP) * lzgen.V9_GROUP
    starts_in = np.concatenate([[0], np.cumsum(counts)[:-1]])
    starts_out = np.concatenate([[0], np.cumsum(padded)[:-1]])
    n_slots = int(padded.sum())
    # Padding slots get a harmless no-op piece: len 0, dst at the segment
    # origin, load base inside the scratch pad row.
    l_pos = np.full(n_slots, ((ORIGIN >> 7) << 16), np.int32)
    l_meta = np.full(n_slots, (1 << 16) | 128, np.int32)
    l_lo = starts_out.astype(np.int32)
    l_hi = (starts_out + counts).astype(np.int32)
    lit_row_base = np.zeros(n_seg, np.int32)
    # Scatter pieces to padded slots: out index = starts_out[seg] + rank.
    rank = np.arange(len(p_dst)) - starts_in[seg_id]
    slot = starts_out[seg_id] + rank
    # Per-segment literal slice base (row-aligned); offsets relative +128
    # for the kernel scratch pad row.
    if len(p_dst):
        seg_has = counts > 0
        first_lit = np.zeros(n_seg, np.int64)
        first_lit[seg_has] = p_lit[starts_in[np.nonzero(seg_has)[0]]]
        lit_row_base = (first_lit >> 7).astype(np.int32)
        rel = p_lit - (lit_row_base.astype(np.int64)[seg_id] << 7) + 128
        dst_local = p_dst - seg_id * SEG + ORIGIN
        w0, w1 = _pack_piece_words(dst_local, p_len, rel)
        l_pos[slot] = w0
        l_meta[slot] = w1

    lims = np.zeros((n_seg, 8), np.int32)
    lims[:, 0] = seg_lo
    lims[:, 1] = seg_hi
    lims[:, 2] = (np.arange(n_seg, dtype=np.int64) * SEG).astype(np.int32)
    lims[:, 3] = l_lo
    lims[:, 4] = l_hi
    lims[:, 5] = lit_row_base

    # Dense literal bytes as (Lr, 128) int32, padded so every segment's
    # fixed scratch DMA window stays in bounds.
    lit = recs["lit"]
    ls_rows = lzgen._lit_scratch_rows(SEG)
    lr = -(-max(len(lit), 1) // 128) + ls_rows
    lit32 = np.zeros(lr * 128, np.int32)
    lit32[: len(lit)] = lit
    sr = lzgen.V9_STAGE_ROWS
    return {
        "lims": jnp.asarray(lims),
        "gpos": jnp.asarray(_pad_rec_rows(g_pos, sr)),
        "gmeta": jnp.asarray(_pad_rec_rows(g_meta, sr)),
        "lpos": jnp.asarray(_pad_rec_rows(l_pos.astype(np.int32), sr)),
        "lmeta": jnp.asarray(_pad_rec_rows(l_meta.astype(np.int32), sr)),
        "lit": jnp.asarray(lit32.reshape(lr, 128)),
    }


