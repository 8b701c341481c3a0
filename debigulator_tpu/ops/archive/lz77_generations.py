"""Superseded LZ77 kernel generations (v1/v2/v9-v12, v14) — quarantined.

Each generation here was measured and superseded (docs/PERF_NOTES.md has
the numbers); the flagship path is ops.phase_b_v15 with ops.lz77_pallas
keeping only the still-live fallbacks (v4 grouped matches, v6 tape walk,
v13 op walk).  One-line pointers:

* v1 `_lz77_kernel` / `resolve_tape_pallas`: per-token SMEM walk, host
  window chaining — first working Pallas Phase B.
* v1/v2 match kernels: literal pre-scatter + match-only walks.
* v9-v12 group kernels: HOST-fed hazard-free groups (the r2 flagship);
  reachable via parallel.merged.prepare_merged(host_fed=True).
* v14: compaction-once + dense-list walk — slower than v13 and VMEM-
  heavy at K=29; kept for the equivalence test only.

Shared helpers/constants import from ops.lz77_pallas (the live module).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from debigulator_tpu.ops.lz77_pallas import (
    CELL_CAP,
    VAL_ROWS,
    GROUP,
    MAXLEN,
    OUT_CAP,
    PAD,
    SPAN_ROWS,
    TOK_MATCH_BIT,
    WINDOW,
    WINDOW_ROWS,
    _copy_span,
    _extract,
    _load_span,
    _load_span4,
    _round_up,
    _span_flat_iota,
    _store_span,
)

def _lz77_kernel(counts_ref, tape_ref, tail_ref, out_ref, cur_ref):
    """counts_ref: (cells,) SMEM; tape_ref: (cells,128) VMEM packed tokens;
    tail_ref: (WINDOW_ROWS,128) VMEM; out_ref: (rows,128) VMEM;
    cur_ref: (1,) SMEM cursor."""
    num_cells = counts_ref.shape[0]
    slots = tape_ref.shape[1]
    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (1, slots), 1)

    out_ref[pl.ds(0, WINDOW_ROWS), :] = tail_ref[:]
    cur_ref[0] = WINDOW

    def per_cell(c, _):
        cnt = counts_ref[c]

        @pl.when(cnt > 0)
        def _():
            row = tape_ref[pl.ds(c, 1), :]  # (1, slots)
            valid = iota_slots < cnt
            any_match = jnp.any((row >= TOK_MATCH_BIT) & valid)
            cur = cur_ref[0]

            @pl.when(jnp.logical_not(any_match))
            def _fast():
                # All-literal cell: one masked span commit.
                vals = jnp.concatenate(
                    [row & 0x1FF, jnp.zeros((VAL_ROWS - 1, slots), jnp.int32)],
                    axis=0,
                )
                _store_span(out_ref, cur, vals, cnt)
                cur_ref[0] = cur + cnt

            @pl.when(any_match)
            def _slow():
                def per_tok(j, _):
                    @pl.when(j < cnt)
                    def _():
                        e = _extract(row, j)
                        cur = cur_ref[0]
                        is_match = e >= TOK_MATCH_BIT

                        @pl.when(jnp.logical_not(is_match))
                        def _lit():
                            vals = jnp.full((VAL_ROWS, 128), e & 0x1FF, jnp.int32)
                            _store_span(out_ref, cur, vals, 1)
                            cur_ref[0] = cur + 1

                        @pl.when(is_match)
                        def _match():
                            length = (e >> 16) & 0x3FFF
                            dist = e & 0xFFFF
                            src = cur - dist

                            @pl.when(dist >= length)
                            def _plain():
                                data = _load_span(out_ref, src)
                                _store_span(out_ref, cur, data, length)

                            @pl.when(dist < length)
                            def _overlap():
                                n0 = jnp.minimum(dist, length)
                                data = _load_span(out_ref, src)
                                _store_span(out_ref, cur, data, n0)

                                def grow(k, avail):
                                    @pl.when(avail < length)
                                    def _():
                                        d2 = _load_span(out_ref, cur)
                                        n_new = jnp.minimum(
                                            avail, length - avail
                                        )
                                        _store_span(
                                            out_ref, cur + avail, d2, n_new
                                        )
                                    return jnp.minimum(avail * 2, length)

                                jax.lax.fori_loop(0, 9, grow, n0)

                            cur_ref[0] = cur + length

                    return 0

                jax.lax.fori_loop(0, slots, per_tok, 0)

        return 0

    jax.lax.fori_loop(0, num_cells, per_cell, 0)


def _make_launch(interpret: bool):
    @functools.partial(
        jax.jit, static_argnames=("num_cells", "slots", "out_rows")
    )
    def launch(counts, tape, tail, num_cells: int, slots: int, out_rows: int):
        return pl.pallas_call(
            _lz77_kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=interpret,
        )(counts, tape, tail)

    return launch


_launch_compiled = _make_launch(False)
_launch_interpret = _make_launch(True)



# ---------------------------------------------------------------------------
# Match-only kernel (v3): literals pre-scattered by XLA, the kernel walks
# just the compacted match list — ~100 ns per match instead of per-token
# loop overheads.  Composes inside one jit with Phase A (one device call
# per stream/batch).
# ---------------------------------------------------------------------------


def _match_kernel(pos_ref, meta_ref, init_ref, out_ref):
    """pos_ref/meta_ref: (Mr, 128) int32 — match output positions (offset by
    WINDOW) and packed len<<16|dist; padding entries have len 0.
    init_ref aliases out_ref ((rows, 128) int32): the prologue rows already
    hold the window tail and literals are pre-scattered."""
    del init_ref  # same memory as out_ref (input_output_aliases)
    m_rows = pos_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def per_row(ri, _):
        mrow = meta_ref[pl.ds(ri, 1), :]

        @pl.when(jnp.any(mrow >= (1 << 16)))  # skip all-padding rows
        def _row():
            prow = pos_ref[pl.ds(ri, 1), :]
            per_lanes(prow, mrow)

        return 0

    def per_lanes(prow, mrow):
        def per_lane(j, _):
            cur = jnp.sum(jnp.where(iota == j, prow, 0))
            meta = jnp.sum(jnp.where(iota == j, mrow, 0))
            length = meta >> 16
            dist = meta & 0xFFFF

            @pl.when(length > 0)
            def _():
                src = cur - dist

                @pl.when(dist >= length)
                def _plain():
                    data = _load_span(out_ref, src)
                    _store_span(out_ref, cur, data, length)

                @pl.when(dist < length)
                def _overlap():
                    n0 = jnp.minimum(dist, length)
                    data = _load_span(out_ref, src)
                    _store_span(out_ref, cur, data, n0)

                    def grow(k, avail):
                        @pl.when(avail < length)
                        def _():
                            d2 = _load_span(out_ref, cur)
                            n_new = jnp.minimum(avail, length - avail)
                            _store_span(out_ref, cur + avail, d2, n_new)
                        return jnp.minimum(avail * 2, length)

                    jax.lax.fori_loop(0, 9, grow, n0)

            return 0

        jax.lax.fori_loop(0, 128, per_lane, 0)
        return 0

    jax.lax.fori_loop(0, m_rows, per_row, 0)



def _match_kernel_v2(pos_ref, meta_ref, init_ref, out_ref):
    """Lean match walk: one aligned load + one masked store per match.

    pos_ref/meta_ref: (Mr, 128) int32 — match output positions (already
    offset by PAD+WINDOW) and packed len<<16|dist; padding entries len 0.
    init_ref aliases out_ref; row 0 of the buffer is a permanent pad row so
    src - (dst & 127) is never negative (src >= PAD - 127 > 0 always).
    """
    del init_ref
    m_rows = pos_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def per_lane(j, carry):
        prow, mrow = carry
        meta = jnp.sum(jnp.where(iota == j, mrow, 0))
        length = meta >> 16
        dist = meta & 0xFFFF

        @pl.when(length > 0)
        def _():
            cur = jnp.sum(jnp.where(iota == j, prow, 0))
            src = cur - dist

            @pl.when(dist >= length)
            def _plain():
                _copy_span(out_ref, src, cur, length)

            @pl.when(dist < length)
            def _overlap():
                n0 = jnp.minimum(dist, length)
                _copy_span(out_ref, src, cur, n0)

                def grow(k, avail):
                    @pl.when(avail < length)
                    def _():
                        n_new = jnp.minimum(avail, length - avail)
                        _copy_span(out_ref, cur, cur + avail, n_new)
                    return jnp.minimum(avail * 2, length)

                jax.lax.fori_loop(0, 9, grow, n0)

        return carry

    def per_row(ri, _):
        mrow = meta_ref[pl.ds(ri, 1), :]

        @pl.when(jnp.any(mrow >= (1 << 16)))  # skip all-padding rows
        def _row():
            prow = pos_ref[pl.ds(ri, 1), :]
            jax.lax.fori_loop(0, 128, per_lane, (prow, mrow))

        return 0

    jax.lax.fori_loop(0, m_rows, per_row, 0)



def resolve_matches_v2(out_init, match_pos, match_meta,
                       interpret: bool = False):
    """Run the v2 match kernel inside jit.

    out_init: (rows, 128) int32 — row 0 is the pad row, then the window
    prologue rows, then the body with literals pre-scattered.
    match_pos/match_meta: (Mr, 128) int32; positions include PAD+WINDOW.
    """
    return pl.pallas_call(
        _match_kernel_v2,
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(match_pos, match_meta, out_init)



# ---------------------------------------------------------------------------
# v9: group-driven Phase B.  The native scanner (dbg_scan2) emits dense
# match records during its existing token walk, and dbg_pack_groups packs
# them into conflict-free groups of 8: every slot has len <= 128, and no
# slot's source range overlaps any slot's destination range within the
# group (long matches are split; RLE matches become pattern-doubling
# pieces in successive groups).  The kernel therefore issues all 8 loads
# then all 8 stores per group with ZERO conflict logic — the measured
# per-match cost drops ~3.5x vs the in-kernel conflict check (v8).
# Literal runs never read the output, so they are scattered by XLA into
# the initial buffer before the kernel runs (together with stored bytes).
# Reference analog: the symbol loop + LZ77 copy at inflate.c:1697-1909.
# ---------------------------------------------------------------------------

#: Record rows staged into SMEM per DMA (x128 slots).
V9_STAGE_ROWS = 16
#: Matches per group (must match kGroup in native/dbg_native.cpp).
V9_GROUP = 8


def _load_span_n(out_ref, q, nrows):
    """(nrows,128) int32 holding output bytes [q, q+nrows*128) flat-aligned.

    The trailing (q & 127) lanes of the last row wrap to the first row —
    callers must only consume flat offsets f < nrows*128 - (q & 127).
    """
    r = q & 127
    a = out_ref[pl.ds(q >> 7, nrows), :]
    ar = pltpu.roll(a, -r, axis=1)
    nxt = jnp.concatenate([ar[1:], ar[:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
    return jnp.where(lane < 128 - r, ar, nxt)


def _group_kernel_v9(lim_ref, gpos_hbm, gmeta_hbm, init_ref, out_ref):
    """One output segment: unconditional grouped match resolve.

    lim_ref: (8,) SMEM — s_lo, s_hi (slot range, multiples of 8), seg_off.
    gpos_hbm/gmeta_hbm: (rows, 128) int32 in HBM, staged to SMEM in
    V9_STAGE_ROWS windows; positions are stream-global (localized by
    seg_off), metas are len<<16|dist with len <= 128 (padding: len 0,
    pos = segment start).  init_ref aliases out_ref: pad row + 32 KiB
    window prologue + body (literals/stored pre-scattered) + slack rows.
    """
    del init_ref
    s_lo = lim_ref[0]
    s_hi = lim_ref[1]
    base_adj = (PAD + WINDOW) - lim_ref[2]
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

    def body(gp_s, gm_s, sem):
        def per_stage(si, _):
            st = (s_lo >> 7) + si * V9_STAGE_ROWS
            for hbm, smem in ((gpos_hbm, gp_s), (gmeta_hbm, gm_s)):
                dd = pltpu.make_async_copy(
                    hbm.at[pl.ds(st, V9_STAGE_ROWS), :], smem, sem)
                dd.start()
                dd.wait()
            base = st * 128

            def per_group(gi, _):
                i0 = gi * V9_GROUP

                # Groups never span segments, so one range check covers
                # all 8 slots (slots outside [s_lo, s_hi) belong to a
                # neighboring segment whose copies must not replay here).
                @pl.when((base + i0 >= s_lo) & (base + i0 < s_hi))
                def _grp():
                    dsts, lens, datas = [], [], []
                    for g in range(V9_GROUP):
                        t = i0 + g
                        meta = gm_s[t >> 7, t & 127]
                        dst = gp_s[t >> 7, t & 127] + base_adj
                        src = dst - (meta & 0xFFFF)
                        dsts.append(dst)
                        lens.append(meta >> 16)
                        datas.append(
                            _load_span_n(out_ref, src - (dst & 127), 3)
                        )
                    for g in range(V9_GROUP):
                        rp = dsts[g] & 127
                        mask = (flat2 >= rp) & (flat2 < rp + lens[g])
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, 2), :],
                            datas[g][:2], mask=mask)

                return 0

            jax.lax.fori_loop(0, V9_STAGE_ROWS * 128 // V9_GROUP,
                              per_group, 0)
            return 0

        n_stages = (s_hi - (s_lo & ~127) + V9_STAGE_ROWS * 128 - 1) \
            // (V9_STAGE_ROWS * 128)
        jax.lax.fori_loop(0, n_stages, per_stage, 0)

    pl.run_scoped(
        body,
        gp_s=pltpu.SMEM((V9_STAGE_ROWS, 128), jnp.int32),
        gm_s=pltpu.SMEM((V9_STAGE_ROWS, 128), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


# ---------------------------------------------------------------------------
# v10: fully host-fed Phase B.  The native scanner's literal bytes arrive as
# a dense array (recs["lit"]), so literal runs become copy pieces from that
# array — no XLA gather/scatter and no Phase A tape dependency at all.  One
# segment launch: DMA the segment's literal slice into a VMEM scratch, commit
# all literal-run pieces (masked span stores from the scratch), then resolve
# the conflict-free match groups exactly as v9.  Replaces the reference's
# entire symbol loop output path (inflate.c:1736-1747, :1861-1897).
# ---------------------------------------------------------------------------


def _lit_scratch_rows(seg_bytes: int) -> int:
    return seg_bytes // 128 + 8


def _group_kernel_v10(lim_ref, gpos_hbm, gmeta_hbm, lpos_hbm, lmeta_hbm,
                      lit_hbm, init_ref, out_ref, *, seg_bytes: int):
    """One output segment: literal-run pieces then match groups.

    lim_ref: (8,) SMEM — [0]=match slot lo, [1]=match slot hi, [2]=segment
    output offset, [3]=lit slot lo, [4]=lit slot hi, [5]=lit row base.
    gpos/gmeta: match groups (v9 packing, len<=128, conflict-free by 8).
    lpos/lmeta: literal pieces — lpos = dst (stream-global), lmeta =
    len<<20 | src_rel where src_rel indexes the staged literal slice
    (+128 for the scratch pad row); len <= CELL_BITS and pieces never read
    the output, so any 8 can run as an unconditional group.
    lit_hbm: (Lr, 128) int32 dense literal bytes (one per element).
    init_ref aliases out_ref: pad row + 32 KiB window + body + slack.
    """
    del init_ref
    m_lo = lim_ref[0]
    m_hi = lim_ref[1]
    base_adj = (PAD + WINDOW) - lim_ref[2]
    l_lo = lim_ref[3]
    l_hi = lim_ref[4]
    lit_base = lim_ref[5]
    ls_rows = _lit_scratch_rows(seg_bytes)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

    def body(gp_s, gm_s, lit_v, sem):
        # --- stage this segment's literal slice (rows, masked by range) ---
        @pl.when(l_hi > l_lo)
        def _stage_lits():
            dd = pltpu.make_async_copy(
                lit_hbm.at[pl.ds(lit_base, ls_rows - 1)],
                lit_v.at[pl.ds(1, ls_rows - 1)], sem)
            dd.start()
            dd.wait()

        # --- literal-run pieces: unconditional groups of 8 ----------------
        def lit_stage(si, _):
            st = (l_lo >> 7) + si * V9_STAGE_ROWS
            for hbm, smem in ((lpos_hbm, gp_s), (lmeta_hbm, gm_s)):
                dd = pltpu.make_async_copy(
                    hbm.at[pl.ds(st, V9_STAGE_ROWS), :], smem, sem)
                dd.start()
                dd.wait()
            base = st * 128

            def per_group(gi, _):
                i0 = gi * V9_GROUP

                @pl.when((base + i0 >= l_lo) & (base + i0 < l_hi))
                def _grp():
                    dsts, lens, datas = [], [], []
                    for g in range(V9_GROUP):
                        t = i0 + g
                        meta = gm_s[t >> 7, t & 127]
                        dst = gp_s[t >> 7, t & 127] + base_adj
                        src = meta & 0xFFFFF
                        dsts.append(dst)
                        lens.append(meta >> 20)
                        datas.append(
                            _load_span_n(lit_v, src - (dst & 127), 3)
                        )
                    for g in range(V9_GROUP):
                        rp = dsts[g] & 127
                        mask = (flat2 >= rp) & (flat2 < rp + lens[g])
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, 2), :],
                            datas[g][:2], mask=mask)

                return 0

            jax.lax.fori_loop(0, V9_STAGE_ROWS * 128 // V9_GROUP,
                              per_group, 0)
            return 0

        n_lstages = (l_hi - (l_lo & ~127) + V9_STAGE_ROWS * 128 - 1) \
            // (V9_STAGE_ROWS * 128)
        jax.lax.fori_loop(0, n_lstages, lit_stage, 0)

        # --- match groups (identical to v9) -------------------------------
        def per_stage(si, _):
            st = (m_lo >> 7) + si * V9_STAGE_ROWS
            for hbm, smem in ((gpos_hbm, gp_s), (gmeta_hbm, gm_s)):
                dd = pltpu.make_async_copy(
                    hbm.at[pl.ds(st, V9_STAGE_ROWS), :], smem, sem)
                dd.start()
                dd.wait()
            base = st * 128

            def per_group(gi, _):
                i0 = gi * V9_GROUP

                @pl.when((base + i0 >= m_lo) & (base + i0 < m_hi))
                def _grp():
                    dsts, lens, datas = [], [], []
                    for g in range(V9_GROUP):
                        t = i0 + g
                        meta = gm_s[t >> 7, t & 127]
                        dst = gp_s[t >> 7, t & 127] + base_adj
                        src = dst - (meta & 0xFFFF)
                        dsts.append(dst)
                        lens.append(meta >> 16)
                        datas.append(
                            _load_span_n(out_ref, src - (dst & 127), 3)
                        )
                    for g in range(V9_GROUP):
                        rp = dsts[g] & 127
                        mask = (flat2 >= rp) & (flat2 < rp + lens[g])
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, 2), :],
                            datas[g][:2], mask=mask)

                return 0

            jax.lax.fori_loop(0, V9_STAGE_ROWS * 128 // V9_GROUP,
                              per_group, 0)
            return 0

        n_stages = (m_hi - (m_lo & ~127) + V9_STAGE_ROWS * 128 - 1) \
            // (V9_STAGE_ROWS * 128)
        jax.lax.fori_loop(0, n_stages, per_stage, 0)

    pl.run_scoped(
        body,
        gp_s=pltpu.SMEM((V9_STAGE_ROWS, 128), jnp.int32),
        gm_s=pltpu.SMEM((V9_STAGE_ROWS, 128), jnp.int32),
        lit_v=pltpu.VMEM((_lit_scratch_rows(seg_bytes), 128), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


# ---------------------------------------------------------------------------
# v11: narrow-piece Phase B.  The host packer splits every piece (match and
# literal run) at dst 128-byte row boundaries, so (dst & 127) + len <= 128
# always holds: the kernel loads a 2-row source window, aligns it to the
# dst row grid with one roll + one row select, and commits ONE masked-row
# store — vs v10's 3-row load + 2-row store.  Everything else (group-of-8
# issue order, SMEM staging, segment ranges) is identical to v10.
# ---------------------------------------------------------------------------


def _narrow_groups(src_ref, pos_s, meta_s, out_ref, lo, hi):
    """Walk [lo, hi) slots of a staged SMEM piece list in groups of 8.

    src_ref: where piece sources live (out_ref for matches, the literal
    scratch for literal pieces).  Pieces arrive as two host-precomputed
    words (merged._pack_piece_words): pos = dst_row<<16|rp<<8|(rp+len),
    meta = q_row<<16|r<<8|(128-r) — the kernel does no address math
    beyond unpacking.  Every piece has (dst&127)+len <= 128.
    """
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def per_group(gi, _):
        i0 = gi * V9_GROUP

        @pl.when((i0 >= lo) & (i0 < hi))
        def _grp():
            w0s, datas = [], []
            row = i0 >> 7  # a group of 8 never crosses an SMEM row
            l0 = i0 & 127
            for g in range(V9_GROUP):
                w0 = pos_s[row, l0 + g]
                w1 = meta_s[row, l0 + g]
                a = src_ref[pl.ds(w1 >> 16, 2), :]
                ar = pltpu.roll(a, -((w1 >> 8) & 127), axis=1)
                s = jnp.where(lane1 < (w1 & 255), ar[0:1], ar[1:2])
                w0s.append(w0)
                datas.append(s)
            for g in range(V9_GROUP):
                w0 = w0s[g]
                mask = (lane1 >= ((w0 >> 8) & 127)) & (lane1 < (w0 & 255))
                pltpu.store(out_ref.at[pl.ds(w0 >> 16, 1), :],
                            datas[g], mask=mask)

        return 0

    return per_group


def _group_kernel_v11(lim_ref, gpos_hbm, gmeta_hbm, lpos_hbm, lmeta_hbm,
                      lit_hbm, init_ref, out_ref, *, seg_bytes: int):
    """One output segment, narrow pieces: literal pieces then match groups.

    Same interface as _group_kernel_v10; requires the host packer's
    row-boundary split ((dst&127)+len <= 128 for every piece).
    """
    del init_ref
    m_lo = lim_ref[0]
    m_hi = lim_ref[1]
    l_lo = lim_ref[3]
    l_hi = lim_ref[4]
    lit_base = lim_ref[5]
    ls_rows = _lit_scratch_rows(seg_bytes)
    stage_slots = V9_STAGE_ROWS * 128

    def body(gp_s, gm_s, lit_v, sems, sem):
        @pl.when(l_hi > l_lo)
        def _stage_lits():
            dd = pltpu.make_async_copy(
                lit_hbm.at[pl.ds(lit_base, ls_rows - 1)],
                lit_v.at[pl.ds(1, ls_rows - 1)], sem)
            dd.start()
            dd.wait()

        def walk(pos_hbm, meta_hbm, src_ref, lo, hi):
            """Double-buffered stage walk: the next stage's piece words DMA
            into the other SMEM buffer while this stage's groups run.  The
            HBM arrays carry one slack stage, so the one-past-the-end
            prefetch always stays in bounds."""
            n_stages = (hi - (lo & ~127) + stage_slots - 1) // stage_slots

            def dma(si, b):
                st = (lo >> 7) + si * V9_STAGE_ROWS
                c1 = pltpu.make_async_copy(
                    pos_hbm.at[pl.ds(st, V9_STAGE_ROWS), :],
                    gp_s.at[b], sems.at[b, 0])
                c2 = pltpu.make_async_copy(
                    meta_hbm.at[pl.ds(st, V9_STAGE_ROWS), :],
                    gm_s.at[b], sems.at[b, 1])
                return c1, c2

            @pl.when(n_stages > 0)
            def _prologue():
                c1, c2 = dma(0, 0)
                c1.start()
                c2.start()

            def per_stage(si, _):
                def run_buf(b):
                    c1, c2 = dma(si, b)
                    c1.wait()
                    c2.wait()
                    n1, n2 = dma(si + 1, 1 - b)
                    n1.start()
                    n2.start()
                    st = (lo >> 7) + si * V9_STAGE_ROWS
                    base = st * 128
                    grp = _narrow_groups(src_ref, gp_s.at[b], gm_s.at[b],
                                         out_ref, lo - base, hi - base)
                    jax.lax.fori_loop(0, stage_slots // V9_GROUP, grp, 0)

                @pl.when(si % 2 == 0)
                def _even():
                    run_buf(0)

                @pl.when(si % 2 == 1)
                def _odd():
                    run_buf(1)

                return 0

            jax.lax.fori_loop(0, n_stages, per_stage, 0)
            # Drain the one-past-the-end prefetch so the semaphores are
            # clean for the next walk.
            @pl.when(n_stages > 0)
            def _drain():
                def drain_buf(b):
                    c1, c2 = dma(n_stages, b)
                    c1.wait()
                    c2.wait()

                @pl.when(n_stages % 2 == 0)
                def _e():
                    drain_buf(0)

                @pl.when(n_stages % 2 == 1)
                def _o():
                    drain_buf(1)

        walk(lpos_hbm, lmeta_hbm, lit_v, l_lo, l_hi)
        walk(gpos_hbm, gmeta_hbm, out_ref, m_lo, m_hi)

    pl.run_scoped(
        body,
        gp_s=pltpu.SMEM((2, V9_STAGE_ROWS, 128), jnp.int32),
        gm_s=pltpu.SMEM((2, V9_STAGE_ROWS, 128), jnp.int32),
        lit_v=pltpu.VMEM((_lit_scratch_rows(seg_bytes), 128), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def resolve_groups_v11(out_init, lim, gpos, gmeta, lpos, lmeta, lit,
                       seg_bytes: int, interpret: bool = False):
    """Run one v11 (narrow-piece) segment resolve inside jit.  Same
    contract as resolve_groups_v10, plus the row-split invariant."""
    return pl.pallas_call(
        functools.partial(_group_kernel_v11, seg_bytes=seg_bytes),
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(lim, gpos, gmeta, lpos, lmeta, lit, out_init)


def resolve_groups_v10(out_init, lim, gpos, gmeta, lpos, lmeta, lit,
                       seg_bytes: int, interpret: bool = False):
    """Run one v10 segment resolve inside jit.

    out_init: (rows,128) int32 (pad row + window + body + slack, aliased).
    lim: (8,) int32.  gpos/gmeta, lpos/lmeta: (rows,128) int32, rows a
    multiple of V9_STAGE_ROWS plus one slack stage.  lit: (Lr,128) int32
    dense literal bytes, Lr >= lit_row_base + scratch rows for every
    segment.
    """
    return pl.pallas_call(
        functools.partial(_group_kernel_v10, seg_bytes=seg_bytes),
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(lim, gpos, gmeta, lpos, lmeta, lit, out_init)


def resolve_groups_v9(out_init, lim, gpos, gmeta, interpret: bool = False):
    """Run one v9 segment resolve inside jit.

    out_init: (rows,128) int32 (pad row + window + body + slack, aliased).
    lim: (8,) int32.  gpos/gmeta: (rows,128) int32, rows a multiple of
    V9_STAGE_ROWS plus one slack stage (DMA windows run past the live
    range).
    """
    return pl.pallas_call(
        _group_kernel_v9,
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(lim, gpos, gmeta, out_init)


def resolve_matches(out_init, match_pos, match_meta, interpret: bool = False):
    """Run the match kernel inside jit.

    out_init: (rows, 128) int32 with window prologue + scattered literals.
    match_pos/match_meta: (Mr, 128) int32, padding entries len=0.
    Returns the resolved (rows, 128) buffer.
    """
    return pl.pallas_call(
        _match_kernel,
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(match_pos, match_meta, out_init)


def resolve_tape_pallas(tape_np, counts_np, out_size: int,
                        interpret: bool = False) -> np.ndarray:
    """Host-orchestrated multi-launch resolve (chained 32 KiB tails).

    tape_np: (cells, slots) int32 packed tokens; counts_np: (cells,) int32.
    Returns (out_size,) uint8.  Streams with stored blocks use the XLA
    resolver instead (stored bytes are not in the tape).
    """
    cells, slots = tape_np.shape
    slots_p = _round_up(max(slots, 1), 128)
    if slots_p != slots:
        tape_np = np.pad(tape_np, ((0, 0), (0, slots_p - slots)),
                         constant_values=-1)
    lens = np.where(
        counts_np[:, None] > np.arange(slots_p)[None, :],
        np.where(tape_np >= TOK_MATCH_BIT, (tape_np >> 16) & 0x3FFF, 1),
        0,
    ).sum(axis=1)
    cum = np.concatenate([[0], np.cumsum(lens)])
    total = int(cum[-1])
    if total != out_size:
        raise ValueError(f"tape output {total} != expected {out_size}")

    launch = _launch_interpret if interpret else _launch_compiled
    outs = []
    tail = np.zeros((WINDOW_ROWS, 128), np.int32)
    c0 = 0
    while c0 < cells:
        hi = int(np.searchsorted(cum, cum[c0] + OUT_CAP, side="right")) - 1
        hi = min(max(hi, c0 + 1), c0 + CELL_CAP, cells)
        seg_out = int(cum[hi] - cum[c0])
        num_cells = hi - c0
        out_rows = WINDOW_ROWS + _round_up(seg_out + MAXLEN + 512, 128) // 128
        buf = np.asarray(
            launch(
                jnp.asarray(counts_np[c0:hi]),
                jnp.asarray(tape_np[c0:hi]),
                jnp.asarray(tail),
                num_cells=num_cells,
                slots=slots_p,
                out_rows=out_rows,
            )
        )
        flat = buf.reshape(-1)
        outs.append(flat[WINDOW : WINDOW + seg_out])
        full = np.concatenate([tail.reshape(-1), flat[WINDOW : WINDOW + seg_out]])
        tail = full[-WINDOW:].reshape(WINDOW_ROWS, 128).astype(np.int32)
        c0 = hi
    if outs:
        return np.concatenate(outs).astype(np.uint8)
    return np.zeros(0, np.uint8)


# ---------------------------------------------------------------------------
# v14: compaction-once + lean group walk.
#
# v13 measured 6.7 ms/stream on chip, almost all of it scalar-core time in
# the per-segment walk: every segment re-walked its cells, re-appended its
# matches to SMEM, and paid per-cell loop overhead twice.  v14 moves all
# of that OUT of the segment loop:
#
#   1. XLA glue (elementwise): globalize record values — match dst + cell
#      base, run lit index -> flat lit address; per-cell dense offsets
#      m_before/r_before from cumsums (chunk-row-aligned).
#   2. ONE compaction kernel pass: per cell, roll its <=slots records from
#      the cell-major tape rows to the known dense offset (no cursors, no
#      appends — offsets are precomputed, cells are independent).
#   3. XLA again: per-group-of-8 conservative clean bit (min dist >= group
#      output span) ORed into member metas — the walk never computes it.
#   4. Per segment: a double-buffered staged walk over the DENSE lists:
#      groups of 8 matches resolve with all-loads-then-all-stores when the
#      clean bit is set (the v12 fast shape), scalar fallback with RLE
#      doubling otherwise; literal runs commit from a per-segment VMEM
#      window of the lit tape.  No per-cell work at all.
# ---------------------------------------------------------------------------

#: Cells per compaction chunk.
V14_CHUNK = 512
#: Stage rows for the v14 walk (stage = V14_STAGE_ROWS * 128 records).
V14_STAGE_ROWS = 8
#: Group-clean flag = meta sign bit (bit 31); real metas keep len in
#: bits 16-24, so flagged metas are simply negative.
#: Walk lit VMEM window rows per segment (segment bytes / 128 + two
#: boundary cells' worth of slack; must match inflate_v3.SEG_BYTES).
V14_LIT_ROWS = (512 * 1024) // 128 + 260


def _compact_kernel_v14(ma_hbm, mb_hbm, ra_hbm, rb_hbm, lit_hbm, cnt_hbm,
                        moff_hbm, roff_hbm, loff_hbm,
                        i0_, i1_, i2_, i3_, i4_,
                        mdst_ref, mmeta_ref, rdst_ref, rmeta_ref, lit_ref,
                        *, slots: int):
    """Compact ALL per-cell record tapes into dense lists in ONE pass.

    ma/mb/ra/rb/lit_hbm: (CellsTot//cpr, 128) cell-major rows (values
    already globalized by XLA).  cnt_hbm: (CellsTot//128, 128) packed
    counts (mc<<16 | rc<<8 | lc).  moff/roff/loff_hbm: per-cell dense
    offsets.  Outputs are VMEM dense lists (aliased zero-init).
    """
    del i0_, i1_, i2_, i3_, i4_
    cpr = 128 // slots
    chunk = V14_CHUNK
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + lane2
    n_cells_pad = cnt_hbm.shape[0] * 128

    def body(ma_v, mb_v, ra_v, rb_v, lit_v, cnt_s, moff_s, roff_s, loff_s,
             sems):
        def per_chunk(ci, _):
            c0 = ci * chunk
            copies = []
            for i, (hbm, dst, rows) in enumerate((
                (ma_hbm, ma_v, cpr), (mb_hbm, mb_v, cpr),
                (ra_hbm, ra_v, cpr), (rb_hbm, rb_v, cpr),
                (lit_hbm, lit_v, cpr),
                (cnt_hbm, cnt_s, 128), (moff_hbm, moff_s, 128),
                (roff_hbm, roff_s, 128), (loff_hbm, loff_s, 128),
            )):
                copies.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(c0 // rows, chunk // rows), :], dst,
                    sems.at[i]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            def emit(src_v, dst_ref, cl, cnt, off):
                lane_base = (cl % cpr) * slots
                rp = off & 127
                mask = (flat2 >= rp) & (flat2 < rp + cnt)
                rowv = src_v[pl.ds(cl // cpr, 1), :]
                rolled = pltpu.roll(rowv, rp - lane_base, axis=1)
                vals = jnp.concatenate([rolled, rolled], axis=0)
                pltpu.store(dst_ref.at[pl.ds(off >> 7, 2), :], vals,
                            mask=mask)

            def per_cell(cl, _):
                cnt = cnt_s[cl >> 7, cl & 127]

                @pl.when(cnt > 0)
                def _():
                    mc = cnt >> 16
                    rc = (cnt >> 8) & 0xFF
                    lc = cnt & 0xFF

                    @pl.when(mc > 0)
                    def _m():
                        off = moff_s[cl >> 7, cl & 127]
                        emit(ma_v, mdst_ref, cl, mc, off)
                        emit(mb_v, mmeta_ref, cl, mc, off)

                    @pl.when(rc > 0)
                    def _r():
                        off = roff_s[cl >> 7, cl & 127]
                        emit(ra_v, rdst_ref, cl, rc, off)
                        emit(rb_v, rmeta_ref, cl, rc, off)

                    @pl.when(lc > 0)
                    def _l():
                        emit(lit_v, lit_ref, cl, lc,
                             loff_s[cl >> 7, cl & 127])

                return 0

            jax.lax.fori_loop(0, chunk, per_cell, 0)
            return 0

        jax.lax.fori_loop(0, n_cells_pad // chunk, per_chunk, 0)

    rows_c = V14_CHUNK // (128 // slots)
    pl.run_scoped(
        body,
        ma_v=pltpu.VMEM((rows_c, 128), jnp.int32),
        mb_v=pltpu.VMEM((rows_c, 128), jnp.int32),
        ra_v=pltpu.VMEM((rows_c, 128), jnp.int32),
        rb_v=pltpu.VMEM((rows_c, 128), jnp.int32),
        lit_v=pltpu.VMEM((rows_c, 128), jnp.int32),
        cnt_s=pltpu.SMEM((V14_CHUNK // 128, 128), jnp.int32),
        moff_s=pltpu.SMEM((V14_CHUNK // 128, 128), jnp.int32),
        roff_s=pltpu.SMEM((V14_CHUNK // 128, 128), jnp.int32),
        loff_s=pltpu.SMEM((V14_CHUNK // 128, 128), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((9,)),
    )


def compact_v14(ma2d, mb2d, ra2d, rb2d, lit2d, cnt2d, moff2d, roff2d,
                loff2d, nrows: int, nrows_lit: int, slots: int,
                interpret: bool = False):
    """Run the fused compaction pass -> five dense arrays."""
    z = jnp.zeros((nrows, 128), jnp.int32)
    zl = jnp.zeros((nrows_lit, 128), jnp.int32)
    return pl.pallas_call(
        functools.partial(_compact_kernel_v14, slots=slots),
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrows_lit, 128), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 9
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3, 13: 4},
        interpret=interpret,
    )(ma2d, mb2d, ra2d, rb2d, lit2d, cnt2d, moff2d, roff2d, loff2d,
      z, z, z, z, zl)


def _walk_kernel_v14(lim_ref, mdst_hbm, mmeta_hbm, rdst_hbm, rmeta_hbm,
                     lit_hbm, init_ref, out_ref, *, slots: int):
    """One segment: dense-list walk (runs then matches).

    lim_ref: (8,) SMEM = (m_lo, m_hi, r_lo, r_hi, seg_off, lit_row0,
    lit_rows, 0).  mdst/mmeta: dense match lists (global dst; meta =
    clean_bit | len<<16 | dist).  rdst/rmeta: dense run lists (global
    dst; meta = lit_flat<<7 | run_len).  lit_hbm: (CellsTot*slots/128,
    128) literal rows; rows [lit_row0, lit_row0+lit_rows) stage to VMEM.
    """
    del init_ref
    m_lo = lim_ref[0]
    m_hi = lim_ref[1]
    r_lo = lim_ref[2]
    r_hi = lim_ref[3]
    seg_off = lim_ref[4]
    lit_row0 = lim_ref[5]
    body_start = PAD + WINDOW
    body_end = (out_ref.shape[0] - 4) * 128
    base_adj = body_start - seg_off

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + lane2
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    stage_slots = V14_STAGE_ROWS * 128

    def body(lit_v, dst_s, meta_s, sems, litsem):
        nlit = lit_v.shape[0]
        dd = pltpu.make_async_copy(
            lit_hbm.at[pl.ds(lit_row0, nlit), :], lit_v, litsem)
        dd.start()
        dd.wait()

        def copy_clipped(src, dst, length):
            rp = dst & 127
            data = _load_span4(out_ref, src - rp)
            base_p = dst - rp
            mask = (flat4 >= rp) & (flat4 < rp + length)
            mask &= (flat4 + base_p >= body_start) & (flat4 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(dst >> 7, SPAN_ROWS), :], data,
                        mask=mask)

        def staged(pos_hbm, meta_hbm, lo, hi, grp):
            n_stages = (hi - (lo & ~127) + stage_slots - 1) // stage_slots

            def dma(si, b):
                st = (lo >> 7) + si * V14_STAGE_ROWS
                c1 = pltpu.make_async_copy(
                    pos_hbm.at[pl.ds(st, V14_STAGE_ROWS), :],
                    dst_s.at[b], sems.at[b, 0])
                c2 = pltpu.make_async_copy(
                    meta_hbm.at[pl.ds(st, V14_STAGE_ROWS), :],
                    meta_s.at[b], sems.at[b, 1])
                return c1, c2

            @pl.when(n_stages > 0)
            def _pro():
                c1, c2 = dma(0, 0)
                c1.start()
                c2.start()

            def per_stage(si, _):
                def run_buf(b):
                    c1, c2 = dma(si, b)
                    c1.wait()
                    c2.wait()
                    n1, n2 = dma(si + 1, 1 - b)
                    n1.start()
                    n2.start()
                    base = ((lo >> 7) + si * V14_STAGE_ROWS) * 128
                    jax.lax.fori_loop(
                        0, stage_slots // GROUP,
                        lambda gi, _: grp(b, gi, base, lo, hi), 0)

                @pl.when(si % 2 == 0)
                def _e():
                    run_buf(0)

                @pl.when(si % 2 == 1)
                def _o():
                    run_buf(1)

                return 0

            jax.lax.fori_loop(0, n_stages, per_stage, 0)

            @pl.when(n_stages > 0)
            def _drain():
                def drain_buf(b):
                    c1, c2 = dma(n_stages, b)
                    c1.wait()
                    c2.wait()

                @pl.when(n_stages % 2 == 0)
                def _de():
                    drain_buf(0)

                @pl.when(n_stages % 2 == 1)
                def _do():
                    drain_buf(1)

        # --- literal runs: order-free, no output reads ---
        def run_group(b, gi, base, lo, hi):
            i0 = gi * GROUP

            @pl.when((base + i0 + GROUP > lo) & (base + i0 < hi))
            def _():
                row = i0 >> 7
                l0 = i0 & 127

                def one(g, _):
                    live = (base + i0 + g >= lo) & (base + i0 + g < hi)
                    dst = jnp.where(live, dst_s[b, row, l0 + g], 0)
                    meta = jnp.where(live, meta_s[b, row, l0 + g], 0)
                    rl = meta & 0x7F
                    lf = (meta >> 7) - lit_row0 * 128

                    @pl.when(rl > 0)
                    def _c():
                        d = dst + base_adj
                        rp = d & 127
                        lr = lf & 127
                        # Dense-lit runs may cross a 128-lane row: 2-row
                        # aligned read, then place at the dst phase.
                        a = lit_v[pl.ds(lf >> 7, 2), :]
                        ar = pltpu.roll(a, -lr, axis=1)
                        lane1 = flat2[0:1]
                        sv = jnp.where(lane1 < 128 - lr, ar[0:1], ar[1:2])
                        rolled = pltpu.roll(sv, rp, axis=1)
                        vals = jnp.concatenate([rolled, rolled], axis=0)
                        base_p = d - rp
                        mask = (flat2 >= rp) & (flat2 < rp + rl)
                        mask &= (flat2 + base_p >= body_start) & \
                                (flat2 + base_p < body_end)
                        pltpu.store(out_ref.at[pl.ds(d >> 7, 2), :], vals,
                                    mask=mask)

                    return 0

                jax.lax.fori_loop(0, GROUP, one, 0)

            return 0

        staged(rdst_hbm, rmeta_hbm, r_lo, r_hi, run_group)

        # --- matches: stream order, clean groups fast-path ---
        def match_group(b, gi, base, lo, hi):
            i0 = gi * GROUP

            @pl.when((base + i0 + GROUP > lo) & (base + i0 < hi))
            def _():
                row = i0 >> 7
                l0 = i0 & 127
                m0 = meta_s[b, row, l0]

                @pl.when(m0 < 0)
                def _fast():
                    ds, lens, datas = [], [], []
                    for g in range(GROUP):
                        live = (base + i0 + g >= lo) & (base + i0 + g < hi)
                        dst = dst_s[b, row, l0 + g] + base_adj
                        meta = jnp.where(live, meta_s[b, row, l0 + g], 0)
                        ln = (meta >> 16) & 0x1FF
                        # head/tail clip keeps every access in-buffer.
                        delta = jnp.maximum(body_start - dst, 0)
                        d2 = jnp.minimum(dst + delta, body_end)
                        ln = jnp.where(dst < body_end,
                                       jnp.maximum(ln - delta, 0), 0)
                        src = d2 - (meta & 0xFFFF)
                        rp = d2 & 127
                        ds.append(d2)
                        lens.append(ln)
                        datas.append(_load_span4(out_ref, src - rp))
                    for g in range(GROUP):
                        rp = ds[g] & 127
                        base_p = ds[g] - rp
                        mask = (flat4 >= rp) & (flat4 < rp + lens[g])
                        mask &= (flat4 + base_p < body_end)
                        pltpu.store(
                            out_ref.at[pl.ds(ds[g] >> 7, SPAN_ROWS), :],
                            datas[g], mask=mask)

                @pl.when(m0 >= 0)
                def _slow():
                    def one(g, _):
                        live = (base + i0 + g >= lo) & (base + i0 + g < hi)
                        dst = dst_s[b, row, l0 + g] + base_adj
                        meta = jnp.where(live, meta_s[b, row, l0 + g], 0)
                        ln = (meta >> 16) & 0x1FF
                        dist = meta & 0xFFFF
                        delta = jnp.maximum(body_start - dst, 0)
                        d2 = jnp.minimum(dst + delta, body_end)
                        ln = jnp.where(dst < body_end,
                                       jnp.maximum(ln - delta, 0), 0)

                        @pl.when(ln > 0)
                        def _():
                            src = d2 - dist

                            @pl.when(dist >= ln)
                            def _plain():
                                copy_clipped(src, d2, ln)

                            @pl.when(dist < ln)
                            def _rle():
                                n0 = jnp.minimum(dist, ln)
                                copy_clipped(src, d2, n0)

                                def grow(r, avail):
                                    @pl.when(avail < ln)
                                    def _():
                                        n_new = jnp.minimum(avail, ln - avail)
                                        copy_clipped(d2, d2 + avail, n_new)
                                    return jnp.minimum(avail * 2, ln)

                                jax.lax.fori_loop(0, 9, grow, n0)

                        return 0

                    jax.lax.fori_loop(0, GROUP, one, 0)

            return 0

        staged(mdst_hbm, mmeta_hbm, m_lo, m_hi, match_group)

    pl.run_scoped(
        body,
        lit_v=pltpu.VMEM((V14_LIT_ROWS, 128), jnp.int32),
        dst_s=pltpu.SMEM((2, V14_STAGE_ROWS, 128), jnp.int32),
        meta_s=pltpu.SMEM((2, V14_STAGE_ROWS, 128), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        litsem=pltpu.SemaphoreType.DMA(()),
    )


def resolve_walk_v14(out_init, lims, mdst, mmeta, rdst, rmeta, lit2d,
                     slots: int, interpret: bool = False):
    """One v14 segment walk inside jit.  lims: (8,) int32."""
    return pl.pallas_call(
        functools.partial(_walk_kernel_v14, slots=slots),
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(lims, mdst, mmeta, rdst, rmeta, lit2d, out_init)
