"""Pallas LZ77 resolver: the TPU-native replacement for the reference's
byte-copy loop (reference inflate.c:1861-1897) and for XLA's serial
scatter/gather (~7.5 ns/element on v5e — measured).

Mosaic constraints shape the kernel (verified on-chip): VMEM vector
accesses must be 128-lane aligned, but dynamic *sublane* (row) indexing
and dynamic lane *rotation* (``pltpu.roll``) are supported.  So the output
lives as (rows, 128) int32 with one byte per element, and every
byte-granular span access is an aligned 4-row load/store plus a roll:

  span[i, j] = A[i + (j+r >= 128), (j+r) % 128]         (load, r = p & 127)
  A'[i, k]   = M[i - (k < r), (k-r) % 128]              (store-merge back)

One kernel walks the token tape sequentially (cells are already in stream
order) keeping the output cursor in SMEM scratch:

* a cell whose tokens are all literals commits them as one masked span
  store at the cursor (fast path);
* matches are span copies; overlapping copies (dist < len, the RLE case)
  grow the pattern by doubling — ≤9 rounds instead of a byte loop.

Cross-launch windows: the caller chains launches for outputs larger than
the VMEM budget, passing the previous launch's 32 KiB tail (the DEFLATE
window bound, RFC 1951 §3.2.5) as the prologue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 32768
WINDOW_ROWS = WINDOW // 128
MAXLEN = 258
SPAN_ROWS = 4  # rows loaded per span: covers r + 258 + slack
VAL_ROWS = 3  # rows of payload in a span (384 bytes ≥ 258 + 127)

#: Max output bytes per launch (int32-per-byte in VMEM).
OUT_CAP = 1536 * 1024
#: Max cells per launch (counts live in SMEM).
CELL_CAP = 8192

TOK_MATCH_BIT = 1 << 30

_IOTA_LANE3 = None  # built lazily inside kernels


def _span_flat_iota():
    i = jax.lax.broadcasted_iota(jnp.int32, (VAL_ROWS, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (VAL_ROWS, 128), 1)
    return i * 128 + j


def _load_span(out_ref, p):
    """(VAL_ROWS,128) int32 = output bytes [p, p+384)."""
    row = p >> 7
    r = p & 127
    a = out_ref[pl.ds(row, SPAN_ROWS), :]
    ar = pltpu.roll(a, -r, axis=1)
    nxt = jnp.concatenate([ar[1:], ar[:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    s = jnp.where(lane < 128 - r, ar, nxt)
    return s[:VAL_ROWS]


def _store_span(out_ref, p, vals, nvalid):
    """Write vals[f] for f < nvalid into output bytes [p, p+nvalid)."""
    row = p >> 7
    r = p & 127
    a = out_ref[pl.ds(row, SPAN_ROWS), :]
    # Current span view (same math as _load_span, all 4 rows).
    ar = pltpu.roll(a, -r, axis=1)
    nxt = jnp.concatenate([ar[1:], ar[:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    s = jnp.where(lane < 128 - r, ar, nxt)
    # Merge payload.
    flat = _span_flat_iota()
    merged3 = jnp.where(flat < nvalid, vals, s[:VAL_ROWS])
    m = jnp.concatenate([merged3, s[VAL_ROWS:]], axis=0)
    # Invert: A'[i,k] = M[i - (k<r), (k-r) % 128].
    mr = pltpu.roll(m, r, axis=1)
    mshift = jnp.concatenate([mr[-1:], mr[:-1]], axis=0)
    a2 = jnp.where(lane >= r, mr, mshift)
    out_ref[pl.ds(row, SPAN_ROWS), :] = a2


def _extract(row_vec, j):
    """Scalar element j of a (1,128) vector via one-hot reduce."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.sum(jnp.where(iota == j, row_vec, 0))


def _round_up(n, m):
    return -(-n // m) * m


def _load_span4(out_ref, q):
    """(SPAN_ROWS,128) int32 holding output bytes [q, q+512) flat-aligned.

    The trailing (q & 127) lanes of the last row wrap around to the first
    row — callers must only consume flat offsets f < 512 - (q & 127).
    """
    row = q >> 7
    r = q & 127
    a = out_ref[pl.ds(row, SPAN_ROWS), :]
    ar = pltpu.roll(a, -r, axis=1)
    nxt = jnp.concatenate([ar[1:], ar[:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    return jnp.where(lane < 128 - r, ar, nxt)


def _copy_span(out_ref, src, dst, length):
    """Copy output bytes [src, src+length) -> [dst, dst+length), length<=258.

    One aligned load + one masked store: loading at q0 = src - (dst & 127)
    yields a tile already on dst's row grid (byte (dst & ~127) + f sources
    from q0 + f), so no second alignment pass is needed.  Requires
    dst-region rows to exist (callers keep SPAN_ROWS of slack) and
    src >= dst-alignment (guaranteed by the buffer's front pad row).
    """
    rp = dst & 127
    q0 = src - rp
    data = _load_span4(out_ref, q0)
    flat = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    mask = (flat >= rp) & (flat < rp + length)
    pltpu.store(out_ref.at[pl.ds(dst >> 7, SPAN_ROWS), :], data, mask=mask)


#: Front pad bytes on every v2 kernel buffer (one full row).
PAD = 128

#: v4 kernel: matches processed per speculative group (loads issue before
#: stores -> no per-match read-after-write stall when the group is clean).
GROUP = 8
#: SMEM staging chunk: rows of 128 matches DMA'd HBM->SMEM at a time.
CHUNK_ROWS = 8


def _match_kernel_v4(nm_ref, pos_hbm, meta_hbm, init_ref, out_ref):
    """Grouped match walk with SMEM-staged metadata.

    pos_hbm/meta_hbm: (Mr, 128) int32 in HBM/ANY — match positions (offset
    by PAD+WINDOW; padding entries pos=PAD+WINDOW, meta=0) and packed
    len<<16|dist.  init_ref aliases out_ref.

    Per GROUP of 8 matches: read scalars from SMEM, issue all 8 aligned
    source loads (program order: loads precede stores, so Mosaic pipelines
    them), check pairwise that no source range intersects an earlier
    group member's destination range and no member self-overlaps
    (dist < len), then commit all 8 masked stores.  Dirty groups fall back
    to the strictly serial per-match path (correct for RLE overlap via
    pattern doubling).
    """
    del init_ref
    m_rows = pos_hbm.shape[0]
    n_matches = nm_ref[0]
    # Only walk chunks/groups that contain real matches (the static match
    # capacity is sized for the worst case and is mostly padding).
    n_chunks = jnp.minimum(
        (n_matches + CHUNK_ROWS * 128 - 1) // (CHUNK_ROWS * 128),
        -(-m_rows // CHUNK_ROWS),
    )

    def body(pos_s, meta_s, sem):
        def per_chunk(ci, _):
            r0 = ci * CHUNK_ROWS
            d1 = pltpu.make_async_copy(
                pos_hbm.at[pl.ds(r0, CHUNK_ROWS), :], pos_s, sem)
            d1.start()
            d1.wait()
            d2 = pltpu.make_async_copy(
                meta_hbm.at[pl.ds(r0, CHUNK_ROWS), :], meta_s, sem)
            d2.start()
            d2.wait()

            def serial_one(i, _):
                r, l = i >> 7, i & 127
                meta = meta_s[r, l]
                length = meta >> 16

                @pl.when(length > 0)
                def _():
                    cur = pos_s[r, l]
                    dist = meta & 0xFFFF
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

                return 0

            def per_group(gi, _):
                i0 = gi * GROUP
                metas = [meta_s[(i0 + g) >> 7, (i0 + g) & 127]
                         for g in range(GROUP)]
                poss = [pos_s[(i0 + g) >> 7, (i0 + g) & 127]
                        for g in range(GROUP)]
                lens = [m >> 16 for m in metas]
                dsts = poss
                srcs = [p - (m & 0xFFFF) for p, m in zip(poss, metas)]

                # Clean: every member plain (dist >= len, incl. len==0
                # padding: src == dst there, dist 0 >= 0) and no source
                # range touches an earlier member's destination range.
                clean = jnp.bool_(True)
                for g in range(GROUP):
                    clean &= (dsts[g] - srcs[g]) >= lens[g]
                    for i in range(g):
                        hit = (srcs[g] < dsts[i] + lens[i]) & \
                              (srcs[g] + lens[g] > dsts[i])
                        clean &= jnp.logical_not(hit & (lens[i] > 0)
                                                 & (lens[g] > 0))

                @pl.when(clean)
                def _fast():
                    datas = []
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        datas.append(_load_span4(out_ref, srcs[g] - rp))
                    flat = jax.lax.broadcasted_iota(
                        jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
                        jax.lax.broadcasted_iota(
                            jnp.int32, (SPAN_ROWS, 128), 1)
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        mask = (flat >= rp) & (flat < rp + lens[g])
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, SPAN_ROWS), :],
                            datas[g], mask=mask)

                @pl.when(jnp.logical_not(clean))
                def _slow():
                    jax.lax.fori_loop(i0, i0 + GROUP, serial_one, 0)

                return 0

            # Groups left in this chunk (last chunk is usually partial).
            remaining = n_matches - ci * CHUNK_ROWS * 128
            n_groups = jnp.clip(
                (remaining + GROUP - 1) // GROUP, 0, CHUNK_ROWS * 128 // GROUP
            )
            jax.lax.fori_loop(0, n_groups, per_group, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, per_chunk, 0)

    pl.run_scoped(
        body,
        pos_s=pltpu.SMEM((CHUNK_ROWS, 128), jnp.int32),
        meta_s=pltpu.SMEM((CHUNK_ROWS, 128), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def resolve_matches_v4(out_init, match_pos, match_meta, n_matches=None,
                       interpret: bool = False):
    """Run the v4 (grouped, SMEM-staged) match kernel inside jit.

    match_pos rows must be a multiple of CHUNK_ROWS; padding entries carry
    meta=0 and an in-bounds pos.  n_matches (traced scalar ok) bounds the
    walk; matches must be compacted to the front.  Defaults to capacity.
    """
    if n_matches is None:
        n_matches = match_pos.shape[0] * 128
    nm = jnp.asarray(n_matches, jnp.int32).reshape(1)
    return pl.pallas_call(
        _match_kernel_v4,
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
    )(nm, match_pos, match_meta, out_init)


# ---------------------------------------------------------------------------
# v6: full-tape Phase B — ONE kernel consumes the chase tape directly.
# Literal runs commit as rolled masked vector stores straight from the
# tape rows; matches are collected into an SMEM list and resolved in
# speculative groups (v4 style).  No per-slot XLA scatters remain: the
# only XLA prep is elementwise math + a cells-sized cumsum.
# Replaces the reference's per-symbol store / memcpy loop
# (inflate.c:1736-1747, :1861-1897) at VPU granularity.
# ---------------------------------------------------------------------------

#: SMEM match-list capacity per chunk; cells per chunk = CAP // slots so
#: the worst case (every slot a match) can never overflow the list.
V6_MLIST_CAP = 4096


def _tape_kernel_v6(lim_ref, tape_hbm, counts_hbm, cbase_hbm, init_ref,
                    out_ref, slots: int):
    """lim_ref: (3,) SMEM (cell_lo, cell_hi, seg_off); tape_hbm:
    (CellsTot//CPR, 128) int32 rows of CPR cells x slots lanes;
    counts_hbm/cbase_hbm: (CellsTot,) int32; init_ref aliases out_ref.

    body range (local coords): [PAD+WINDOW, rows*128 - 512 - ...) — passed
    implicitly: body_start = PAD + WINDOW, body_end = (rows-4)*128.
    """
    del init_ref
    cpr = 128 // slots  # cells per tape row
    # Chunks must cover whole 128-cell rows of counts/cbase (Mosaic tiling);
    # the SMEM match list is sized for the worst case (every slot a match).
    chunk_cells = max(128, V6_MLIST_CAP // slots)
    mlist_cap = chunk_cells * slots
    body_start = PAD + WINDOW
    body_end = (out_ref.shape[0] - 4) * 128
    cell_lo = lim_ref[0]
    cell_hi = lim_ref[1]
    seg_off = lim_ref[2]
    base_adj = body_start - seg_off

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + lane2
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)

    def body(tape_v, tape_s, counts_s, cbase_s, mpos_s, mmeta_s, sem):
        def copy_clipped(src, dst, length):
            """_copy_span with [body_start, body_end) store clipping."""
            rp = dst & 127
            data = _load_span4(out_ref, src - rp)
            base_p = dst - rp
            mask = (flat4 >= rp) & (flat4 < rp + length)
            mask &= (flat4 + base_p >= body_start) & (flat4 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(dst >> 7, SPAN_ROWS), :], data,
                        mask=mask)

        def flush_matches(k_total):
            """Group-resolve the first k_total entries of the SMEM list."""
            def per_group(gi, _):
                i0 = gi * GROUP
                live = [(i0 + g) < k_total for g in range(GROUP)]
                # Sanitize dead lanes: stale/uninitialized SMEM entries
                # must not drive loads at wild addresses.
                dsts = [jnp.where(lv, mpos_s[i0 + g], body_start)
                        for g, lv in enumerate(live)]
                metas = [jnp.where(lv, mmeta_s[i0 + g], 0)
                         for g, lv in enumerate(live)]
                lens = [m >> 16 for m in metas]
                srcs = [d - (m & 0xFFFF) for d, m in zip(dsts, metas)]

                clean = jnp.bool_(True)
                for g in range(GROUP):
                    clean &= (dsts[g] - srcs[g]) >= lens[g]
                    for i in range(g):
                        hit = (srcs[g] < dsts[i] + lens[i]) & \
                              (srcs[g] + lens[g] > dsts[i])
                        clean &= jnp.logical_not(
                            hit & (lens[i] > 0) & (lens[g] > 0))

                @pl.when(clean)
                def _fast():
                    datas = []
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        datas.append(_load_span4(out_ref, srcs[g] - rp))
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        base_p = dsts[g] - rp
                        mask = (flat4 >= rp) & (flat4 < rp + lens[g])
                        mask &= (flat4 + base_p >= body_start) & \
                                (flat4 + base_p < body_end)
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, SPAN_ROWS), :],
                            datas[g], mask=mask)

                @pl.when(jnp.logical_not(clean))
                def _slow():
                    def one(g, _):
                        dst, meta = mpos_s[i0 + g], mmeta_s[i0 + g]
                        length = jnp.where((i0 + g) < k_total, meta >> 16, 0)
                        dist = meta & 0xFFFF

                        @pl.when(length > 0)
                        def _():
                            src = dst - dist

                            @pl.when(dist >= length)
                            def _plain():
                                copy_clipped(src, dst, length)

                            @pl.when(dist < length)
                            def _rle():
                                n0 = jnp.minimum(dist, length)
                                copy_clipped(src, dst, n0)

                                def grow(r, avail):
                                    @pl.when(avail < length)
                                    def _():
                                        n_new = jnp.minimum(
                                            avail, length - avail)
                                        copy_clipped(dst, dst + avail, n_new)
                                    return jnp.minimum(avail * 2, length)

                                jax.lax.fori_loop(0, 9, grow, n0)

                        return 0

                    jax.lax.fori_loop(0, GROUP, one, 0)

                return 0

            jax.lax.fori_loop(0, (k_total + GROUP - 1) // GROUP, per_group, 0)

        def flush_run(cell_local, j0, run_dst, run_len):
            """Commit a literal run from the VMEM tape row."""
            rowv = tape_v[pl.ds(cell_local // cpr, 1), :]
            lane0 = (cell_local % cpr) * slots + j0
            rp = run_dst & 127
            rolled = pltpu.roll(rowv, rp - lane0, axis=1)
            vals = jnp.concatenate([rolled, rolled], axis=0) & 0x1FF
            base_p = run_dst - rp
            mask = (flat2 >= rp) & (flat2 < rp + run_len)
            mask &= (flat2 + base_p >= body_start) & \
                    (flat2 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(run_dst >> 7, 2), :], vals,
                        mask=mask)

        def per_chunk(ci, _):
            c0 = lo_al + ci * chunk_cells
            d1 = pltpu.make_async_copy(
                tape_hbm.at[pl.ds(c0 // cpr, chunk_cells // cpr), :],
                tape_v, sem)
            d1.start()
            d1.wait()
            d2 = pltpu.make_async_copy(
                tape_hbm.at[pl.ds(c0 // cpr, chunk_cells // cpr), :],
                tape_s, sem)
            d2.start()
            d2.wait()
            d3 = pltpu.make_async_copy(
                counts_hbm.at[pl.ds(c0 // 128, chunk_cells // 128), :],
                counts_s, sem)
            d3.start()
            d3.wait()
            d4 = pltpu.make_async_copy(
                cbase_hbm.at[pl.ds(c0 // 128, chunk_cells // 128), :],
                cbase_s, sem)
            d4.start()
            d4.wait()

            def per_cell(cl, k):
                c = c0 + cl
                inside = (c >= cell_lo) & (c < cell_hi)
                cnt = jnp.where(inside, counts_s[cl >> 7, cl & 127], 0)
                cur0 = cbase_s[cl >> 7, cl & 127] + base_adj

                def per_tok(j, carry):
                    cur, rj0, rdst, rlen, k = carry
                    tok = tape_s[(cl // cpr), (cl % cpr) * slots + j]
                    is_m = tok >= TOK_MATCH_BIT
                    mlen = (tok >> 16) & 0x3FFF

                    @pl.when(is_m & (rlen > 0))
                    def _():
                        flush_run(cl, rj0, rdst, rlen)

                    # Effective match after head-clip (keeps load bases
                    # positive for window-crossing sources).
                    delta = jnp.maximum(body_start - cur, 0)
                    eff_len = jnp.maximum(mlen - delta, 0)
                    keep = is_m & (eff_len > 0) & (cur < body_end) & \
                        (k < mlist_cap)

                    @pl.when(keep)
                    def _():
                        mpos_s[k] = cur + delta
                        mmeta_s[k] = (eff_len << 16) | (tok & 0xFFFF)

                    k = k + keep.astype(jnp.int32)
                    # literal bookkeeping
                    new_rj0 = jnp.where(is_m, 0, jnp.where(rlen > 0, rj0, j))
                    new_rdst = jnp.where(is_m, 0, jnp.where(rlen > 0, rdst, cur))
                    new_rlen = jnp.where(is_m, 0, rlen + 1)
                    cur = cur + jnp.where(is_m, mlen, 1)
                    return cur, new_rj0, new_rdst, new_rlen, k

                cur, rj0, rdst, rlen, k = jax.lax.fori_loop(
                    0, cnt, per_tok, (cur0, 0, 0, 0, k))

                @pl.when(rlen > 0)
                def _():
                    flush_run(cl, rj0, rdst, rlen)

                return k

            k = jax.lax.fori_loop(0, chunk_cells, per_cell, 0)
            flush_matches(k)
            return 0

        # Chunk starts must align to whole 128-cell rows of counts/cbase.
        lo_al = (cell_lo // 128) * 128
        n_chunks = (cell_hi - lo_al + chunk_cells - 1) // chunk_cells
        jax.lax.fori_loop(0, n_chunks, per_chunk, 0)

    pl.run_scoped(
        body,
        tape_v=pltpu.VMEM((chunk_cells // (128 // slots), 128), jnp.int32),
        tape_s=pltpu.SMEM((chunk_cells // (128 // slots), 128), jnp.int32),
        counts_s=pltpu.SMEM((chunk_cells // 128, 128), jnp.int32),
        cbase_s=pltpu.SMEM((chunk_cells // 128, 128), jnp.int32),
        mpos_s=pltpu.SMEM((mlist_cap,), jnp.int32),
        mmeta_s=pltpu.SMEM((mlist_cap,), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def resolve_tape_v6(out_init, tape2d, counts, cbase, cell_lo, cell_hi,
                    seg_off, slots: int, interpret: bool = False):
    """One v6 segment resolve inside jit.

    out_init: (rows,128) int32 — pad row + window + zero body (+ stored
    bytes pre-scattered) + 4 slack rows.  tape2d: (CellsTot//cpr, 128)
    int32.  counts/cbase: (CellsTot//128, 128) int32.  cell_lo/hi/seg_off:
    traced scalars.  slots must divide 128.
    """
    lim = jnp.stack([
        jnp.asarray(cell_lo, jnp.int32),
        jnp.asarray(cell_hi, jnp.int32),
        jnp.asarray(seg_off, jnp.int32),
    ])
    return pl.pallas_call(
        functools.partial(_tape_kernel_v6, slots=slots),
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(lim, tape2d, counts, cbase, out_init)




# ---------------------------------------------------------------------------
# v13: op-tape Phase B — consumes Phase A's per-cell MATCH and RUN tapes
# (one record per literal run / match) + dense per-cell literal rows,
# instead of walking every token.  The two record types live in separate
# tapes so both walk loops are BRANCHLESS; chunk DMAs issue in parallel.
# Group resolve is v6's speculative groups-of-8 with a cheap conservative
# clean test (min group dist >= group output span).
# ---------------------------------------------------------------------------

#: SMEM match-list capacity per chunk (chunk_cells = CAP // slots keeps
#: the worst case — every slot a match — from overflowing the list).
V13_MLIST_CAP = 8192


def _op_kernel_v13(lim_ref, ma_hbm, mb_hbm, ra_hbm, rb_hbm, lit_hbm,
                   cnt_hbm, cbase_hbm, init_ref, out_ref, *, slots: int):
    """lim_ref: (3,) SMEM (cell_lo, cell_hi, seg_off).

    ma/mb/ra/rb/lit_hbm: (CellsTot//cpr, 128) int32 cell-major rows
    (record j of cell c at [c//cpr, (c%cpr)*slots + j]): ma = within-cell
    dst offset, mb = len<<16|dist; ra = dst offset, rb = lit0<<16|run_len;
    lit = literal byte j.  cnt_hbm: (CellsTot//128, 128) int32 packed
    match_cnt<<16 | run_cnt<<8 | lit_cnt; cbase_hbm: (CellsTot//128, 128) int32 global
    output base per cell.  init_ref aliases out_ref.
    """
    del init_ref
    cpr = 128 // slots
    chunk_cells = max(128, V13_MLIST_CAP // slots)
    mlist_cap = chunk_cells * slots
    body_start = PAD + WINDOW
    body_end = (out_ref.shape[0] - 4) * 128
    cell_lo = lim_ref[0]
    cell_hi = lim_ref[1]
    seg_off = lim_ref[2]
    base_adj = body_start - seg_off

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + lane2
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)

    def body(lit_v, ma_s, mb_s, ra_s, rb_s, cnt_s, cbase_s,
             mpos_s, mmeta_s, sems):
        def copy_clipped(src, dst, length):
            rp = dst & 127
            data = _load_span4(out_ref, src - rp)
            base_p = dst - rp
            mask = (flat4 >= rp) & (flat4 < rp + length)
            mask &= (flat4 + base_p >= body_start) & (flat4 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(dst >> 7, SPAN_ROWS), :], data,
                        mask=mask)

        def flush_matches(k_total):
            """Group-resolve the first k_total entries of the SMEM list.

            Hazard policy: exact pairwise test for the full group of 8
            (all-loads-then-all-stores when hazard-free); otherwise two
            4-member halves run in order, each with its own exact test
            (cross-half dependencies are satisfied by half ordering);
            per-member sequential fallback (with RLE doubling) only for
            a dirty half.  Text streams chain matches heavily (~35% of
            consecutive 8-groups are hazard-free on gzipsample), so the
            half path carries most of the dirty work.
            """
            def per_group(gi, _):
                i0 = gi * GROUP
                live = [(i0 + g) < k_total for g in range(GROUP)]
                dsts = [jnp.where(lv, mpos_s[i0 + g], body_start)
                        for g, lv in enumerate(live)]
                # Dead lanes: len 0 (no constraints, empty stores).
                metas = [jnp.where(lv, mmeta_s[i0 + g], 0)
                         for g, lv in enumerate(live)]
                lens = [m >> 16 for m in metas]
                srcs = [d - (m & 0xFFFF) for d, m in zip(dsts, metas)]

                def pair_ok(g, i):
                    hit = (srcs[g] < dsts[i] + lens[i]) & \
                          (srcs[g] + lens[g] > dsts[i])
                    return jnp.logical_not(
                        hit & (lens[i] > 0) & (lens[g] > 0))

                half_clean = []
                for h in (0, 1):
                    hc = jnp.bool_(True)
                    for g in range(4 * h, 4 * h + 4):
                        hc &= (dsts[g] - srcs[g]) >= lens[g]
                        for i in range(4 * h, g):
                            hc &= pair_ok(g, i)
                    half_clean.append(hc)
                cross = jnp.bool_(True)
                for g in range(4, GROUP):
                    for i in range(4):
                        cross &= pair_ok(g, i)
                clean = half_clean[0] & half_clean[1] & cross

                def fast_span(lo_g, hi_g):
                    datas = []
                    for g in range(lo_g, hi_g):
                        rp = dsts[g] & 127
                        datas.append(_load_span4(out_ref, srcs[g] - rp))
                    for g in range(lo_g, hi_g):
                        rp = dsts[g] & 127
                        base_p = dsts[g] - rp
                        mask = (flat4 >= rp) & (flat4 < rp + lens[g])
                        mask &= (flat4 + base_p >= body_start) & \
                                (flat4 + base_p < body_end)
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, SPAN_ROWS), :],
                            datas[g - lo_g], mask=mask)

                def slow_range(lo_g, hi_g):
                    def one(g, _):
                        dst, meta = mpos_s[i0 + g], mmeta_s[i0 + g]
                        length = jnp.where((i0 + g) < k_total, meta >> 16, 0)
                        dist = meta & 0xFFFF

                        @pl.when(length > 0)
                        def _():
                            src = dst - dist

                            @pl.when(dist >= length)
                            def _plain():
                                copy_clipped(src, dst, length)

                            @pl.when(dist < length)
                            def _rle():
                                n0 = jnp.minimum(dist, length)
                                copy_clipped(src, dst, n0)

                                def grow(r, avail):
                                    @pl.when(avail < length)
                                    def _():
                                        n_new = jnp.minimum(
                                            avail, length - avail)
                                        copy_clipped(dst, dst + avail, n_new)
                                    return jnp.minimum(avail * 2, length)

                                jax.lax.fori_loop(0, 9, grow, n0)

                        return 0

                    jax.lax.fori_loop(lo_g, hi_g, one, 0)

                @pl.when(clean)
                def _fast():
                    fast_span(0, GROUP)

                @pl.when(jnp.logical_not(clean))
                def _by_half():
                    for h, hc in enumerate(half_clean):
                        @pl.when(hc)
                        def _h_fast(h=h):
                            fast_span(4 * h, 4 * h + 4)

                        @pl.when(jnp.logical_not(hc))
                        def _h_slow(h=h):
                            slow_range(4 * h, 4 * h + 4)

                return 0

            jax.lax.fori_loop(0, (k_total + GROUP - 1) // GROUP, per_group, 0)

        def flush_run(cell_local, lit0, run_dst, run_len):
            """Commit a literal run from the VMEM lit row (store masking
            clips to the segment body range)."""
            rowv = lit_v[pl.ds(cell_local // cpr, 1), :]
            lane0 = (cell_local % cpr) * slots + lit0
            rp = run_dst & 127
            rolled = pltpu.roll(rowv, rp - lane0, axis=1)
            vals = jnp.concatenate([rolled, rolled], axis=0)
            base_p = run_dst - rp
            mask = (flat2 >= rp) & (flat2 < rp + run_len)
            mask &= (flat2 + base_p >= body_start) & \
                    (flat2 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(run_dst >> 7, 2), :], vals,
                        mask=mask)

        def per_chunk(ci, _):
            c0 = lo_al + ci * chunk_cells
            copies = []
            for i, (hbm, dst_s, rows) in enumerate((
                (ma_hbm, ma_s, cpr), (mb_hbm, mb_s, cpr),
                (ra_hbm, ra_s, cpr), (rb_hbm, rb_s, cpr),
                (lit_hbm, lit_v, cpr),
                (cnt_hbm, cnt_s, 128), (cbase_hbm, cbase_s, 128),
            )):
                copies.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(c0 // rows, chunk_cells // rows), :],
                    dst_s, sems.at[i]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            # Pass 1 — literal runs (no output reads: order-free).
            def per_cell_runs(cl, _):
                c = c0 + cl
                inside = (c >= cell_lo) & (c < cell_hi)
                cnt = jnp.where(inside, cnt_s[cl >> 7, cl & 127], 0)
                cb = cbase_s[cl >> 7, cl & 127] + base_adj
                lane_base = (cl % cpr) * slots
                row = cl // cpr

                def per_run(j, _):
                    a = ra_s[row, lane_base + j]
                    b = rb_s[row, lane_base + j]
                    flush_run(cl, b >> 16, cb + a, b & 0xFFFF)
                    return 0

                jax.lax.fori_loop(0, (cnt >> 8) & 0xFF, per_run, 0)
                return 0

            jax.lax.fori_loop(0, chunk_cells, per_cell_runs, 0)

            # Pass 2 — matches, in stream order (branchless append).
            def per_cell_matches(cl, k):
                c = c0 + cl
                inside = (c >= cell_lo) & (c < cell_hi)
                cnt = jnp.where(inside, cnt_s[cl >> 7, cl & 127], 0)
                cb = cbase_s[cl >> 7, cl & 127] + base_adj
                lane_base = (cl % cpr) * slots
                row = cl // cpr

                def per_match(j, k):
                    dst = cb + ma_s[row, lane_base + j]
                    b = mb_s[row, lane_base + j]
                    # Head-clip (window-crossing replay at segment start).
                    delta = jnp.maximum(body_start - dst, 0)
                    eff = jnp.maximum((b >> 16) - delta, 0)
                    keep = (eff > 0) & (dst < body_end)
                    mpos_s[k] = dst + delta
                    mmeta_s[k] = (eff << 16) | (b & 0xFFFF)
                    return k + keep.astype(jnp.int32)

                return jax.lax.fori_loop(0, cnt >> 16, per_match, k)

            k = jax.lax.fori_loop(0, chunk_cells, per_cell_matches, 0)
            flush_matches(k)
            return 0

        lo_al = (cell_lo // 128) * 128
        n_chunks = (cell_hi - lo_al + chunk_cells - 1) // chunk_cells
        jax.lax.fori_loop(0, n_chunks, per_chunk, 0)

    rows_per_chunk = max(128, V13_MLIST_CAP // slots) // (128 // slots)
    cc = max(128, V13_MLIST_CAP // slots)
    pl.run_scoped(
        body,
        lit_v=pltpu.VMEM((rows_per_chunk, 128), jnp.int32),
        ma_s=pltpu.SMEM((rows_per_chunk, 128), jnp.int32),
        mb_s=pltpu.SMEM((rows_per_chunk, 128), jnp.int32),
        ra_s=pltpu.SMEM((rows_per_chunk, 128), jnp.int32),
        rb_s=pltpu.SMEM((rows_per_chunk, 128), jnp.int32),
        cnt_s=pltpu.SMEM((cc // 128, 128), jnp.int32),
        cbase_s=pltpu.SMEM((cc // 128, 128), jnp.int32),
        mpos_s=pltpu.SMEM((cc * slots,), jnp.int32),
        mmeta_s=pltpu.SMEM((cc * slots,), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((7,)),
    )


def resolve_ops_v13(out_init, ma2d, mb2d, ra2d, rb2d, lit2d, cnt2d, cbase2d,
                    cell_lo, cell_hi, seg_off, slots: int,
                    interpret: bool = False):
    """One v13 segment resolve inside jit (same contract as
    resolve_tape_v6 but split match/run tape inputs)."""
    lim = jnp.stack([
        jnp.asarray(cell_lo, jnp.int32),
        jnp.asarray(cell_hi, jnp.int32),
        jnp.asarray(seg_off, jnp.int32),
    ])
    return pl.pallas_call(
        functools.partial(_op_kernel_v13, slots=slots),
        out_shape=jax.ShapeDtypeStruct(out_init.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={8: 0},
        interpret=interpret,
    )(lim, ma2d, mb2d, ra2d, rb2d, lit2d, cnt2d, cbase2d, out_init)


