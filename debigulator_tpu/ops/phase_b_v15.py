"""Phase B v15: dense record lists + frontier-batched hazard-free walk.

The v13 op-walk (ops.lz77_pallas._op_kernel_v13) spent its time in three
roughly equal parts (measured on v5e, K=29 gzipsample batch, BENCH r3
decomposition): per-cell match extraction/append (~46 ms), literal-run
flushes behind per-cell loops (~42 ms), and the group resolve with its
exact hazard tests + half-split serial fallback (~79 ms; only 34.9% of
consecutive groups-of-8 are hazard-free on text).  v15 removes all three:

1. **Compact kernel** (`_compact_kernel`): one vectorized pass turns the
   per-cell padded tapes from Phase A into dense, dst-sorted match and
   run lists in HBM.  Per 128-lane tape row: validity mask -> in-row
   ranks (log-roll prefix sum) -> source-lane-per-target via a one-hot
   f32 MXU matmul -> lane dynamic_gather -> rolled 2-row masked append
   at the running cursor.  Chunk regions are 128-row aligned; the ≤127
   padding records per chunk carry (last_dst, meta=0) so the dense dst
   array stays monotone (padding acts as len-0 no-ops downstream).

2. **Frontier-batched walk** (`_walk_kernel`): matches execute in
   *provably hazard-free batches* instead of hazard-checked groups.
   With matches dst-sorted and literals/stored bytes pre-placed, once
   every match before index p is resolved, all output bytes below
   F = dst[p] are resolved; every subsequent match g with
   req_g = src_g + len_g <= F reads only resolved data AND satisfies
   dist >= len (src+len <= F <= dst).  So a batch = the maximal prefix
   [p, q) with req <= F — its members need no hazard test, no ordering,
   and no RLE handling (measured on gzipsample: mean batch 5.8, 51% of
   matches in batches >= 8).  Violators start the next batch; a match
   whose own req exceeds its dst (dist < len, 1.1% on text) forms a
   singleton handled by the RLE-doubling serial path.  Batch discovery
   is vectorized (one compare + min-reduce over a 2-row window of the
   precomputed req vector).  Boundary matches (window replay at segment
   start, clipping at segment end) run in serial prologue/epilogue
   loops, keeping the hot loop clip-free.

Literal runs flush from a sliding VMEM window of the Phase A lit tape
(run records carry their global lit row; rows are visited monotonically).

Reference behavior being replaced: the serial symbol loop + overlap copy
of inflate.c:1697-1909 / :1861-1897.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 128
WINDOW = 32768
WIN_ROWS = WINDOW // 128
SPAN_ROWS = 4
GROUP = 8
BIG = 1 << 30
#: Interleaved chase lanes in the walk's batch-discovery loop.
NCH = 4

# Attribution-only skip flags (tools/trace_v15.py): never set in
# production — outputs are WRONG with any of these on.  Fail CLOSED: the
# flag only takes effect with the explicit acknowledgement variable also
# set (the trace tool sets it); a leftover DBG_V15_SKIP in a serving
# process raises here instead of silently corrupting every decode.
# Read once at import so a traced/jit-cached kernel can never disagree
# with the current environment.
import os as _os
import sys as _sys

_SKIP = _os.environ.get("DBG_V15_SKIP", "")
if _SKIP and _os.environ.get("DBG_V15_SKIP_ACK") != "unsafe":
    raise RuntimeError(
        "DBG_V15_SKIP is set but DBG_V15_SKIP_ACK=unsafe is not: these "
        "attribution-only flags make every v15 decode output WRONG and "
        "are refused outside the trace tool (tools/trace_v15.py)."
    )
if _SKIP:
    print(
        f"WARNING: phase_b_v15 imported with DBG_V15_SKIP={_SKIP!r} — "
        "kernel sections are DISABLED and all decode outputs are WRONG "
        "(trace-attribution mode).",
        file=_sys.stderr,
    )

#: Cells per compact-kernel chunk (input rows/chunk = CHUNK_CELLS*slots/128).
#: Matches phase_a_pallas.TC so cells_pad always divides evenly.
CHUNK_CELLS = 512
#: Walk: SMEM-resident match rows per sub-range (records = SUB_ROWS*128).
SUB_ROWS = 256
#: Walk: run rows per sub-range.
RUN_SUB_ROWS = 128
#: Walk: lit-tape sliding window rows (VMEM).  Sized so a full run
#: sub-range (RUN_SUB_ROWS*128 records over ~1.2 cells/record) fits one
#: window on text-like data — the flat no-window-check path.
LIT_WIN_ROWS = 4096


def _lsr14(meta):
    """Run-record lit row: bits 14..31, extracted LOGICALLY — the field
    uses the sign bit (lit tapes up to 2^18 rows), so an arithmetic
    shift would sign-extend large rows into garbage."""
    return jax.lax.shift_right_logical(meta, 14)


def _load_span4(out_ref, q):
    """(SPAN_ROWS,128) int32 of output bytes [q, q+512) flat-aligned.

    Trailing (q & 127) lanes of the last row wrap to the first row;
    callers only consume flat offsets f < 512 - (q & 127)."""
    row = q >> 7
    r = q & 127
    a = out_ref[pl.ds(row, SPAN_ROWS), :]
    ar = pltpu.roll(a, -r, axis=1)
    nxt = jnp.concatenate([ar[1:], ar[:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    return jnp.where(lane < 128 - r, ar, nxt)


# ---------------------------------------------------------------------------
# Compact kernel
# ---------------------------------------------------------------------------


def _compact_kernel(mbase_ref, rbase_ref, dm_ref, mm_ref, dr_ref, mr_ref,
                    idm_ref, imm_ref, idr_ref, imr_ref,
                    odm_ref, omm_ref, odr_ref, omr_ref,
                    bufs, lastd_ref, sems, *, in_rows: int, cap_rows: int):
    """Compact one chunk's match + run tapes into the dense lists.

    dm/mm (dr/mr): (in_rows,128) per-record dst / packed meta rows for
    matches (runs); meta == 0 marks padding slots.  odm/omm/odr/omr:
    full dense arrays in ANY memory, written only via DMA at the
    prefetched chunk row base.  Output DMAs are strictly serialized
    (chunk c+1's DMA starts only after chunk c's completed) because
    the fixed-size flush overruns into the next chunk's region.
    """
    del idm_ref, imm_ref, idr_ref, imr_ref
    ci = pl.program_id(0)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    flatC = jax.lax.broadcasted_iota(jnp.int32, (cap_rows, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (cap_rows, 128), 1)

    slot = ci % 2

    @pl.when(ci == 0)
    def _():
        lastd_ref[0] = 0
        lastd_ref[1] = 0

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def make_block(d_ref, m_ref, bd, bm, last_idx):
        def block_body(b, cur):
            """Compact 8 tape rows with phase-separated (pipelinable)
            work: ranks -> per-row lane binary search -> gathers -> 8
            independent rolled stores at precomputed cursors."""
            dv8 = d_ref[pl.ds(b * 8, 8), :]
            mv8 = m_ref[pl.ds(b * 8, 8), :]
            vm8 = mv8 != 0
            x = vm8.astype(jnp.int32)
            for k in range(7):
                sh = 1 << k
                x = x + jnp.where(lane8 >= sh, pltpu.roll(x, sh, axis=1), 0)
            # x = inclusive in-row prefix count; nv per row at lane 127.
            nv8 = jax.lax.slice(x, (0, 127), (8, 128))  # (8,1)
            # s(t) = first lane with x >= t+1 (x non-decreasing per row).
            tplus = lane8 + 1
            lo = jnp.zeros((8, 128), jnp.int32)
            for k in range(6, -1, -1):
                mid = lo + (1 << k)
                probe = jnp.take_along_axis(x, jnp.minimum(mid, 127), axis=1)
                lo = jnp.where(probe < tplus, jnp.minimum(mid, 127), lo)
            s = jnp.where(
                jnp.take_along_axis(x, lo, axis=1) < tplus,
                jnp.minimum(lo + 1, 127), lo)
            cd = jnp.take_along_axis(dv8, s, axis=1)
            cm = jnp.take_along_axis(mv8, s, axis=1)
            # Per-row fill value: running max of valid dsts (carried).
            rowmax = jnp.max(jnp.where(vm8, dv8, 0), axis=1, keepdims=True)
            rm = rowmax
            for k in range(3):
                sh = 1 << k
                shifted = pltpu.roll(rm, sh, axis=0)
                rm = jnp.maximum(
                    rm, jnp.where(jax.lax.broadcasted_iota(
                        jnp.int32, (8, 1), 0) >= sh, shifted, 0))
            runmax = jnp.maximum(rm, lastd_ref[last_idx])
            cd = jnp.where(lane8 < nv8, cd, runmax)
            cm = jnp.where(lane8 < nv8, cm, 0)
            lastd_ref[last_idx] = jnp.max(runmax)
            # 8 independent stores at scalar cursors.
            curs = []
            c = cur
            for r in range(8):
                curs.append(c)
                c = c + jnp.sum(jax.lax.slice(nv8, (r, 0), (r + 1, 1)))
            for r in range(8):
                rp = curs[r] & 127
                nv_r = curs[r + 1] - curs[r] if r < 7 else c - curs[r]
                rolled_d = pltpu.roll(
                    jax.lax.slice(cd, (r, 0), (r + 1, 128)), rp, axis=1)
                rolled_m = pltpu.roll(
                    jax.lax.slice(cm, (r, 0), (r + 1, 128)), rp, axis=1)
                mask = (flat2 >= rp) & (flat2 < rp + nv_r)
                pltpu.store(bufs.at[slot, bd, pl.ds(curs[r] >> 7, 2), :],
                            jnp.concatenate([rolled_d, rolled_d], axis=0),
                            mask=mask)
                pltpu.store(bufs.at[slot, bm, pl.ds(curs[r] >> 7, 2), :],
                            jnp.concatenate([rolled_m, rolled_m], axis=0),
                            mask=mask)
            return c

        return block_body

    def tail_fill(bd, bm, last_idx, cur):
        # Tail fill keeps the dense dst array monotone past the chunk.
        tmask = flatC >= cur
        pltpu.store(bufs.at[slot, bd, pl.ds(0, cap_rows), :],
                    jnp.full((cap_rows, 128), lastd_ref[last_idx], jnp.int32),
                    mask=tmask)
        pltpu.store(bufs.at[slot, bm, pl.ds(0, cap_rows), :],
                    jnp.zeros((cap_rows, 128), jnp.int32), mask=tmask)

    blk_m = make_block(dm_ref, mm_ref, 0, 1, 0)
    blk_r = make_block(dr_ref, mr_ref, 2, 3, 1)

    def blk_both(b, c):
        return (blk_m(b, c[0]), blk_r(b, c[1]))

    cur_m, cur_r = jax.lax.fori_loop(0, in_rows // 8, blk_both, (0, 0))
    tail_fill(0, 1, 0, cur_m)
    tail_fill(2, 3, 1, cur_r)

    # Serialize output DMAs: wait for the previous chunk's flush first.
    @pl.when(ci > 0)
    def _():
        prev = 1 - slot
        pb = mbase_ref[ci - 1]
        prb = rbase_ref[ci - 1]
        for j, (oref, b) in enumerate(((odm_ref, pb), (omm_ref, pb),
                                       (odr_ref, prb), (omr_ref, prb))):
            pltpu.make_async_copy(
                bufs.at[prev, j], oref.at[pl.ds(b, cap_rows), :],
                sems.at[prev, j]).wait()

    mb = mbase_ref[ci]
    rb = rbase_ref[ci]
    for j, (oref, b) in enumerate(((odm_ref, mb), (omm_ref, mb),
                                   (odr_ref, rb), (omr_ref, rb))):
        pltpu.make_async_copy(
            bufs.at[slot, j], oref.at[pl.ds(b, cap_rows), :],
            sems.at[slot, j]).start()

    @pl.when(ci == pl.num_programs(0) - 1)
    def _():
        for j, (oref, b) in enumerate(((odm_ref, mb), (omm_ref, mb),
                                       (odr_ref, rb), (omr_ref, rb))):
            pltpu.make_async_copy(
                bufs.at[slot, j], oref.at[pl.ds(b, cap_rows), :],
                sems.at[slot, j]).wait()


def compact_v15(dm, mm, dr, mr, mbase, rbase, dm_init, mm_init,
                dr_init, mr_init, slots: int, interpret: bool = False):
    """Run the compact kernel.  dm/mm/dr/mr: (tape_rows,128) cell-major
    record rows; mbase/rbase: (n_chunks,) int32 dense ROW bases (128-row
    aligned chunk regions); *_init: dense arrays pre-filled (dst=BIG,
    meta=0) that the kernel overwrites in [0, real_rows)."""
    tape_rows = dm.shape[0]
    in_rows = CHUNK_CELLS * slots // 128
    cap_rows = in_rows + 2
    n_chunks = tape_rows // in_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((in_rows, 128), lambda i, mb, rb: (i, 0)),
            pl.BlockSpec((in_rows, 128), lambda i, mb, rb: (i, 0)),
            pl.BlockSpec((in_rows, 128), lambda i, mb, rb: (i, 0)),
            pl.BlockSpec((in_rows, 128), lambda i, mb, rb: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 4, cap_rows, 128), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_compact_kernel, in_rows=in_rows,
                          cap_rows=cap_rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(dm_init.shape, jnp.int32)] * 4,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mbase, rbase, dm, mm, dr, mr, dm_init, mm_init, dr_init, mr_init)


# ---------------------------------------------------------------------------
# Walk kernel
# ---------------------------------------------------------------------------


def _walk_kernel_v16(lims_ref, mw0_hbm, mw1_hbm, rdst_hbm, rmeta_hbm,
                     lit_hbm, tail_hbm, init_hbm, out_hbm,
                     out_ref, w0_s, w1_s, sched_s, rd_s, rm_s, lit_v, sems,
                     *, seg_rows: int):
    """v16: ALL segments in ONE gridded pallas_call, segment resident in
    VMEM scratch.

    The v15 harness ran one pallas_call per segment inside a lax.scan,
    paying a per-call floor (~200 us: XLA concat of pad+tail+body+slack,
    dispatch, full-buffer VMEM in/out) 32 times per 16 MB batch — the
    "glue/scan ~13 ms" line in the round-4b decomposition.  Here the
    grid axis IS the segment loop (TPU grid steps run sequentially on
    the core, and scratch persists across steps):

    * `out_ref` (scratch, PAD+WINDOW+SEG+slack rows) holds the live
      segment; the 32 KiB window prologue for step s is COPIED from the
      scratch tail of step s-1 — the window never round-trips HBM;
    * the segment body init (zeros + scattered stored-block bytes)
      DMAs in from `init_hbm` (aliased with the output), and the
      finished body DMAs out to `out_hbm`; the writeback overlaps the
      next segment's run flushes (only waited two steps later).

    lims_ref: (n_seg, 8) scalar-prefetch = per-segment
    (m_lo, m_lo2, m_hi2, m_hi, r_lo, r_hi, seg_off, 0).
    Matches [m_lo, m_lo2) replay with head clipping (window-crossing),
    [m_lo2, m_hi2) run clip-free in scheduled batches, [m_hi2, m_hi)
    clip at the segment end.  Runs [r_lo, r_hi) flush from the lit
    window (store masks clip at both segment edges).

    mw0/mw1: per-record EXEC WORDS precomputed vectorized in the XLA
    glue (v15.2) so the hot group loop does almost no scalar address
    arithmetic:
      w0 = drow_rel << 16 | rp << 9 | len     (dst row/lane + length)
      w1 = size8 << 27 | (qrow_rel & 0x1FFF) << 7 | qr
    where rows are relative to the record's OWNING segment (the one
    containing its dst, always [0, seg_rows)), rp = dst & 127, and
    q = src - rp is the span-load base (qrow_rel signed: down to
    -WINDOW/128 - 1 for window-replay sources).  The walk adds one
    static row base; prologue records (owned by the PREVIOUS segment)
    get a -seg_rows adjust in the serial path.

    The batch schedule is built by a scalar-only DISCOVERY pass (the
    frontier rule needs one compare per record and two scalar loads —
    no vector<->scalar round trips), emitting packed sub-batch words
    (start | size<<24, or start | 1<<31 for RLE singletons) to SMEM.
    EXECUTION is then a flat fori over sub-batches whose loads/stores
    pipeline freely — measured 4.6 ns/slot vs ~470 ns/batch for the
    interleaved discover-and-execute while-loop (two vector<->scalar
    syncs per batch); the sched word for sub-batch e+1 is prefetched as
    a loop carry so its SMEM-load -> address chain overlaps sub-batch
    e's vector work.
    """
    s = pl.program_id(0)
    pad_rows = PAD // 128
    body_row0 = pad_rows + WIN_ROWS
    body_start = PAD + WINDOW
    body_end = body_start + seg_rows * 128

    @pl.when(s == 0)
    def _():
        out_ref[pl.ds(0, body_row0), :] = jnp.zeros(
            (body_row0, 128), jnp.int32)
        out_ref[pl.ds(body_row0 + seg_rows, 4), :] = jnp.zeros(
            (4, 128), jnp.int32)
        # Stream-head window prologue (all-zeros for a stream head; the
        # sp layer passes the ring-neighbor tail here).
        pltpu.make_async_copy(
            tail_hbm, out_ref.at[pl.ds(pad_rows, WIN_ROWS)],
            sems.at[8]).start()
        pltpu.make_async_copy(
            tail_hbm, out_ref.at[pl.ds(pad_rows, WIN_ROWS)],
            sems.at[8]).wait()

    @pl.when(s > 0)
    def _():
        # Window prologue = previous segment's scratch tail (never
        # round-trips HBM).  Reads the body region the s-1 writeback is
        # also reading — safe; the body overwrite below waits first.
        out_ref[pl.ds(pad_rows, WIN_ROWS), :] = out_ref[
            pl.ds(body_row0 + seg_rows - WIN_ROWS, WIN_ROWS), :]
        pltpu.make_async_copy(
            out_ref.at[pl.ds(body_row0, seg_rows)],
            out_hbm.at[pl.ds((s - 1) * seg_rows, seg_rows), :],
            sems.at[7]).wait()

    pltpu.make_async_copy(
        init_hbm.at[pl.ds(s * seg_rows, seg_rows), :],
        out_ref.at[pl.ds(body_row0, seg_rows)], sems.at[8]).start()
    pltpu.make_async_copy(
        init_hbm.at[pl.ds(s * seg_rows, seg_rows), :],
        out_ref.at[pl.ds(body_row0, seg_rows)], sems.at[8]).wait()

    m_lo = lims_ref[s, 0]
    m_lo2 = lims_ref[s, 1]
    m_hi2 = lims_ref[s, 2]
    m_hi = lims_ref[s, 3]
    r_lo = lims_ref[s, 4]
    r_hi = lims_ref[s, 5]
    seg_off = lims_ref[s, 6]
    base_adj = body_start - seg_off
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, 128), 1)
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

    SCHED_CAP = SUB_ROWS * 128 + 8
    # Per-chase-lane sched region: batch words grow up from 0, RLE flag
    # words grow down from the top; worst case k + nf = records + 2
    # scratch slots = SUB_ROWS*128/NCH + 2 <= REGCAP.
    REGCAP = SCHED_CAP // NCH

    ROWB = body_start // 128

    def body(w0_s, w1_s, sched_s, rd_s, rm_s, lit_v, sems):
        def copy_clipped(src, dst, length):
            rp = dst & 127
            data = _load_span4(out_ref, src - rp)
            base_p = dst - rp
            mask = (flat4 >= rp) & (flat4 < rp + length)
            mask &= (flat4 + base_p >= body_start) & \
                    (flat4 + base_p < body_end)
            pltpu.store(out_ref.at[pl.ds(dst >> 7, SPAN_ROWS), :], data,
                        mask=mask)

        def serial_one(j, adj=0):
            """Fully guarded single match (prologue/epilogue/RLE).

            Recovers (dst, len, dist) from the packed exec words; adj is
            -seg_rows*128 for prologue records (owned by the PREVIOUS
            segment, see the kernel docstring)."""
            w0 = w0_s[j >> 7, j & 127]
            w1 = w1_s[j >> 7, j & 127]
            rp = (w0 >> 9) & 0x7F
            d_rel = ((w0 >> 16) << 7) | rp
            q_rel = (((w1 << 12) >> 19) << 7) | (w1 & 0x7F)
            d = d_rel + body_start + adj
            length = w0 & 0x1FF
            dist = d_rel - q_rel - rp
            delta = jnp.maximum(body_start - d, 0)
            eff = jnp.maximum(length - delta, 0)
            dd = d + delta

            @pl.when((eff > 0) & (dd < body_end))
            def _():
                n0 = jnp.minimum(dist, eff)
                copy_clipped(dd - dist, dd, n0)

                @pl.when(dist < eff)
                def _rle():
                    def grow(k, avail):
                        @pl.when(avail < eff)
                        def _():
                            n_new = jnp.minimum(avail, eff - avail)
                            copy_clipped(dd, dd + avail, n_new)
                        return jnp.minimum(avail * 2, eff)
                    jax.lax.fori_loop(0, 9, grow, n0)

        # ---------------- literal runs ----------------
        def run_subrange(rj):
            """Stage RUN_SUB_ROWS rows from rj's row; flush runs with a
            sliding lit window (lit rows are monotone in record order)."""
            r0 = rj // 128
            rbase0 = r0 * 128
            rsub_end = jnp.minimum(r_hi, rbase0 + RUN_SUB_ROWS * 128)
            nrb = ((rsub_end - rbase0 + 127) // 128 + 7) // 8

            def rdma(b, _):
                pltpu.make_async_copy(
                    rdst_hbm.at[pl.ds(r0 + b * 8, 8), :],
                    rd_s.at[pl.ds(b * 8, 8), :], sems.at[4]).start()
                pltpu.make_async_copy(
                    rmeta_hbm.at[pl.ds(r0 + b * 8, 8), :],
                    rm_s.at[pl.ds(b * 8, 8), :], sems.at[5]).start()
                return 0

            def rdma_w(b, _):
                pltpu.make_async_copy(
                    rdst_hbm.at[pl.ds(r0 + b * 8, 8), :],
                    rd_s.at[pl.ds(b * 8, 8), :], sems.at[4]).wait()
                pltpu.make_async_copy(
                    rmeta_hbm.at[pl.ds(r0 + b * 8, 8), :],
                    rm_s.at[pl.ds(b * 8, 8), :], sems.at[5]).wait()
                return 0

            jax.lax.fori_loop(0, nrb, rdma, 0)
            jax.lax.fori_loop(0, nrb, rdma_w, 0)

            def flush_run(jl, win0, live=True):
                meta = rm_s[jl >> 7, jl & 127]
                litrow = jnp.maximum(_lsr14(meta), win0)
                d = rd_s[jl >> 7, jl & 127] + base_adj
                lane0 = (meta >> 7) & 0x7F
                # live/padding fold into the store mask (rl = 0).
                rl = jnp.where(live & (meta != 0), meta & 0x7F, 0)
                rowv = lit_v[pl.ds(litrow - win0, 1), :]
                rp = d & 127
                rolled = pltpu.roll(rowv, rp - lane0, axis=1)
                vals = jnp.concatenate([rolled, rolled], axis=0)
                base_p = d - rp
                mask = (flat2 >= rp) & (flat2 < rp + rl)
                mask &= (flat2 + base_p >= body_start) & \
                        (flat2 + base_p < body_end)
                pltpu.store(out_ref.at[pl.ds(d >> 7, 2), :], vals,
                            mask=mask)

            # Fast path: the whole sub-range's lit rows fit one window
            # (lit rows are monotone in record order) -> ONE window DMA +
            # a flat, pipelined fori over the runs.
            jl_first = rj - rbase0
            # Last REAL record (skip chunk-tail padding, meta==0, whose
            # litrow field is 0 and would understate the window span).
            jl_last = jax.lax.while_loop(
                lambda j: (j > jl_first) & (rm_s[j >> 7, j & 127] == 0),
                lambda j: j - 1, rsub_end - 1 - rbase0)
            w_first = _lsr14(rm_s[jl_first >> 7, jl_first & 127])
            w_last = _lsr14(rm_s[jl_last >> 7, jl_last & 127])
            fits = (w_last - w_first) < LIT_WIN_ROWS

            @pl.when(fits)
            def _flat():
                pltpu.make_async_copy(
                    lit_hbm.at[pl.ds(w_first, LIT_WIN_ROWS), :], lit_v,
                    sems.at[6]).start()
                pltpu.make_async_copy(
                    lit_hbm.at[pl.ds(w_first, LIT_WIN_ROWS), :], lit_v,
                    sems.at[6]).wait()

                # 8 unrolled independent flushes per iteration pipeline
                # the per-run roll/store latency (runs have no ordering
                # constraints at all).
                def fr8(g, _):
                    j0 = rj + g * 8
                    for t in range(8):
                        j = jnp.minimum(j0 + t, rsub_end - 1)
                        flush_run(j - rbase0, w_first,
                                  live=(j0 + t) < rsub_end)
                    return 0

                jax.lax.fori_loop(0, (rsub_end - rj + 7) // 8, fr8, 0)

            @pl.when(jnp.logical_not(fits))
            def _sliding():
                def win_loop(j):
                    """Window at run j's row; flush while runs stay in."""
                    jl0 = j - rbase0
                    win0 = _lsr14(rm_s[jl0 >> 7, jl0 & 127])
                    pltpu.make_async_copy(
                        lit_hbm.at[pl.ds(win0, LIT_WIN_ROWS), :], lit_v,
                        sems.at[6]).start()
                    pltpu.make_async_copy(
                        lit_hbm.at[pl.ds(win0, LIT_WIN_ROWS), :], lit_v,
                        sems.at[6]).wait()

                    def run_cond(c):
                        jj, go = c
                        return (jj < rsub_end) & go

                    def run_one(c):
                        jj, _ = c
                        jl = jj - rbase0
                        meta = rm_s[jl >> 7, jl & 127]
                        inwin = _lsr14(meta) < win0 + LIT_WIN_ROWS

                        @pl.when(inwin)
                        def _():
                            flush_run(jl, win0)

                        return (jnp.where(inwin, jj + 1, jj), inwin)

                    j_end, _ = jax.lax.while_loop(run_cond, run_one,
                                                  (j, True))
                    return j_end

                jax.lax.while_loop(lambda j: j < rsub_end, win_loop, rj)

            return rsub_end

        if "runs" not in _SKIP:
            jax.lax.while_loop(lambda s: s < r_hi, run_subrange, r_lo)

        # ---------------- matches ----------------
        def match_subrange(sub0):
            """Load up to SUB_ROWS rows starting at record sub0 (row-
            aligned), walk them; returns the next unprocessed record."""
            r0 = sub0 // 128
            base0 = r0 * 128
            sub_end = jnp.minimum(m_hi, base0 + SUB_ROWS * 128)
            n_rows = (sub_end - base0 + 127) // 128
            nblk = (n_rows + 7) // 8

            def dma(b, _):
                for i, (h, d) in enumerate(((mw0_hbm, w0_s),
                                            (mw1_hbm, w1_s))):
                    pltpu.make_async_copy(
                        h.at[pl.ds(r0 + b * 8, 8), :],
                        d.at[pl.ds(b * 8, 8), :], sems.at[i]).start()
                return 0

            def dma_w(b, _):
                for i, (h, d) in enumerate(((mw0_hbm, w0_s),
                                            (mw1_hbm, w1_s))):
                    pltpu.make_async_copy(
                        h.at[pl.ds(r0 + b * 8, 8), :],
                        d.at[pl.ds(b * 8, 8), :], sems.at[i]).wait()
                return 0

            jax.lax.fori_loop(0, nblk, dma, 0)
            jax.lax.fori_loop(0, nblk, dma_w, 0)

            # prologue: replays with head clipping (records owned by the
            # previous segment -> row fields need the -seg_rows adjust)
            def pro(j, _):
                serial_one(j - base0, adj=-seg_rows * 128)
                return 0

            if "serial" not in _SKIP:
                jax.lax.fori_loop(jnp.maximum(m_lo, base0),
                                  jnp.minimum(m_lo2, sub_end), pro, 0)

            # -------- batch chase (v15.1) --------
            # Batch sizes were precomputed VECTORIZED in the XLA glue
            # (meta bits 25..28: the maximal hazard-free batch length
            # under the frontier rule, valid for ANY start position),
            # so discovery collapses to one scalar hop per BATCH: read
            # the size at the cursor, clip at the range end, emit the
            # packed sched word (start | size<<24), hop.  Size 0 marks
            # dist < len (RLE) records -> flag side list at the TOP of
            # each region growing downward, executed in order between
            # batch runs (k + nf <= records + 1 <= REGCAP).
            #
            # The hop is a loop-carried SMEM-load -> address chain
            # (~60 ns/batch measured 1-way), so NCH independent chases
            # over NCH contiguous quarters of the range run interleaved
            # in one while loop — their latency chains overlap.  Each
            # region gets its own sched_s area; regions execute in
            # order, which preserves the global record order.  A
            # finished (dead) lane keeps storing scratch words at its
            # final cursors — positions the exec pass never reads.
            main_lo = jnp.maximum(m_lo2, base0) - base0
            main_end = jnp.minimum(m_hi2, sub_end) - base0
            span = main_end - main_lo
            q = (span + NCH - 1) // NCH
            r_los = [jnp.minimum(main_lo + i * q, main_end)
                     for i in range(NCH)]
            r_his = [jnp.minimum(main_lo + (i + 1) * q, main_end)
                     for i in range(NCH)]

            def chase(c):
                out = []
                for i in range(NCH):
                    s, k, nf = c[3 * i], c[3 * i + 1], c[3 * i + 2]
                    hi = r_his[i]
                    live = s < hi
                    jl = jnp.minimum(s, jnp.maximum(hi - 1, 0))
                    sz = jnp.minimum((w1_s[jl >> 7, jl & 127] >> 27) & 0xF,
                                     hi - s)
                    sched_s[i * REGCAP + REGCAP - 1 - nf] = (k << 15) | jl
                    nf = nf + (live & (sz == 0)).astype(jnp.int32)
                    sched_s[i * REGCAP + k] = jl | (jnp.maximum(sz, 0)
                                                    << 24)
                    k = k + (sz > 0).astype(jnp.int32)
                    out += [s + jnp.maximum(sz, 1), k, nf]
                return tuple(out)

            def any_live(c):
                live = c[0] < r_his[0]
                for i in range(1, NCH):
                    live = live | (c[3 * i] < r_his[i])
                return live

            init = []
            for i in range(NCH):
                init += [r_los[i], jnp.int32(0), jnp.int32(0)]
            if "chase" in _SKIP:
                fin = tuple(init)
            else:
                fin = jax.lax.while_loop(any_live, chase, tuple(init))

            # -------- execution: branch-free group runs between the
            # (rare) flagged boundaries, region by region --------
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

            def group(rb):
                def body(e, wcur):
                    # Sched word prefetched as the loop carry: the SMEM
                    # load -> start -> 16 word-load address chain for
                    # sub-batch e+1 overlaps sub-batch e's vector work
                    # (the chain was ~80 ns/group of the measured
                    # sched-indirection cost).
                    w = wcur
                    start = w & 0x7FFF
                    size = w >> 24
                    datas, drows, rps, lens = [], [], [], []
                    for t in range(GROUP):
                        j = start + t
                        live = t < size
                        w0 = w0_s[j >> 7, j & 127]
                        w1 = w1_s[j >> 7, j & 127]
                        # Dead slots (t >= size) read a FUTURE record's
                        # words: rows are clamped to a safe base and the
                        # zero length makes the store mask empty.
                        lens.append(jnp.where(live, w0 & 0x1FF, 0))
                        rps.append((w0 >> 9) & 0x7F)
                        drows.append(jnp.where(live, (w0 >> 16) + ROWB,
                                               ROWB))
                        qrow = jnp.where(live, ((w1 << 12) >> 19) + ROWB,
                                         ROWB)
                        qr = w1 & 0x7F
                        # Batched matches are NARROW (rp + len + qr <=
                        # 256): the whole span lives in TWO rows.
                        if "xload" in _SKIP:  # attribution only
                            a = lit_v[pl.ds(0, 2), :]
                        else:
                            a = out_ref[pl.ds(qrow, 2), :]
                        ar = pltpu.roll(a, -qr, axis=1)
                        nxt = pltpu.roll(ar, 1, axis=0)
                        datas.append(jnp.where(lane2 < 128 - qr, ar, nxt))
                    for t in range(GROUP):
                        mask = (flat2 - rps[t]).astype(jnp.uint32) < \
                            lens[t].astype(jnp.uint32)
                        if "xstore" in _SKIP:  # attribution only
                            pltpu.store(lit_v.at[pl.ds(2, 2), :],
                                        datas[t], mask=mask)
                        else:
                            pltpu.store(
                                out_ref.at[pl.ds(drows[t], 2), :],
                                datas[t], mask=mask)
                    return sched_s[rb + e + 1]
                return body

            if "exec" not in _SKIP and "chase" not in _SKIP:
                for i in range(NCH):
                    rb = i * REGCAP
                    k_i, nf_i = fin[3 * i + 1], fin[3 * i + 2]
                    grp = group(rb)

                    def grp_range(lo, hi, rb=rb, grp=grp):
                        # Initial carry = first sched word (a garbage
                        # read when lo == hi — never executed).
                        jax.lax.fori_loop(lo, hi, grp, sched_s[rb + lo])

                    def per_flag(fi, prev_e, rb=rb, grp_range=grp_range):
                        wj = sched_s[rb + REGCAP - 1 - fi]
                        ke = wj >> 15
                        grp_range(prev_e, ke)
                        serial_one(wj & 0x7FFF)
                        return ke

                    prev_e = jax.lax.fori_loop(0, nf_i, per_flag, 0)
                    grp_range(prev_e, k_i)

            # epilogue: tail-clip matches in this sub-range
            def epi(j, _):
                serial_one(j - base0)
                return 0

            if "serial" not in _SKIP:
                jax.lax.fori_loop(jnp.maximum(m_hi2, base0),
                                  jnp.minimum(m_hi, sub_end), epi, 0)
            return sub_end

        def m_cond(sm):
            return sm < m_hi

        if "match" not in _SKIP:
            jax.lax.while_loop(m_cond, match_subrange, m_lo)

    body(w0_s, w1_s, sched_s, rd_s, rm_s, lit_v, sems)

    # Async body writeback; the next step only waits for it right before
    # overwriting the body (after its window tail copy).
    pltpu.make_async_copy(
        out_ref.at[pl.ds(body_row0, seg_rows)],
        out_hbm.at[pl.ds(s * seg_rows, seg_rows), :],
        sems.at[7]).start()

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        pltpu.make_async_copy(
            out_ref.at[pl.ds(body_row0, seg_rows)],
            out_hbm.at[pl.ds(s * seg_rows, seg_rows), :],
            sems.at[7]).wait()


def walk_all_v16(init, lims, mw0, mw1, rdst, rmeta, lit2d,
                 seg_rows: int, tail0=None, interpret: bool = False):
    """All segments' walks as ONE gridded pallas_call (init, shape
    (n_seg*seg_rows, 128), aliases the output; segments run sequentially
    on the core with the 32 KiB window carried in VMEM scratch).
    tail0: optional (WIN_ROWS, 128) int32 window prologue for the FIRST
    segment (zeros = stream head; the sp layer passes the ring tail)."""
    n_seg = lims.shape[0]
    if tail0 is None:
        tail0 = jnp.zeros((WIN_ROWS, 128), jnp.int32)
    scr_rows = PAD // 128 + WIN_ROWS + seg_rows + 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((scr_rows, 128), jnp.int32),
            pltpu.SMEM((SUB_ROWS, 128), jnp.int32),
            pltpu.SMEM((SUB_ROWS, 128), jnp.int32),
            pltpu.SMEM((SUB_ROWS * 128 + 8,), jnp.int32),
            pltpu.SMEM((RUN_SUB_ROWS, 128), jnp.int32),
            pltpu.SMEM((RUN_SUB_ROWS, 128), jnp.int32),
            pltpu.VMEM((LIT_WIN_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_walk_kernel_v16, seg_rows=seg_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(init.shape, jnp.int32),
        input_output_aliases={7: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lims, mw0, mw1, rdst, rmeta, lit2d, tail0, init)


# ---------------------------------------------------------------------------
# XLA glue + driver
# ---------------------------------------------------------------------------


def _round_up(n, m):
    return -(-n // m) * m


def resolve_segmented_v15(ma, mb, ra, rb, lit, cnt, outlen, bob_cell,
                          n_seg: int, stored_pos, stored_val,
                          slots: int, seg_bytes: int,
                          interpret: bool = False, tail0=None):
    """Phase B v15 driver (same contract as resolve_ops_segmented_v13).

    ma/mb/ra/rb/lit: (slots, cells_pad) Phase A tapes; cnt packs
    match_cnt<<16 | run_cnt<<8 | lit_cnt; outlen: per-cell output bytes;
    bob_cell: stored-bytes offset per cell.
    """
    cells_pad = ma.shape[1]
    cpr = 128 // slots
    assert cells_pad % CHUNK_CELLS == 0
    # Run meta packs the lit row in bits 14..31 (logical extraction):
    # one merged call is bounded at 2^18 lit-tape rows — batch drivers
    # must chunk above that (decode_png_corpus_device does).  Real
    # errors (not asserts): python -O must not turn field overflow into
    # silent output corruption.
    if cells_pad * slots // 128 > (1 << 18):
        raise ValueError(
            f"lit tape {cells_pad * slots // 128} rows exceeds the "
            "run-meta field (2^18); split the batch")
    n_chunks = cells_pad // CHUNK_CELLS
    in_rows = CHUNK_CELLS * slots // 128
    cap_rows = in_rows + 2

    mc = (cnt >> 16) & 0xFF
    rc = (cnt >> 8) & 0xFF
    cl = outlen.astype(jnp.int32)
    bob = jnp.pad(bob_cell.astype(jnp.int32),
                  (0, cells_pad - bob_cell.shape[0]))
    cum = jnp.cumsum(cl)
    cbase = bob + cum - cl

    # Per-record elementwise prep over (slots, cells_pad): broadcasts only.
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (slots, cells_pad), 0)
    vm = slot_iota < mc[None, :]
    vr = slot_iota < rc[None, :]
    dstm = jnp.where(vm, ma + cbase[None, :], 0)
    metam = jnp.where(vm, mb, 0)
    dstr = jnp.where(vr, ra + cbase[None, :], 0)
    # Run meta: global lit tape row << 14 | lane0 << 7 | run_len.
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (slots, cells_pad), 1)
    litrow = cell_iota // cpr
    lane0 = (cell_iota % cpr) * slots + (rb >> 16)
    metar = jnp.where(vr, (litrow << 14) | (lane0 << 7) | (rb & 0xFFFF), 0)

    from debigulator_tpu.utils.profiling import named_scope

    def rows_of(t):  # (slots, cells_pad) -> cell-major (tape_rows, 128)
        return t.T.reshape(-1, 128)

    with named_scope("v15_prep"):
        dm, mm = rows_of(dstm), rows_of(metam)
        dr, mr = rows_of(dstr), rows_of(metar)
        lit2d = jnp.pad(rows_of(lit), ((0, LIT_WIN_ROWS + 8), (0, 0)))

    # Chunk row bases (128-row-aligned dense regions).
    mrows_c = -(-mc.reshape(n_chunks, CHUNK_CELLS).sum(axis=1) // 128)
    rrows_c = -(-rc.reshape(n_chunks, CHUNK_CELLS).sum(axis=1) // 128)
    mbase = (jnp.cumsum(mrows_c) - mrows_c).astype(jnp.int32)
    rbase = (jnp.cumsum(rrows_c) - rrows_c).astype(jnp.int32)

    dense_rows = cells_pad * slots // 128 + cap_rows + SUB_ROWS + 16
    dm_init = jnp.full((dense_rows, 128), BIG, jnp.int32)
    z_init = jnp.zeros((dense_rows, 128), jnp.int32)
    with named_scope("v15_compact"):
        mdst, mmeta, rdst, rmeta = compact_v15(
            dm, mm, dr, mr, mbase, rbase, dm_init, z_init, dm_init, z_init,
            slots, interpret=interpret)

    # Per-segment record ranges over the dense (monotone) dst arrays.
    mflat = mdst.reshape(-1)
    mmetaf = mmeta.reshape(-1)
    mlen = mmetaf >> 16
    rflat = rdst.reshape(-1)

    # v15.1/v15.2: precompute batch sizes AND per-record exec words,
    # both fully vectorized.  size8[s] = maximal t <= GROUP with
    # req_j <= dst_s for all j in [s, s+t) — the frontier rule, valid
    # for ANY chase start because dst is monotone and all records < s
    # are resolved when s's batch runs; size8[s] == 0 <=> dist < len
    # (RLE singleton).  The exec words move ALL per-slot address
    # arithmetic out of the walk's hot loop:
    #   w0 = drow_rel << 16 | rp << 9 | len
    #   w1 = size8 << 27 | (qrow_rel & 0x1FFF) << 7 | qr
    # with rows relative to the record's OWNING segment (dst //
    # seg_bytes) and q = src - rp the span-load byte base (qrow_rel
    # signed, >= -WINDOW/128 - 1 for window-replay sources).
    if seg_bytes // 128 > 4096:
        raise ValueError(
            f"seg_bytes {seg_bytes} gives seg_rows > 4096: the 13-bit "
            "qrow exec-word field would overflow")
    with named_scope("v15_size8"):
        req = mflat - (mmetaf & 0xFFFF) + mlen
        rp = mflat & 127
        # Batches admit only NARROW matches: their load/store spans fit
        # TWO 128-lane rows, halving the exec loop's VMEM row traffic
        # (the measured bound).  The 2-row LOAD starts qr lanes before
        # the data, so the full condition is rp + len + qr <= 256
        # (>99.9% of text matches).  Wide matches get size8 == 0 like
        # RLE singletons and run through the general 4-row serial path
        # in order.
        qr_ = (mflat - (mmetaf & 0xFFFF) - rp) & 127
        narrow = (rp + (mlen & 0x1FF) + qr_) <= 2 * 128
        reqp = jnp.concatenate(
            [req, jnp.full((GROUP,), BIG, jnp.int32)])
        nrwp = jnp.concatenate(
            [narrow, jnp.ones((GROUP,), jnp.bool_)])
        n_rec = req.shape[0]
        acc = jnp.ones((n_rec,), jnp.bool_)
        size8 = jnp.zeros((n_rec,), jnp.int32)
        for t in range(GROUP):
            acc = acc & (jax.lax.slice(reqp, (t,), (t + n_rec,)) <= mflat) \
                & jax.lax.slice(nrwp, (t,), (t + n_rec,))
            size8 = size8 + acc
        d_rel = mflat - jnp.clip(mflat // seg_bytes, 0, n_seg - 1) \
            * seg_bytes
        w0 = ((((d_rel >> 7) & 0xFFFF) << 16) | (rp << 9)
              | (mlen & 0x1FF))
        qv = d_rel - (mmetaf & 0xFFFF) - rp
        w1 = ((size8 << 27) | (((qv >> 7) & 0x1FFF) << 7)
              | (qv & 0x7F))
        mw0 = w0.reshape(mmeta.shape)
        mw1 = w1.reshape(mmeta.shape)
    offs = jnp.arange(n_seg, dtype=jnp.int32) * seg_bytes
    ends = offs + seg_bytes
    m_lo = jnp.searchsorted(mflat + mlen, offs, side="right").astype(jnp.int32)
    m_lo2 = jnp.searchsorted(mflat, offs, side="left").astype(jnp.int32)
    m_hi2 = jnp.searchsorted(mflat + 258, ends, side="left").astype(jnp.int32)
    m_hi = jnp.searchsorted(mflat, ends, side="left").astype(jnp.int32)
    r_lo = jnp.searchsorted(rflat + 128, offs, side="right").astype(jnp.int32)
    r_hi = jnp.searchsorted(rflat, ends, side="left").astype(jnp.int32)
    z = jnp.zeros(n_seg, jnp.int32)
    lims = jnp.stack([m_lo, m_lo2, m_hi2, m_hi, r_lo, r_hi, offs, z], axis=1)

    total = n_seg * seg_bytes
    out_flat = jnp.zeros(total, jnp.int32)
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos].set(
            stored_val.astype(jnp.int32), mode="drop")

    with named_scope("v15_walk"):
        out2d = walk_all_v16(
            out_flat.reshape(-1, 128), lims, mw0, mw1, rdst, rmeta, lit2d,
            seg_rows=seg_bytes // 128, tail0=tail0, interpret=interpret)
    return out2d.reshape(-1)


# ---------------------------------------------------------------------------
# Host-record planner (the sequence-parallel layer's entry)
# ---------------------------------------------------------------------------


def _size8_np(mflat, mmetaf, seg_bytes, n_seg):
    """NumPy twin of the v15_size8 XLA block: per-record exec words
    (w0, w1) + the packed-batch sizes, from HOST dense record lists."""
    mflat = mflat.astype(np.int64)
    mlen = (mmetaf.astype(np.int64) >> 16) & 0xFFFF
    dist = mmetaf.astype(np.int64) & 0xFFFF
    req = mflat - dist + mlen
    rp = mflat & 127
    qr_ = (mflat - dist - rp) & 127
    narrow = (rp + (mlen & 0x1FF) + qr_) <= 2 * 128
    n_rec = len(mflat)
    reqp = np.concatenate([req, np.full(GROUP, BIG, np.int64)])
    nrwp = np.concatenate([narrow, np.ones(GROUP, bool)])
    acc = np.ones(n_rec, bool)
    size8 = np.zeros(n_rec, np.int64)
    for t in range(GROUP):
        acc = acc & (reqp[t : t + n_rec] <= mflat) & nrwp[t : t + n_rec]
        size8 = size8 + acc
    d_rel = mflat - np.clip(mflat // seg_bytes, 0, n_seg - 1) * seg_bytes
    w0 = (((d_rel >> 7) & 0xFFFF) << 16) | (rp << 9) | (mlen & 0x1FF)
    qv = d_rel - dist - rp
    w1 = (size8 << 27) | (((qv >> 7) & 0x1FFF) << 7) | (qv & 0x7F)
    return w0.astype(np.int32), w1.astype(np.int32)


def _pad_rows_np(a: np.ndarray, fill) -> np.ndarray:
    """Flat record array -> (rows, 128) with DMA slack for the walk's
    SUB_ROWS windows (mirrors the dense_rows padding of the XLA glue)."""
    n = len(a)
    rows = -(-max(n, 1) // 128) + SUB_ROWS + 16
    out = np.full(rows * 128, fill, np.int32)
    out[:n] = a
    return out.reshape(rows, 128)


def plan_records_v15(m_pos, m_meta, r_pos, r_lit0, r_len, lit,
                     n_seg: int, seg_bytes: int,
                     stored_pos=None, stored_val=None) -> dict:
    """Host plan: dst-sorted record lists -> the walk's staged arrays.

    m_pos/m_meta: matches (pos ascending, meta = len<<16|dist);
    r_pos/r_lit0/r_len: literal runs (run_len <= 127, pos ascending,
    lit offsets ascending); lit: dense literal bytes (uint8).  Runs are
    split here at 128-byte lit-row boundaries (the flush kernel reads
    one lit row per run).  Returns numpy arrays for run_records_v15.
    """
    if seg_bytes // 128 > 4096:
        raise ValueError("seg_bytes gives seg_rows > 4096 (qrow field)")
    m_pos = np.asarray(m_pos, np.int64)
    m_meta = np.asarray(m_meta, np.int64)
    mlen = (m_meta >> 16) & 0xFFFF
    w0, w1 = _size8_np(m_pos, m_meta, seg_bytes, n_seg)

    # Split runs at lit-row boundaries so every run reads ONE lit row.
    r_pos = np.asarray(r_pos, np.int64)
    r_lit0 = np.asarray(r_lit0, np.int64)
    r_len = np.asarray(r_len, np.int64)
    len_a = np.minimum(r_len, 128 - (r_lit0 & 127))
    len_b = r_len - len_a
    p2 = np.stack([r_pos, r_pos + len_a], 1).reshape(-1)
    l2 = np.stack([r_lit0, r_lit0 + len_a], 1).reshape(-1)
    n2 = np.stack([len_a, len_b], 1).reshape(-1)
    keep = n2 > 0
    p2, l2, n2 = p2[keep], l2[keep], n2[keep]
    rmeta = ((l2 >> 7) << 14) | ((l2 & 127) << 7) | n2

    offs = np.arange(n_seg, dtype=np.int64) * seg_bytes
    ends = offs + seg_bytes
    lims = np.zeros((n_seg, 8), np.int32)
    lims[:, 0] = np.searchsorted(m_pos + mlen, offs, side="right")
    lims[:, 1] = np.searchsorted(m_pos, offs, side="left")
    lims[:, 2] = np.searchsorted(m_pos + 258, ends, side="left")
    lims[:, 3] = np.searchsorted(m_pos, ends, side="left")
    lims[:, 4] = np.searchsorted(p2 + 128, offs, side="right")
    lims[:, 5] = np.searchsorted(p2, ends, side="left")
    lims[:, 6] = offs

    lit = np.asarray(lit)
    lr = -(-max(len(lit), 1) // 128) + LIT_WIN_ROWS + 8
    lit32 = np.zeros(lr * 128, np.int32)
    lit32[: len(lit)] = lit
    init = np.zeros(n_seg * seg_bytes, np.int32)
    if stored_val is not None and len(stored_val):
        init[np.asarray(stored_pos)] = np.asarray(stored_val)
    return {
        "lims": lims,
        "mw0": _pad_rows_np(w0, 0),
        "mw1": _pad_rows_np(w1, 0),
        "rdst": _pad_rows_np(p2, 0),
        "rmeta": _pad_rows_np(rmeta, 0),
        "lit2d": lit32.reshape(lr, 128),
        "init": init.reshape(-1, 128),
    }


def run_records_v15(arrs: dict, seg_bytes: int, tail0=None, body_init=None,
                    interpret: bool = False):
    """Run the v16 walk on a plan_records_v15 plan (traceable: arrays may
    be jnp, e.g. inside shard_map).  body_init overrides the stored-byte
    init (patch rounds replay over the previous output)."""
    init = arrs["init"] if body_init is None else body_init.reshape(-1, 128)
    out2d = walk_all_v16(
        jnp.asarray(init), jnp.asarray(arrs["lims"]), jnp.asarray(arrs["mw0"]),
        jnp.asarray(arrs["mw1"]), jnp.asarray(arrs["rdst"]),
        jnp.asarray(arrs["rmeta"]), jnp.asarray(arrs["lit2d"]),
        seg_rows=seg_bytes // 128, tail0=tail0, interpret=interpret)
    return out2d.reshape(-1)
