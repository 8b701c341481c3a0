"""Superseded inflate pipeline glue (v10 host-fed, v14) — quarantined.

docs/PERF_NOTES.md has the measurements; the flagship is
inflate_v3.flagship_body (v15).  v10 stays reachable via
parallel.merged.prepare_merged(host_fed=True); v14 exists for its
equivalence test only.  Everything imports from ops.inflate_v3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debigulator_tpu.ops.inflate_v3 import SEG_BYTES

def resolve_groups_segmented_v10(v9, n_seg: int,
                                 stored_pos, stored_val,
                                 interpret: bool = False,
                                 tail0=None, body_init=None,
                                 seg_bytes: int | None = None):
    """Phase B v10/v12: fully host-fed — matches come as conflict-free
    groups of 8 (native dbg_pack_groups) and literal runs as copy pieces
    over the dense host literal array, so the kernel needs no Phase A tape
    and the only XLA scatter left is the (tiny) stored-block byte
    placement.  Each segment is one Pallas kernel call inside a lax.scan
    carrying the 32 KiB window tail.

    tail0: optional (WINDOW//128, 128) int32 incoming window (sequence-
    parallel shards receive the previous shard's tail here; defaults to
    zeros).  body_init: optional (n_seg*SEG_BYTES,) int32 initial output
    (patch rounds replay tainted pieces over the phase-1 output)."""
    from debigulator_tpu.ops.archive import lz77_generations as lz

    if seg_bytes is None:
        seg_bytes = SEG_BYTES
    total = n_seg * seg_bytes
    if body_init is None:
        out_flat = jnp.zeros(total, jnp.int32)
    else:
        out_flat = body_init.reshape(total)
    if stored_val.shape[0]:
        out_flat = out_flat.at[stored_pos].set(
            stored_val.astype(jnp.int32), mode="drop"
        )
    body_seg = out_flat.reshape(n_seg, seg_bytes // 128, 128)

    win_rows = lz.WINDOW // 128
    pad = jnp.zeros((lz.PAD // 128, 128), jnp.int32)
    slack = jnp.zeros((4, 128), jnp.int32)

    def seg_step(tail, inp):
        seg_body, lim = inp
        init = jnp.concatenate([pad, tail, seg_body, slack], axis=0)
        out2d = lz.resolve_groups_v11(
            init, lim, v9["gpos"], v9["gmeta"], v9["lpos"], v9["lmeta"],
            v9["lit"], seg_bytes=seg_bytes, interpret=interpret,
        )
        body = out2d[lz.PAD // 128 + win_rows : -4]
        new_tail = out2d[-4 - win_rows : -4]
        return new_tail, body

    if tail0 is None:
        tail0 = jnp.zeros((win_rows, 128), jnp.int32)
    _, outs = jax.lax.scan(seg_step, tail0, (body_seg, v9["lims"]))
    return outs.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_seg", "interpret"),
)
def _inflate_v10_jit(v9, stored_pos, stored_val, n_seg, interpret=False):
    """Fused v10 pipeline: the host scan feeds match groups + dense
    literals straight into the group-driven Phase B — one device call,
    no Phase A and no token-granular XLA work at all."""
    return resolve_groups_segmented_v10(
        v9, n_seg, stored_pos, stored_val, interpret=interpret,
    )


def resolve_segmented_v14(ma, mb, ra, rb, lit, cnt, outlen, bob_cell,
                          n_seg: int, stored_pos, stored_val,
                          slots: int, interpret: bool = False):
    """Phase B v14: compaction-once + lean dense-list segment walks.

    See ops.lz77_pallas v14 block comment for the design.  All record
    globalization, dense offsets and per-group clean bits are vectorized
    XLA; the two Pallas kernels do only data movement + group resolve.
    """
    from debigulator_tpu.ops.archive import lz77_generations as lz

    cells_pad = ma.shape[1]
    # Static capacity guards: the literal-address packing (lit_flat << 7)
    # needs every dense index < 2^24, and the walk's per-segment lit VMEM
    # window must cover SEG_BYTES (lz.V14_LIT_ROWS is a hardcoded twin).
    from debigulator_tpu.ops.archive import lz77_generations as _lz

    assert cells_pad * slots < (1 << 24), \
        "v14 literal addressing overflows past 2^24 dense literals"
    assert _lz.V14_LIT_ROWS >= SEG_BYTES // 128 + 260, \
        "lz77_pallas.V14_LIT_ROWS out of sync with SEG_BYTES"
    mc = (cnt >> 16) & 0xFF
    rc = (cnt >> 8) & 0xFF
    lc = cnt & 0xFF

    cl = outlen.astype(jnp.int32)
    bob = jnp.pad(bob_cell.astype(jnp.int32),
                  (0, cells_pad - bob_cell.shape[0]))
    cum = jnp.cumsum(cl)
    cbase = bob + cum - cl
    cell_end = cbase + cl

    def excl_cumsum(x):
        c = jnp.cumsum(x)
        return c - x, c[-1]

    m_before, m_total = excl_cumsum(mc)
    r_before, r_total = excl_cumsum(rc)
    l_before, l_total = excl_cumsum(lc)

    # Globalize record values (elementwise over (slots, cells_pad)).
    ma_g = ma + cbase[None, :]
    ra_g = ra + cbase[None, :]
    rb_g = ((l_before[None, :] + (rb >> 16)) << 7) | (rb & 0x7F)

    def rows128(v):  # (cells_pad,) int32 -> (cells_pad/128, 128)
        return v.reshape(-1, 128)

    cnt2d = rows128(cnt.astype(jnp.int32))
    m_off2d = rows128(m_before)
    r_off2d = rows128(r_before)
    l_off2d = rows128(l_before)

    def rows_of(t):  # (slots, cells_pad) -> cell-major (rows, 128)
        return t.T.reshape(-1, 128)

    # Dense-list row capacity: worst case every slot a record, plus walk
    # stage slack (static shapes; actual extents are m/r/l_total).
    cap_rows = cells_pad * slots // 128
    pad_rows = 2 * lz.V14_STAGE_ROWS + 2

    mdst, mmeta, rdst, rmeta, litD = lz.compact_v14(
        rows_of(ma_g), rows_of(mb), rows_of(ra_g), rows_of(rb_g),
        rows_of(lit), cnt2d, m_off2d, r_off2d, l_off2d,
        cap_rows + pad_rows, cap_rows + lz.V14_LIT_ROWS + 2, slots,
        interpret=interpret)

    # Padding entries (meta 0) become len-0 records (no constraints).
    mmeta = jnp.where(mmeta == 0, 0xFFFF, mmeta)
    # Per-group clean bit — EXACT pairwise test, vectorized over groups
    # (28 interval checks in XLA cost nothing; a conservative span test
    # measured ~90% dirty on gzipsample and collapsed the walk onto the
    # scalar slow path): clean iff no member's source overlaps an earlier
    # member's destination range and no member self-overlaps (dist>=len).
    gd = mdst.reshape(-1, lz.GROUP)
    gm = mmeta.reshape(-1, lz.GROUP)
    glen = (gm >> 16) & 0x1FF
    gdist = gm & 0xFFFF
    gsrc = gd - gdist
    clean_b = jnp.all(gdist >= glen, axis=1)
    for g in range(1, lz.GROUP):
        for i in range(g):
            hit = (
                (gsrc[:, g] < gd[:, i] + glen[:, i])
                & (gsrc[:, g] + glen[:, g] > gd[:, i])
                & (glen[:, g] > 0) & (glen[:, i] > 0)
            )
            clean_b &= ~hit
    clean = jnp.where(clean_b, jnp.int32(-(1 << 31)), jnp.int32(0))
    gm = gm | clean[:, None]
    mmeta = gm.reshape(mdst.shape)

    # Per-segment record ranges from the cell ranges.
    offs = jnp.arange(n_seg, dtype=jnp.int32) * SEG_BYTES
    lo = jnp.searchsorted(cell_end, offs, side="right").astype(jnp.int32)
    hi = jnp.searchsorted(cbase, offs + SEG_BYTES, side="left").astype(jnp.int32)
    mb_pad = jnp.concatenate([m_before, m_total[None]])
    rb_pad = jnp.concatenate([r_before, r_total[None]])
    lb_pad = jnp.concatenate([l_before, l_total[None]])
    m_lo, m_hi = mb_pad[lo], mb_pad[hi]
    r_lo, r_hi = rb_pad[lo], rb_pad[hi]
    lit_row0 = lb_pad[lo] >> 7

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
        seg_body, lims = inp
        init = jnp.concatenate([pad, tail, seg_body, slack], axis=0)
        out2d = lz.resolve_walk_v14(
            init, lims, mdst, mmeta, rdst, rmeta, litD, slots,
            interpret=interpret,
        )
        body = out2d[lz.PAD // 128 + win_rows : -4]
        new_tail = out2d[-4 - win_rows : -4]
        return new_tail, body

    z = jnp.zeros(n_seg, jnp.int32)
    lims = jnp.stack([m_lo, m_hi, r_lo, r_hi, offs, lit_row0, z, z], axis=1)
    tail0 = jnp.zeros((win_rows, 128), jnp.int32)
    _, outs = jax.lax.scan(seg_step, tail0, (body_seg, lims))
    return outs.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("slots", "n_seg", "interpret"),
)
def _inflate_v14_jit(pa, arrays, slots, n_seg, interpret=False):
    """Flagship device-resident pipeline, v14 Phase B."""
    from debigulator_tpu.ops.phase_a_pallas import phase_a13_pallas

    ma, mb, ra, rb, lit, cnt, outlen = phase_a13_pallas(
        pa, slots, interpret=interpret
    )
    overflow = jnp.any(((cnt >> 16) > slots) | (((cnt >> 8) & 0xFF) > slots)
                       | ((cnt & 0xFF) > slots))
    body = resolve_segmented_v14(
        ma, mb, ra, rb, lit, cnt, outlen, pa["cellw"][4, :], n_seg,
        arrays["stored_pos"], arrays["stored_val"], slots,
        interpret=interpret,
    )
    return body, overflow
