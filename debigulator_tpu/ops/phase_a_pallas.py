"""Phase A as ONE fused Pallas kernel: decode graph + cell chase in VMEM.

The XLA Phase A (ops.inflate_v3.build_graph_v3 + chase_cells) is correct
but HBM-bound: every per-position intermediate (32-bit windows, 15-length
canonical probe, one-hot symbol matmuls, the 128-state transition tables)
round-trips through HBM, and the chase re-reads the full NXT/META tables
on every while-loop step (~260 MB/step at 16 Mbit).  Measured on v5e:
91 ms graph + 68 ms chase for a 16-stream merged batch.

This kernel keeps the whole thing in VMEM per tile of TC cells:

* layout: **cells on lanes, bit positions on sublanes (64)** — all
  per-cell quantities are (1, TC) lane vectors that broadcast across the
  position axis for free;
* the 32-bit window at every position comes from three per-cell words
  (cell bits + 32-bit lookahead), shifted by the sublane index;
* canonical decode = the same 15-length branch-free probe as XLA
  (reference inflate.c:565-706 semantics), with per-cell count/first/base
  selected from a PAGE-block table page by ONE small f32 matmul;
* the canonical-offset -> packed-symbol lookup is an int8 MXU matmul
  against 7-bit planes of the table page (plane-major rows), followed by
  a vectorized block-select (mask + 3 static slices + sublane reduce) —
  no unrolled per-position/per-block select trees;
* the chase walks each cell's token chain with a `fori_loop` over the 64
  bit positions, reading the per-position transition rows from VMEM
  scratch with dynamic sublane indexing.  Positions advance strictly
  monotonically (every code consumes >= 1 bit), so the single sweep
  visits every chain step in order; exact scanner entries mean states
  never leave the cell.

The v1 kernel unrolled both the 64-step chase and a per-group/per-block
select tree into straight-line code; Mosaic compile time exceeded 20
minutes for a 16-stream batch.  This version compiles in seconds.

Block tables are paged: page p covers blocks [PAGE_STRIDE*p,
PAGE_STRIDE*p + PAGE); a tile picks its page via scalar prefetch.  Tiles
whose cells span more than one page window (pathological block-dense
streams) fall back to the XLA path, as does speculative mode.

Token tape packing and META kind codes match ops.inflate_v3 exactly, so
Phase B (ops.lz77_pallas) consumes the result unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from debigulator_tpu import constants as C
from debigulator_tpu.ops.inflate_v3 import (
    CELL_BITS,
    K_DIST,
    K_LIT,
    K_NONE,
    META_KIND_SHIFT,
    TOK_MATCH_BIT,
)

#: Cells per tile (a multiple of the 128-lane vector width; bigger tiles
#: amortize the ~2.6 us/step grid+DMA overhead measured on v5e).
TC = 512
#: Blocks per table page / page stride in blocks.
PAGE = 8
PAGE_STRIDE = 4
#: 7-bit int8 planes per packed aug value (litlen 15 bits, dist 19 bits).
N_PLANES = 3
#: Inactive chase lane sentinel (any position >= CELL_BITS).
INACTIVE = 127
#: Position rows per symbol-lookup MXU call.
GSZ = 8


def _rev15(x):
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x5555)) << 1) | ((x & jnp.uint32(0xAAAA)) >> 1)
    x = ((x & jnp.uint32(0x3333)) << 2) | ((x & jnp.uint32(0xCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x & jnp.uint32(0xF0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF)) << 8) | ((x & jnp.uint32(0xFF00)) >> 8)
    return (x >> jnp.uint32(1)).astype(jnp.int32)


def _graph_to_scratch(cw_ref, par_ref, llp_ref, dp_ref,
                      nl_s, ml_s, nd_s, md_s):
    """Decode-graph part shared by both Phase A kernels.

    cw_ref: (4, TC) int32 packed per-cell inputs — rows 0/1 = the cell's
    64 bits, row 2 = 32-bit lookahead, row 3 = (entry_local+1) |
    pend<<9 | page_local_block<<18 (ONE host->device array instead of
    four: each staging transfer costs ~21 ms on the dev tunnel).
    par_ref: (1, 96, PAGE) int32 param page (rows: ll count/first/base
    then d count/first/base, 16 lengths each).  llp_ref: (1, 3*PAGE, 288)
    int8 plane-major (row = k*PAGE + b); dp_ref: (1, 3*PAGE, 32) int8
    plane-major.  Writes the per-position transition rows into the four
    (64, TC) int32 VMEM scratch refs: nl=nxt_lit, ml=meta_lit,
    nd=nxt_dist, md=meta_dist.
    """
    w0 = cw_ref[0:1, :].astype(jnp.uint32)
    w1 = cw_ref[1:2, :].astype(jnp.uint32)
    w2 = cw_ref[2:3, :].astype(jnp.uint32)
    p = jax.lax.broadcasted_iota(jnp.int32, (CELL_BITS, TC), 0)
    lo_half = p < 32
    a = jnp.where(lo_half, w0, w1)
    b = jnp.where(lo_half, w1, w2)
    r = (p & 31).astype(jnp.uint32)
    win = (a >> r) | jnp.where(r > 0, b << (jnp.uint32(32) - r), 0)
    rev = _rev15(win & jnp.uint32(0x7FFF))

    # Per-cell decode params: ONE exact f32 matmul (96, PAGE) x (PAGE, TC)
    # against the block-selection one-hot (values < 2^24, single term).
    lb = (cw_ref[3:4, :] >> 18) & 7  # (1, TC)
    iota_pg = jax.lax.broadcasted_iota(jnp.int32, (PAGE, TC), 0)
    ohb = (iota_pg == lb).astype(jnp.float32)  # (PAGE, TC)
    par = jax.lax.dot_general(
        par_ref[0].astype(jnp.float32), ohb, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)  # (96, TC)

    def probe(row0):
        """15-length canonical probe -> (length, offset, unmatched).

        Lim-compare form: canonical tables make the left-justified
        upper bounds lim_l = (first_l + count_l) << (15-l) monotone, so
        the code length is 1 + popcount of (rev >= lim_l) — ONE compare
        + add per length instead of the bounded-range test, and the
        base-minus-first adjust telescopes through the same indicators
        (DL_L = DL_1 + sum_{l<L} S_l (DL_{l+1} - DL_l)).  Offset then
        needs a single per-position variable shift.  (Round-3
        PERF_NOTES plan #3: 15x2 ops vs 15x6.)
        """
        lims = []
        dls = []
        for l in range(1, C.MAX_BITS + 1):
            cnt = par[row0 + l : row0 + l + 1, :]
            fst = par[row0 + 16 + l : row0 + 17 + l, :]
            bse = par[row0 + 32 + l : row0 + 33 + l, :]
            lims.append((fst + cnt) << (C.MAX_BITS - l))
            dls.append(bse - fst)
        length = jnp.ones((CELL_BITS, TC), jnp.int32)
        dl_acc = jnp.broadcast_to(dls[0], (CELL_BITS, TC))
        for l in range(1, C.MAX_BITS + 1):
            s = rev.astype(jnp.int32) >= lims[l - 1]
            length = length + s.astype(jnp.int32)
            if l < C.MAX_BITS:
                dl_acc = dl_acc + jnp.where(s, dls[l] - dls[l - 1], 0)
        unmatched = length > C.MAX_BITS
        length = jnp.where(unmatched, C.MAX_BITS, length)
        code = (rev >> (C.MAX_BITS - length).astype(jnp.uint32)).astype(
            jnp.int32)
        offset = jnp.where(unmatched, 0, code + dl_acc)
        return length, offset, unmatched

    # Symbol lookup: int8 MXU one-hot against plane-major table planes,
    # then block-select via mask + per-plane static slice + sublane sum.
    # Layout discipline (Mosaic): the (position-row, cell) -> flat column
    # round trip goes THROUGH VMEM scratch — row loads from a ref come
    # back at sublane offset 0 (value slices don't), and the per-row
    # write-back slices land on 128-lane-tile boundaries (TC % 128 == 0).
    iota_k288 = jax.lax.broadcasted_iota(jnp.int32, (288, GSZ * TC), 0)
    iota_k32 = jax.lax.broadcasted_iota(jnp.int32, (32, GSZ * TC), 0)
    iota_row = jax.lax.broadcasted_iota(
        jnp.int32, (N_PLANES * PAGE, GSZ * TC), 0
    )
    lbg = jnp.concatenate([lb] * GSZ, axis=1)  # (1, GSZ*TC)
    bmask = (iota_row % PAGE) == lbg  # (3*PAGE, GSZ*TC)

    def lookup(off_ref, aug_ref, planes_page, iota_k):
        """aug_ref[p, c] = packed table value at off_ref[p, c]."""
        for g in range(0, CELL_BITS, GSZ):
            offg = jnp.concatenate(
                [off_ref[g + t : g + t + 1, :] for t in range(GSZ)], axis=1
            )  # (1, GSZ*TC)
            oh = (iota_k == offg).astype(jnp.int8)
            out = jax.lax.dot_general(
                planes_page, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (3*PAGE, GSZ*TC)
            outm = jnp.where(bmask, out, 0)
            acc = None
            for k in range(N_PLANES):
                plane = jnp.sum(
                    outm[k * PAGE : (k + 1) * PAGE, :], axis=0, keepdims=True
                )  # (1, GSZ*TC)
                acc = plane if acc is None else acc | (plane << (7 * k))
            for t in range(GSZ):
                aug_ref[g + t : g + t + 1, :] = acc[
                    :, t * TC : (t + 1) * TC
                ]

    ll_len, ll_off, ll_un = probe(0)
    nl_s[:] = ll_off
    lookup(nl_s, ml_s, llp_ref[0], iota_k288)
    ll_aug = jnp.where(ll_un, 0, ml_s[:])
    d_len, d_off, d_un = probe(48)
    nd_s[:] = d_off
    lookup(nd_s, md_s, dp_ref[0], iota_k32)
    d_aug = jnp.where(d_un, 0, md_s[:])

    # --- transition rows (same math as build_graph_v3, local coords) ---
    lval = ll_aug & 0x1FF
    leb = (ll_aug >> 9) & 0xF
    is_len = (ll_aug >> 13) & 1
    is_eob = (ll_aug >> 14) & 1
    lextra = (win >> ll_len.astype(jnp.uint32)).astype(jnp.int32) & (
        (1 << leb) - 1
    )
    length_val = lval + lextra
    nxt_lit = p + ll_len + jnp.where(is_len == 1, leb, 0)
    nxt_lit = jnp.where(is_eob == 1, INACTIVE, nxt_lit)
    meta_lit = jnp.where(
        (is_len == 1) | (is_eob == 1),
        (K_NONE << META_KIND_SHIFT)
        | jnp.where(is_len == 1, length_val << 16, 0),
        (K_LIT << META_KIND_SHIFT) | lval,
    )

    dbase = d_aug & 0x7FFF
    deb = (d_aug >> 15) & 0xF
    dextra = (win >> d_len.astype(jnp.uint32)).astype(jnp.int32) & (
        (1 << deb) - 1
    )
    nl_s[:] = nxt_lit
    ml_s[:] = meta_lit
    nd_s[:] = p + d_len + deb
    md_s[:] = (K_DIST << META_KIND_SHIFT) | (dbase + dextra)


def _phase_a_kernel(pb_ref, cw_ref, par_ref,
                    llp_ref, dp_ref, tape_ref, cnt_ref,
                    nl_s, ml_s, nd_s, md_s, *, slots: int):
    """One tile -> (slots, TC) token-tape rows (v6/v7 Phase B format)."""
    _graph_to_scratch(cw_ref, par_ref, llp_ref, dp_ref,
                      nl_s, ml_s, nd_s, md_s)

    # --- chase: fori_loop over positions, dynamic scratch-row reads ---
    el = (cw_ref[3:4, :] & 0xFF) - 1
    s_pos0 = jnp.where(el >= 0, el >> 1, INACTIVE)
    s_mode0 = jnp.where(el >= 0, el & 1, 0)
    pend0 = (cw_ref[3:4, :] >> 9) & 0x1FF
    cnt0 = jnp.zeros((1, TC), jnp.int32)
    tape0 = jnp.full((slots, TC), -1, jnp.int32)
    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (slots, 1), 0)

    def step(pp, carry):
        s_pos, s_mode, pend, cnt, tape = carry
        here = s_pos == pp
        mode_b = s_mode == 1
        nl = nl_s[pl.ds(pp, 1), :]
        ml = ml_s[pl.ds(pp, 1), :]
        nd = nd_s[pl.ds(pp, 1), :]
        md = md_s[pl.ds(pp, 1), :]
        nx = jnp.where(mode_b, nd, nl)
        mt = jnp.where(mode_b, md, ml)
        kind = mt >> META_KIND_SHIFT
        payload = mt & 0xFFFF
        pd = (mt >> 16) & 0x1FF
        is_dist = kind == K_DIST
        em = jnp.where(
            is_dist, TOK_MATCH_BIT | (pend << 16) | payload,
            jnp.where(kind == K_LIT, payload, -1),
        )
        new_pend = jnp.where(is_dist, 0, jnp.where(pd > 0, pd, pend))
        # Next mode after a litlen symbol: dist iff it was a length code.
        mo = ((kind == K_NONE) & (pd > 0)).astype(jnp.int32)
        do_emit = here & (em >= 0)
        upd = (iota_slots == cnt) & do_emit
        tape = jnp.where(upd, em, tape)
        cnt = cnt + do_emit.astype(jnp.int32)
        s_pos = jnp.where(here, nx, s_pos)
        s_mode = jnp.where(here, jnp.where(mode_b, 0, mo), s_mode)
        pend = jnp.where(here, new_pend, pend)
        return s_pos, s_mode, pend, cnt, tape

    _, _, _, cnt, tape = jax.lax.fori_loop(
        0, CELL_BITS, step, (s_pos0, s_mode0, pend0, cnt0, tape0)
    )
    tape_ref[:] = tape
    cnt_ref[:] = cnt


def phase_a_pallas(pa, slots: int, interpret: bool = False):
    """Run the fused Phase A kernel.  pa: dict from build_pa_arrays.

    Returns (tape (cells_pad, slots) int32, counts (cells_pad,) int32).
    """
    n_tiles = pa["tile_pb"].shape[0]
    cells_pad = n_tiles * TC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((5, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, 96, PAGE), lambda i, pb: (pb[i], 0, 0)),
            pl.BlockSpec(
                (1, N_PLANES * PAGE, 288), lambda i, pb: (pb[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, N_PLANES * PAGE, 32), lambda i, pb: (pb[i], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
        ],
    )
    tape_t, counts = pl.pallas_call(
        functools.partial(_phase_a_kernel, slots=slots),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cells_pad), jnp.int32),
        ],
        interpret=interpret,
    )(
        pa["tile_pb"], pa["cellw"], pa["params"],
        pa["ll_planes"], pa["d_planes"],
    )
    return tape_t.T, counts[0]


def pa_coverable(plan) -> bool:
    """Cheap predicate: would build_pa_arrays cover this plan?  (Exact
    scanner entries + every TC-cell tile's blocks inside one table
    page.)  Used to partition batches so block-dense streams (e.g. a
    flush-per-scanline PNG with ~800 blocks in 5 KB) fall back without
    dragging the whole batch off the flagship path."""
    if not plan.exact_entries:
        return False
    num_cells = plan.num_cells
    if num_cells == 0:
        return True
    cells_pad = -(-num_cells // TC) * TC
    cb_raw = np.zeros(cells_pad, np.int64)
    cb_raw[:num_cells] = plan.cell_block
    cb_raw[num_cells:] = plan.cell_block[-1]
    comp = np.unique(cb_raw)
    cb2 = np.searchsorted(comp, cb_raw).reshape(-1, TC)
    pb = cb2.min(axis=1) // PAGE_STRIDE
    return not np.any(cb2.max(axis=1) - pb * PAGE_STRIDE >= PAGE)


def build_pa_arrays(plan, stage: bool = True) -> dict | None:
    """Host prep for the fused kernel, or None when it can't cover the
    plan (speculative mode, or a tile spanning more than one table page).

    stage=False returns host numpy arrays (for the one-transfer packed
    staging path, inflate_v3.pack_stage_arrays)."""
    if not plan.exact_entries:
        return None
    num_cells = plan.num_cells
    nb = plan.ll_count.shape[0]
    cells_pad = -(-num_cells // TC) * TC
    n_tiles = cells_pad // TC

    cb_raw = np.zeros(cells_pad, np.int64)
    cb_raw[:num_cells] = plan.cell_block
    cb_raw[num_cells:] = plan.cell_block[-1] if num_cells else 0

    # Cells only ever belong to COMPRESSED blocks, so page over their
    # ordinals — stored blocks would otherwise inflate the id range and
    # break the page-locality constraint (e.g. level-0 zlib emits a
    # stored block per 64 KiB, pushing neighbor compressed blocks > PAGE
    # ids apart).
    comp = np.unique(cb_raw)
    cb = np.searchsorted(comp, cb_raw).astype(np.int32)
    ncb = len(comp)

    # Page assignment: tile t uses page pb[t]; every cell's (ordinal)
    # block must fall inside [PAGE_STRIDE*pb, PAGE_STRIDE*pb + PAGE).
    cb2 = cb.reshape(n_tiles, TC)
    pb = cb2.min(axis=1) // PAGE_STRIDE
    if np.any(cb2.max(axis=1) - pb * PAGE_STRIDE >= PAGE):
        return None
    lb = cb - np.repeat(pb * PAGE_STRIDE, TC)

    # Virtual-stream words: w0/w1 per cell + 32-bit lookahead.
    nbytes = num_cells * (CELL_BITS // 8)
    vb = np.zeros(nbytes + 8, np.uint8)
    vb[: min(len(plan.vbytes), nbytes + 8)] = plan.vbytes[: nbytes + 8]
    ww = vb.view("<u4")
    w0 = ww[0 : 2 * num_cells : 2]
    w1 = ww[1 : 2 * num_cells : 2]
    w2 = ww[2 : 2 * num_cells + 2 : 2]
    cellw = np.zeros((5, cells_pad), np.int32)
    cellw[0, :num_cells] = w0.view(np.int32)
    cellw[1, :num_cells] = w1.view(np.int32)
    cellw[2, :num_cells] = w2.view(np.int32)

    entry_local = np.full(cells_pad, -1, np.int64)
    ent = plan.cell_entry
    idx = np.arange(num_cells, dtype=np.int64)
    entry_local[:num_cells] = np.where(ent >= 0, ent - idx * 2 * CELL_BITS, -1)
    pend = np.zeros(cells_pad, np.int64)
    if plan.cell_pend is not None:
        pend[:num_cells] = plan.cell_pend

    n_pages = int(pb.max()) + 1
    gidx = (
        np.arange(n_pages)[:, None] * PAGE_STRIDE + np.arange(PAGE)[None, :]
    )
    # Ordinal -> original block id for table extraction.
    gidx = comp[np.clip(gidx, 0, ncb - 1)]  # (n_pages, PAGE)

    params = np.zeros((n_pages, 96, PAGE), np.int32)
    for row0, tab in (
        (0, plan.ll_count), (16, plan.ll_first), (32, plan.ll_base),
        (48, plan.d_count), (64, plan.d_first), (80, plan.d_base),
    ):
        params[:, row0 : row0 + 16, :] = np.transpose(
            tab[gidx], (0, 2, 1)
        )

    def planes_of(aug, k_dim):
        """(nb, k_dim) -> (n_pages, 3*PAGE, k_dim), PLANE-major rows
        (row = k*PAGE + b) so the kernel's block-select folds each plane
        with one static slice + sublane reduce."""
        out = np.zeros((n_pages, N_PLANES * PAGE, k_dim), np.int8)
        for k in range(N_PLANES):
            for bb in range(PAGE):
                out[:, k * PAGE + bb, :] = (
                    (aug[gidx[:, bb]] >> (7 * k)) & 0x7F
                ).astype(np.int8)
        return out

    # Row 3: packed (entry+1) | pend<<9 | page-local-block<<18 — ONE
    # staged array for all per-cell inputs (tunnel transfers are ~21 ms
    # each; see _graph_to_scratch).
    cellw[3] = ((entry_local + 1) | (pend << 9)
                | (lb.astype(np.int64) << 18)).astype(np.int32)
    # Row 4: per-cell stored-bytes offset — consumed by the Phase B glue
    # (cellw[4]), not the kernel; riding the same transfer saves another
    # ~21 ms + 2 MB h2d per batch.  Tile-padding cells REPEAT the last
    # real offset: with a 0 fill the glue's cbase/cell_end arrays would
    # dip at the padding tail whenever stored blocks exist, breaking the
    # searchsorted monotonicity that segment ranges depend on.
    if num_cells:
        bob = plan.block_out_base[plan.cell_block].astype(np.int32)
        cellw[4, :num_cells] = bob
        cellw[4, num_cells:] = bob[-1]

    out = {
        "tile_pb": pb.astype(np.int32),
        "cellw": cellw,
        "params": params,
        "ll_planes": planes_of(plan.ll_aug, 288),
        "d_planes": planes_of(plan.d_aug, 32),
    }
    if stage:
        out = {k: jnp.asarray(v) for k, v in out.items()}
    return out


# ---------------------------------------------------------------------------
# v13: Phase A emits OP + LITERAL tapes instead of a token tape.
#
# The v6 Phase B walks every token (lit/len/dist) through a scalar SMEM
# loop — the dominant cost.  Here the chase does that bookkeeping while
# it is already walking the chain VECTORIZED (cells on lanes): literal
# bytes pack densely per cell into a lit tape, maximal literal runs and
# matches become one op record each, and the per-cell output length comes
# out as a lane vector (its cumsum on the XLA side replaces the old
# token-granular cumsum).  Phase B then iterates ~2x fewer records with a
# much lighter body (ops.lz77_pallas._op_kernel_v13).
#
# Op encoding: opa = within-cell output offset << 1 | is_match;
#              opb = match ? (len << 16 | dist) : (lit0 << 16 | run_len).
# ---------------------------------------------------------------------------


def _phase_a13_kernel(pb_ref, cw_ref, par_ref,
                      llp_ref, dp_ref,
                      ma_ref, mb_ref, ra_ref, rb_ref, lit_ref,
                      cnt_ref, outlen_ref,
                      nl_s, ml_s, nd_s, md_s, *, slots: int):
    """One tile -> per-cell MATCH and RUN tapes + dense literal rows.

    Outputs: ma/mb (slots, TC) match records (ma = within-cell output
    offset, mb = len<<16|dist), ra/rb (slots, TC) literal-run records
    (ra = offset, rb = lit0<<16|run_len), lit (slots, TC) literal bytes,
    cnt (1, TC) = match_count << 8 | run_count, outlen (1, TC) decoded
    bytes of the cell.  Split tapes keep the Phase B walk branchless.
    """
    _graph_to_scratch(cw_ref, par_ref, llp_ref, dp_ref,
                      nl_s, ml_s, nd_s, md_s)

    el = (cw_ref[3:4, :] & 0xFF) - 1
    s_pos0 = jnp.where(el >= 0, el >> 1, INACTIVE)
    s_mode0 = jnp.where(el >= 0, el & 1, 0)
    pend0 = (cw_ref[3:4, :] >> 9) & 0x1FF
    z1 = jnp.zeros((1, TC), jnp.int32)
    zs = jnp.zeros((slots, TC), jnp.int32)
    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (slots, 1), 0)

    def step(pp, carry):
        (s_pos, s_mode, pend, mc, rc, litc, cur,
         run_dst, run_lit0, run_len, ma, mb, ra, rb, lit) = carry
        here = s_pos == pp
        mode_b = s_mode == 1
        nl = nl_s[pl.ds(pp, 1), :]
        ml = ml_s[pl.ds(pp, 1), :]
        nd = nd_s[pl.ds(pp, 1), :]
        md = md_s[pl.ds(pp, 1), :]
        nx = jnp.where(mode_b, nd, nl)
        mt = jnp.where(mode_b, md, ml)
        kind = mt >> META_KIND_SHIFT
        payload = mt & 0xFFFF
        pd = (mt >> 16) & 0x1FF
        emit_m = here & (kind == K_DIST)
        emit_l = here & (kind == K_LIT)

        # Close the open literal run when a match emits.
        do_flush = emit_m & (run_len > 0)
        upd = (iota_slots == rc) & do_flush
        ra = jnp.where(upd, run_dst, ra)
        rb = jnp.where(upd, (run_lit0 << 16) | run_len, rb)
        rc = rc + do_flush.astype(jnp.int32)
        # Match record (emitted match length = carried pending).
        upd = (iota_slots == mc) & emit_m
        ma = jnp.where(upd, cur, ma)
        mb = jnp.where(upd, (pend << 16) | payload, mb)
        mc = mc + emit_m.astype(jnp.int32)
        # Literal byte -> dense lit row; open/extend the run.
        upd = (iota_slots == litc) & emit_l
        lit = jnp.where(upd, payload, lit)
        fresh = emit_l & (run_len == 0)
        run_dst = jnp.where(fresh, cur, run_dst)
        run_lit0 = jnp.where(fresh, litc, run_lit0)
        run_len = jnp.where(emit_m, 0, run_len + emit_l.astype(jnp.int32))
        litc = litc + emit_l.astype(jnp.int32)
        cur = cur + jnp.where(emit_m, pend, 0) + emit_l.astype(jnp.int32)

        new_pend = jnp.where(kind == K_DIST, 0,
                             jnp.where(pd > 0, pd, pend))
        mo = ((kind == K_NONE) & (pd > 0)).astype(jnp.int32)
        s_pos = jnp.where(here, nx, s_pos)
        s_mode = jnp.where(here, jnp.where(mode_b, 0, mo), s_mode)
        pend = jnp.where(here, new_pend, pend)
        return (s_pos, s_mode, pend, mc, rc, litc, cur,
                run_dst, run_lit0, run_len, ma, mb, ra, rb, lit)

    (_, _, _, mc, rc, litc, cur, run_dst, run_lit0, run_len,
     ma, mb, ra, rb, lit) = jax.lax.fori_loop(
        0, CELL_BITS, step,
        (s_pos0, s_mode0, pend0, z1, z1, z1, z1, z1, z1, z1,
         zs, zs, zs, zs, zs),
    )
    # Trailing literal run (chain ended inside/after the cell).
    do_flush = run_len > 0
    upd = (iota_slots == rc) & do_flush
    ra = jnp.where(upd, run_dst, ra)
    rb = jnp.where(upd, (run_lit0 << 16) | run_len, rb)
    rc = rc + do_flush.astype(jnp.int32)

    ma_ref[:] = ma
    mb_ref[:] = mb
    ra_ref[:] = ra
    rb_ref[:] = rb
    lit_ref[:] = lit
    cnt_ref[:] = (mc << 16) | (rc << 8) | litc
    outlen_ref[:] = cur


def phase_a13_pallas(pa, slots: int, interpret: bool = False):
    """Run the v13 Phase A kernel.  pa: dict from build_pa_arrays.

    Returns (ma, mb, ra, rb, lit) each (slots, cells_pad) int32 plus
    (cnt, outlen) each (cells_pad,) int32 — cnt = match_cnt<<16 |
    run_cnt<<8 | lit_cnt.
    """
    n_tiles = pa["tile_pb"].shape[0]
    cells_pad = n_tiles * TC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((5, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, 96, PAGE), lambda i, pb: (pb[i], 0, 0)),
            pl.BlockSpec(
                (1, N_PLANES * PAGE, 288), lambda i, pb: (pb[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, N_PLANES * PAGE, 32), lambda i, pb: (pb[i], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((slots, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
            pltpu.VMEM((CELL_BITS, TC), jnp.int32),
        ],
    )
    ma, mb, ra, rb, lit, cnt, outlen = pl.pallas_call(
        functools.partial(_phase_a13_kernel, slots=slots),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((slots, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cells_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cells_pad), jnp.int32),
        ],
        interpret=interpret,
    )(
        pa["tile_pb"], pa["cellw"], pa["params"],
        pa["ll_planes"], pa["d_planes"],
    )
    return ma, mb, ra, rb, lit, cnt[0], outlen[0]
