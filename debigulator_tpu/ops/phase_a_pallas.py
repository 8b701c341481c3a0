"""Phase A as ONE fused Pallas kernel: decode graph + cell chase in VMEM.

The XLA Phase A (ops.inflate_v3.build_graph_v3 + chase_cells) is correct
but HBM-bound: every per-position intermediate (32-bit windows, 15-length
canonical probe, one-hot symbol matmuls, the 128-state transition tables)
round-trips through HBM, and the chase re-reads the full NXT/META tables
on every while-loop step (~260 MB/step at 16 Mbit).  Measured on v5e:
91 ms graph + 68 ms chase for a 16-stream merged batch.

This kernel keeps the whole thing in VMEM per tile of 128 cells:

* layout: **cells on lanes (128), bit positions on sublanes (64)** — all
  per-cell quantities are (1, 128) lane vectors that broadcast across the
  position axis for free;
* the 32-bit window at every position comes from three per-cell words
  (cell bits + 32-bit lookahead), shifted by the sublane index;
* canonical decode = the same 15-length branch-free probe as XLA
  (reference inflate.c:565-706 semantics), with per-cell count/first/base
  selected from an 8-block table page by an unrolled compare tree;
* the canonical-offset -> packed-symbol lookup is an int8 MXU matmul with
  the TABLE ENTRY axis on sublanes: ``planes (24, 288) @ onehot (288, 8*128)``
  — one-hots are built by broadcast compare, never relayouted;
* the chase walks each cell's token chain with exact scanner entries
  (states never leave the cell), one-hot sublane lookups into the (64,128)
  transition planes, early-exiting when every lane is inactive; the tape
  (slots, 128) is emitted directly to the kernel output.

Block tables are paged: page p covers blocks [4p, 4p+8); a tile picks its
page via scalar prefetch.  Tiles whose 128 cells span more than one page
window (blocks denser than ~52 cells apart — pathological streams) fall
back to the XLA path, as does speculative (non-exact) mode.

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
INACTIVE = CELL_BITS


def _rev15(x):
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x5555)) << 1) | ((x & jnp.uint32(0xAAAA)) >> 1)
    x = ((x & jnp.uint32(0x3333)) << 2) | ((x & jnp.uint32(0xCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x & jnp.uint32(0xF0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF)) << 8) | ((x & jnp.uint32(0xFF00)) >> 8)
    return (x >> jnp.uint32(1)).astype(jnp.int32)


def _phase_a_kernel(pb_ref, vw_ref, ent_ref, pend_ref, lb_ref, par_ref,
                    llp_ref, dp_ref, tape_ref, cnt_ref, *, slots: int):
    """One tile: 128 cells x 64 bit positions -> (slots, 128) tape rows.

    vw_ref: (3, TC) int32 — w0/w1 = the cell's 64 bits, w2 = 32-bit
    lookahead.  ent_ref/pend_ref: (1, TC) exact local entry state (-1 =
    no code starts here) and pending match length.  lb_ref: (1, TC)
    page-local block id in [0, PAGE).  par_ref: (1, 96, PAGE) int32 param
    page (rows: ll count/first/base then d count/first/base, 16 lengths
    each).  llp_ref: (1, 3*PAGE, 288) int8; dp_ref: (1, 3*PAGE, 32) int8.
    """
    w0 = vw_ref[0:1, :].astype(jnp.uint32)
    w1 = vw_ref[1:2, :].astype(jnp.uint32)
    w2 = vw_ref[2:3, :].astype(jnp.uint32)
    p = jax.lax.broadcasted_iota(jnp.int32, (CELL_BITS, TC), 0)
    lo_half = p < 32
    a = jnp.where(lo_half, w0, w1)
    b = jnp.where(lo_half, w1, w2)
    r = (p & 31).astype(jnp.uint32)
    win = (a >> r) | jnp.where(r > 0, b << (jnp.uint32(32) - r), 0)
    rev = _rev15(win & jnp.uint32(0x7FFF))

    lb = lb_ref[:]  # (1, TC)
    par_page = par_ref[0]  # (96, PAGE)
    par = jnp.zeros((96, TC), jnp.int32)
    for bb in range(PAGE):
        par = jnp.where(lb == bb, par_page[:, bb : bb + 1], par)

    def decode_side(row0, planes_page, k_dim):
        """15-length canonical probe + MXU symbol lookup.

        row0: first row of this side's params in ``par`` (0 = litlen,
        48 = dist).  planes_page: (3*PAGE, k_dim) int8.  Returns
        (aug (64,TC) int32, length (64,TC) int32).
        """
        length = jnp.zeros((CELL_BITS, TC), jnp.int32)
        offset = jnp.zeros((CELL_BITS, TC), jnp.int32)
        for l in range(1, C.MAX_BITS + 1):
            cnt = par[row0 + l : row0 + l + 1, :]
            fst = par[row0 + 16 + l : row0 + 17 + l, :]
            bse = par[row0 + 32 + l : row0 + 33 + l, :]
            code_l = rev >> (C.MAX_BITS - l)
            off_l = code_l - fst
            ok = (off_l >= 0) & (off_l < cnt) & (length == 0)
            length = jnp.where(ok, l, length)
            offset = jnp.where(ok, bse + off_l, offset)
        unmatched = length == 0
        length = jnp.where(unmatched, C.MAX_BITS, length)
        offset = jnp.where(unmatched, 0, offset)

        iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_dim, TC), 0)
        aug_rows = []
        gsz = 8  # position rows per MXU call
        for g in range(0, CELL_BITS, gsz):
            ohs = [
                (iota_k == offset[g + t : g + t + 1, :]).astype(jnp.int8)
                for t in range(gsz)
            ]
            oh = jnp.concatenate(ohs, axis=1)  # (k_dim, gsz*TC)
            out = jax.lax.dot_general(
                planes_page, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (3*PAGE, gsz*TC)
            for t in range(gsz):
                chunk = out[:, t * TC : (t + 1) * TC]  # (3*PAGE, TC)
                acc = jnp.zeros((N_PLANES, TC), jnp.int32)
                for bb in range(PAGE):
                    acc = jnp.where(
                        lb == bb,
                        chunk[bb * N_PLANES : (bb + 1) * N_PLANES, :],
                        acc,
                    )
                aug_rows.append(
                    acc[0:1] | (acc[1:2] << 7) | (acc[2:3] << 14)
                )
        aug = jnp.concatenate(aug_rows, axis=0)  # (64, TC)
        aug = jnp.where(unmatched, 0, aug)
        return aug, length

    ll_aug, ll_len = decode_side(0, llp_ref[0], 288)
    d_aug, d_len = decode_side(48, dp_ref[0], 32)

    # --- graph values (same math as build_graph_v3, local coordinates) ---
    lval = ll_aug & 0x1FF
    leb = (ll_aug >> 9) & 0xF
    is_len = (ll_aug >> 13) & 1
    is_eob = (ll_aug >> 14) & 1
    lextra = (win >> ll_len.astype(jnp.uint32)).astype(jnp.int32) & (
        (1 << leb) - 1
    )
    length_val = lval + lextra
    np_lit = p + ll_len + jnp.where(is_len == 1, leb, 0)
    np_lit = jnp.where(is_eob == 1, INACTIVE, np_lit)
    nm_lit = is_len  # next mode: dist after a length symbol
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
    np_dist = p + d_len + deb
    meta_dist = (K_DIST << META_KIND_SHIFT) | (dbase + dextra)

    # --- chase: static wavefront sweep ---
    # Positions advance strictly monotonically (every code consumes >= 1
    # bit), so one unrolled p = 0..63 sweep visits every chain step in
    # order with STATIC table-row indexing — no per-token one-hot sum
    # over the 64-row tables (the while-loop formulation's cost).
    el = ent_ref[:]
    s_pos = jnp.where(el >= 0, el >> 1, INACTIVE)
    s_mode = jnp.where(el >= 0, el & 1, 0)
    pend = pend_ref[:]
    cnt = jnp.zeros((1, TC), jnp.int32)
    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (slots, 1), 0)

    tape = jnp.full((slots, TC), -1, jnp.int32)

    kind_lit = meta_lit >> META_KIND_SHIFT  # (64, TC)
    for p in range(CELL_BITS):
        here = s_pos == p  # (1, TC)
        mode_b = s_mode == 1
        nx_pos = jnp.where(mode_b, np_dist[p : p + 1], np_lit[p : p + 1])
        kind = jnp.where(mode_b, K_DIST, kind_lit[p : p + 1])
        mt = jnp.where(mode_b, meta_dist[p : p + 1], meta_lit[p : p + 1])
        payload = mt & 0xFFFF
        pd = (mt >> 16) & 0x1FF
        is_dist = kind == K_DIST
        em = jnp.where(
            is_dist, TOK_MATCH_BIT | (pend << 16) | payload,
            jnp.where(kind == K_LIT, payload, -1),
        )
        new_pend = jnp.where(is_dist, 0, jnp.where(pd > 0, pd, pend))
        do_emit = here & (em >= 0)
        upd = (iota_slots == cnt) & do_emit
        tape = jnp.where(upd, em, tape)
        cnt = cnt + do_emit.astype(jnp.int32)
        s_pos = jnp.where(here, nx_pos, s_pos)
        s_mode = jnp.where(here, jnp.where(mode_b, 0, nm_lit[p : p + 1]),
                           s_mode)
        pend = jnp.where(here, new_pend, pend)
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
            pl.BlockSpec((3, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
            pl.BlockSpec((1, TC), lambda i, pb: (0, i)),
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
        pa["tile_pb"], pa["vwords"], pa["entry_local"], pa["pend"],
        pa["lb"], pa["params"], pa["ll_planes"], pa["d_planes"],
    )
    return tape_t.T, counts[0]


def build_pa_arrays(plan) -> dict | None:
    """Host prep for the fused kernel, or None when it can't cover the
    plan (speculative mode, or a tile spanning more than one table page)."""
    if not plan.exact_entries:
        return None
    num_cells = plan.num_cells
    nb = plan.ll_count.shape[0]
    cells_pad = -(-num_cells // TC) * TC
    n_tiles = cells_pad // TC

    cb = np.zeros(cells_pad, np.int32)
    cb[:num_cells] = plan.cell_block
    cb[num_cells:] = plan.cell_block[-1] if num_cells else 0

    # Page assignment: tile t uses page pb[t]; every cell's block must
    # fall inside [PAGE_STRIDE*pb, PAGE_STRIDE*pb + PAGE).
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
    vwords = np.zeros((3, cells_pad), np.int32)
    vwords[0, :num_cells] = w0.view(np.int32)
    vwords[1, :num_cells] = w1.view(np.int32)
    vwords[2, :num_cells] = w2.view(np.int32)

    entry_local = np.full((1, cells_pad), -1, np.int32)
    ent = plan.cell_entry
    idx = np.arange(num_cells, dtype=np.int64)
    entry_local[0, :num_cells] = np.where(
        ent >= 0, ent - idx * 2 * CELL_BITS, -1
    ).astype(np.int32)
    pend = np.zeros((1, cells_pad), np.int32)
    if plan.cell_pend is not None:
        pend[0, :num_cells] = plan.cell_pend

    n_pages = int(pb.max()) + 1
    gidx = (
        np.arange(n_pages)[:, None] * PAGE_STRIDE + np.arange(PAGE)[None, :]
    )
    gidx = np.clip(gidx, 0, nb - 1)  # (n_pages, PAGE)

    params = np.zeros((n_pages, 96, PAGE), np.int32)
    for row0, tab in (
        (0, plan.ll_count), (16, plan.ll_first), (32, plan.ll_base),
        (48, plan.d_count), (64, plan.d_first), (80, plan.d_base),
    ):
        params[:, row0 : row0 + 16, :] = np.transpose(
            tab[gidx], (0, 2, 1)
        )

    def planes_of(aug, k_dim):  # (nb, k_dim) -> (n_pages, 3*PAGE, k_dim)
        out = np.zeros((n_pages, N_PLANES * PAGE, k_dim), np.int8)
        for bb in range(PAGE):
            for k in range(N_PLANES):
                out[:, bb * N_PLANES + k, :] = (
                    (aug[gidx[:, bb]] >> (7 * k)) & 0x7F
                ).astype(np.int8)
        return out

    return {
        "tile_pb": jnp.asarray(pb.astype(np.int32)),
        "vwords": jnp.asarray(vwords),
        "entry_local": jnp.asarray(entry_local),
        "pend": jnp.asarray(pend),
        "lb": jnp.asarray(lb.reshape(1, cells_pad).astype(np.int32)),
        "params": jnp.asarray(params),
        "ll_planes": jnp.asarray(planes_of(plan.ll_aug, 288)),
        "d_planes": jnp.asarray(planes_of(plan.d_aug, 32)),
    }
