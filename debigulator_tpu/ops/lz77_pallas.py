"""Pallas LZ77 resolver: the TPU-native replacement for the reference's
byte-copy loop (reference inflate.c:1861-1897) and for XLA's serial
scatter/gather (~7.5 ns/element on v5e — measured).

One kernel walks the token tape sequentially (cells are already in stream
order) keeping the output cursor in scratch, with the whole output window
resident in VMEM:

* a cell whose tokens are all literals commits them as one masked
  vector write at the cursor (fast path — literal-dominant data streams
  at vector speed);
* matches are masked 258-wide block copies; overlapping copies
  (dist < len, the RLE case) grow the pattern by doubling — ≤9 rounds
  instead of the reference's byte loop.

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
MAXLEN = 258
#: Max output bytes per launch (int32-per-byte in VMEM; keep well under 16 MB).
OUT_CAP = 2 * 1024 * 1024

TOK_MATCH_BIT = 1 << 30


def _lz77_kernel(counts_ref, tape_ref, tail_ref, out_ref, cur_ref):
    """Single-grid-step kernel: all cells of this launch.

    counts_ref: (num_cells,) int32 valid tokens per cell (SMEM).
    tape_ref:   (num_cells, slots) int32 packed tokens (VMEM).
    tail_ref:   (WINDOW,) int32 previous-launch tail (VMEM).
    out_ref:    (WINDOW + OUT,) int32 output incl. prologue (VMEM).
    cur_ref:    (1,) int32 scratch cursor (SMEM).
    """
    num_cells, slots = tape_ref.shape
    iota_len = jax.lax.broadcasted_iota(jnp.int32, (1, MAXLEN), 1)
    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (1, slots), 1)

    out_ref[pl.ds(0, WINDOW)] = tail_ref[:]
    cur_ref[0] = WINDOW

    def per_cell(c, _):
        cnt = counts_ref[c]

        @pl.when(cnt > 0)
        def _():
            row = tape_ref[c, :].reshape(1, slots)
            any_match = jnp.any((row >= TOK_MATCH_BIT) & (iota_slots < cnt))
            cur = cur_ref[0]

            @pl.when(jnp.logical_not(any_match))
            def _fast():
                # All-literal cell: one masked vector commit.
                existing = out_ref[pl.ds(cur, slots)].reshape(1, slots)
                vals = jnp.where(iota_slots < cnt, row, existing)
                out_ref[pl.ds(cur, slots)] = vals.reshape(slots)
                cur_ref[0] = cur + cnt

            @pl.when(any_match)
            def _slow():
                def per_tok(j, _):
                    @pl.when(j < cnt)
                    def _():
                        e = tape_ref[c, j]
                        cur = cur_ref[0]
                        is_match = e >= TOK_MATCH_BIT

                        @pl.when(jnp.logical_not(is_match))
                        def _lit():
                            existing = out_ref[pl.ds(cur, 1)]
                            out_ref[pl.ds(cur, 1)] = jnp.full((1,), e & 0x1FF, jnp.int32)
                            cur_ref[0] = cur + 1

                        @pl.when(is_match)
                        def _match():
                            length = (e >> 16) & 0x3FFF
                            dist = e & 0xFFFF
                            src = cur - dist

                            @pl.when(dist >= length)
                            def _plain():
                                data = out_ref[pl.ds(src, MAXLEN)].reshape(1, MAXLEN)
                                existing = out_ref[pl.ds(cur, MAXLEN)].reshape(1, MAXLEN)
                                merged = jnp.where(iota_len < length, data, existing)
                                out_ref[pl.ds(cur, MAXLEN)] = merged.reshape(MAXLEN)

                            @pl.when(dist < length)
                            def _overlap():
                                # Seed `dist` bytes, then double the pattern.
                                data = out_ref[pl.ds(src, MAXLEN)].reshape(1, MAXLEN)
                                existing = out_ref[pl.ds(cur, MAXLEN)].reshape(1, MAXLEN)
                                n0 = jnp.minimum(dist, length)
                                out_ref[pl.ds(cur, MAXLEN)] = jnp.where(
                                    iota_len < n0, data, existing
                                ).reshape(MAXLEN)

                                def grow(k, avail):
                                    @pl.when(avail < length)
                                    def _():
                                        sdata = out_ref[pl.ds(cur, MAXLEN)].reshape(1, MAXLEN)
                                        dst = out_ref[pl.ds(cur + avail, MAXLEN)].reshape(1, MAXLEN)
                                        n_new = jnp.minimum(avail, length - avail)
                                        out_ref[pl.ds(cur + avail, MAXLEN)] = jnp.where(
                                            iota_len < n_new, sdata, dst
                                        ).reshape(MAXLEN)
                                    return jnp.minimum(avail * 2, length)

                                jax.lax.fori_loop(0, 9, grow, n0)

                            cur_ref[0] = cur + length

                    return 0

                jax.lax.fori_loop(0, slots, per_tok, 0)

        return 0

    jax.lax.fori_loop(0, num_cells, per_cell, 0)


@functools.partial(jax.jit, static_argnames=("num_cells", "slots", "out_pad"))
def lz77_resolve_launch(counts, tape, tail, num_cells: int, slots: int, out_pad: int):
    """One launch: resolve ≤ out_pad output bytes; returns (WINDOW+out_pad,) i32."""
    return pl.pallas_call(
        _lz77_kernel,
        out_shape=jax.ShapeDtypeStruct((WINDOW + out_pad + MAXLEN,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(counts, tape, tail)


def resolve_tape_pallas(tape_np, counts_np, out_size: int,
                        stored=None, interpret: bool = False) -> np.ndarray:
    """Host-orchestrated multi-launch resolve (chained 32 KiB tails).

    tape_np: (Cells, slots) int32; counts_np: (Cells,) int32.
    Note: stored-block bytes are currently injected by the caller between
    launches (stored blocks split launches); returns (out_size,) uint8.
    """
    # Split cells into launches whose output fits OUT_CAP.
    lens = np.where(
        counts_np[:, None] > np.arange(tape_np.shape[1])[None, :],
        np.where(tape_np >= TOK_MATCH_BIT, (tape_np >> 16) & 0x3FFF, 1),
        0,
    ).sum(axis=1)
    cum = np.concatenate([[0], np.cumsum(lens)])
    total = int(cum[-1])
    outs = []
    tail = np.zeros(WINDOW, np.int32)
    c0 = 0
    while c0 < len(lens):
        # Greedy: take cells until OUT_CAP.
        hi = int(np.searchsorted(cum, cum[c0] + OUT_CAP, side="right")) - 1
        hi = max(hi, c0 + 1)
        seg_out = int(cum[hi] - cum[c0])
        num_cells = hi - c0
        out_pad = max(256, seg_out)
        fn = lz77_resolve_launch
        if interpret:
            fn = _interpret_launch
        buf = np.asarray(
            fn(
                jnp.asarray(counts_np[c0:hi]),
                jnp.asarray(tape_np[c0:hi]),
                jnp.asarray(tail),
                num_cells=num_cells,
                slots=tape_np.shape[1],
                out_pad=out_pad,
            )
        )
        outs.append(buf[WINDOW : WINDOW + seg_out])
        full = np.concatenate([tail, buf[WINDOW : WINDOW + seg_out]])
        tail = full[-WINDOW:]
        c0 = hi
    if total != out_size:
        raise ValueError(f"tape output {total} != expected {out_size}")
    if outs:
        return np.concatenate(outs).astype(np.uint8)
    return np.zeros(0, np.uint8)


@functools.partial(jax.jit, static_argnames=("num_cells", "slots", "out_pad"))
def _interpret_launch(counts, tape, tail, num_cells: int, slots: int, out_pad: int):
    return pl.pallas_call(
        _lz77_kernel,
        out_shape=jax.ShapeDtypeStruct((WINDOW + out_pad + MAXLEN,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=True,
    )(counts, tape, tail)
