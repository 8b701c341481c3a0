"""Microbenchmark Phase B kernel primitives on the real chip.

Times variants of the v9 group copy loop over synthetic piece lists to
attribute the measured ~25 cycles/piece: full (load+roll+mask+store),
no-roll, store-only, load-only, and a 2-row-window merged-store variant.
"""

from __future__ import annotations

import functools
import time

import numpy as np

from debigulator_tpu.utils.config import setup_jax_cache

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from debigulator_tpu.ops import lz77_pallas as lz  # noqa: E402

N_PIECES = 1 << 21  # 2M pieces
ROWS = 4096 + 8  # ~2 MB int32 buffer
GROUP = 8


def _kernel(gpos_hbm, gmeta_hbm, init_ref, out_ref, *, variant: str):
    del init_ref
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

    def body(gp_s, gm_s, sem):
        def per_stage(si, _):
            st = si * 16
            for hbm, smem in ((gpos_hbm, gp_s), (gmeta_hbm, gm_s)):
                dd = pltpu.make_async_copy(
                    hbm.at[pl.ds(st, 16), :], smem, sem)
                dd.start()
                dd.wait()

            def per_group(gi, _):
                i0 = gi * GROUP
                dsts, lens, datas = [], [], []
                for g in range(GROUP):
                    t = i0 + g
                    meta = gm_s[t >> 7, t & 127]
                    dst = gp_s[t >> 7, t & 127]
                    src = dst - (meta & 0xFFFF)
                    dsts.append(dst)
                    lens.append(meta >> 16)
                    if variant == "store_only":
                        datas.append(jnp.full((3, 128), 7, jnp.int32))
                    elif variant == "no_roll":
                        a = out_ref[pl.ds((src - (dst & 127)) >> 7, 3), :]
                        datas.append(a)
                    else:
                        datas.append(
                            lz._load_span_n(out_ref, src - (dst & 127), 3)
                        )
                if variant == "load_only":
                    acc = jnp.zeros((2, 128), jnp.int32)
                    for g in range(GROUP):
                        acc = acc + datas[g][:2]
                    out_ref[pl.ds(8, 2), :] = acc
                elif variant == "merge":
                    # All 8 pieces share one 2-row dst window: merge in
                    # registers, single store.
                    acc = out_ref[pl.ds(dsts[0] >> 7, 2), :]
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        mask = (flat2 >= rp) & (flat2 < rp + lens[g])
                        acc = jnp.where(mask, datas[g][:2], acc)
                    out_ref[pl.ds(dsts[0] >> 7, 2), :] = acc
                else:
                    for g in range(GROUP):
                        rp = dsts[g] & 127
                        mask = (flat2 >= rp) & (flat2 < rp + lens[g])
                        pltpu.store(
                            out_ref.at[pl.ds(dsts[g] >> 7, 2), :],
                            datas[g][:2], mask=mask)
                return 0

            jax.lax.fori_loop(0, 16 * 128 // GROUP, per_group, 0)
            return 0

        jax.lax.fori_loop(0, N_PIECES // (16 * 128), per_stage, 0)

    pl.run_scoped(
        body,
        gp_s=pltpu.SMEM((16, 128), jnp.int32),
        gm_s=pltpu.SMEM((16, 128), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def run_variant(variant, gpos, gmeta, init):
    f = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
    )
    jf = jax.jit(f)
    probe = jax.jit(lambda x: x.reshape(-1)[:8])

    def sync(r):
        return np.asarray(probe(r))

    sync(jf(gpos, gmeta, init))
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        sync(jf(gpos, gmeta, init))
    dt = (time.time() - t0) / reps
    ns = dt * 1e9 / N_PIECES
    print(f"{variant:12s}: {dt*1e3:7.2f} ms  {ns:6.1f} ns/piece "
          f"(~{ns*0.94:5.1f} cyc)")


def main():
    rng = np.random.default_rng(0)
    # Synthetic pieces: dst walks the buffer, src = dst - dist with
    # dist in [384, 4096) (clean/far), len in [4, 24).
    i = np.arange(N_PIECES)
    dst = 1024 + (i * 16) % (ROWS * 128 - 4096 - 2048)
    # keep groups of 8 within one 2-row window for the merge variant:
    g = i // GROUP
    dst_m = 1024 + (g * 256) % (ROWS * 128 - 4096 - 2048) + (i % GROUP) * 16
    dist = rng.integers(384, 4096, N_PIECES)
    ln = rng.integers(4, 24, N_PIECES)
    meta = (ln.astype(np.int64) << 16) | dist
    gpos = jnp.asarray(dst_m.reshape(-1, 128).astype(np.int32))
    gmeta = jnp.asarray(meta.reshape(-1, 128).astype(np.int32))
    init = jnp.zeros((ROWS, 128), jnp.int32)

    for v in ("full", "no_roll", "store_only", "load_only", "merge"):
        run_variant(v, gpos, gmeta, init)


if __name__ == "__main__":
    main()
