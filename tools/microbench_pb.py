"""Microbenchmark Phase B kernel primitives on the real chip (v12 format).

Times variants of the narrow-piece group loop over synthetic piece lists
to attribute the measured ~16 ns/piece: full (2-row load + roll + select
+ masked-row store), load_only, store_only, scalar_only (SMEM reads +
unpack, no memory traffic), and unroll2 (two groups per fori body).
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

N_PIECES = 1 << 21  # 2M pieces
ROWS = 4096 + 8  # ~2 MB int32 buffer
GROUP = 8
STAGE_ROWS = 16


def _kernel(w0_hbm, w1_hbm, init_ref, out_ref, *, variant: str,
            stage_rows: int = STAGE_ROWS):
    del init_ref
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(w0_s, w1_s, acc_s, sem):
        STAGE_ROWS = stage_rows
        def per_group(w0_s, w1_s, i0):
            if variant == "noop":
                return
            if variant == "scalar_smem":
                row = i0 >> 7
                l0 = i0 & 127
                t = 0
                for g in range(GROUP):
                    t = t + w0_s[row, l0 + g] + w1_s[row, l0 + g]
                acc_s[0] = t
                return
            row = i0 >> 7
            l0 = i0 & 127
            w0s, datas = [], []
            acc = jnp.zeros((1, 128), jnp.int32)
            for g in range(GROUP):
                w0 = w0_s[row, l0 + g]
                w1 = w1_s[row, l0 + g]
                if variant == "scalar_only":
                    acc = acc + (w0 + w1)
                    continue
                if variant == "store_only":
                    s = acc
                else:
                    a = out_ref[pl.ds(w1 >> 16, 2), :]
                    ar = pltpu.roll(a, -((w1 >> 8) & 127), axis=1)
                    s = jnp.where(lane1 < (w1 & 255), ar[0:1], ar[1:2])
                w0s.append(w0)
                datas.append(s)
            if variant == "scalar_only":
                out_ref[pl.ds(8, 1), :] = acc
                return
            if variant == "load_only":
                for g in range(GROUP):
                    acc = acc + datas[g]
                out_ref[pl.ds(8, 1), :] = acc
                return
            for g in range(GROUP):
                w0 = w0s[g]
                mask = (lane1 >= ((w0 >> 8) & 127)) & (lane1 < (w0 & 255))
                pltpu.store(out_ref.at[pl.ds(w0 >> 16, 1), :],
                            datas[g], mask=mask)

        def per_stage(si, _):
            st = si * STAGE_ROWS
            if variant != "nodma":
                dds = [pltpu.make_async_copy(
                        hbm.at[pl.ds(st, STAGE_ROWS), :], smem, sem)
                       for hbm, smem in ((w0_hbm, w0_s), (w1_hbm, w1_s))]
                for dd in dds:
                    dd.start()
                for dd in dds:
                    dd.wait()

            if variant.startswith("unroll") or variant == "noop8":
                u = 8 if variant in ("unroll8", "noop8") else int(variant[-1])
                def grpu(gi, _):
                    if variant != "noop8":
                        for k in range(u):
                            per_group(w0_s, w1_s, (gi * u + k) * GROUP)
                    return 0
                jax.lax.fori_loop(0, STAGE_ROWS * 128 // GROUP // u, grpu, 0)
            else:
                def grp(gi, _):
                    per_group(w0_s, w1_s, gi * GROUP)
                    return 0
                jax.lax.fori_loop(0, STAGE_ROWS * 128 // GROUP, grp, 0)
            return 0

        jax.lax.fori_loop(0, N_PIECES // (STAGE_ROWS * 128), per_stage, 0)

    pl.run_scoped(
        body,
        w0_s=pltpu.SMEM((stage_rows, 128), jnp.int32),
        w1_s=pltpu.SMEM((stage_rows, 128), jnp.int32),
        acc_s=pltpu.SMEM((1,), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def run_variant(variant, w0, w1, init, stage_rows=STAGE_ROWS):
    f = pl.pallas_call(
        functools.partial(_kernel, variant=variant, stage_rows=stage_rows),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        name=f"mb_{variant}_{stage_rows}",
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

    sync(jf(w0, w1, init))
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        sync(jf(w0, w1, init))
    dt = (time.time() - t0) / reps
    ns = dt * 1e9 / N_PIECES
    print(f"{variant:12s} sr={stage_rows:3d}: {dt*1e3:7.2f} ms  {ns:6.1f} ns/piece "
          f"(~{ns*0.94:5.1f} cyc)", flush=True)


def main():
    rng = np.random.default_rng(0)
    # Synthetic v12 pieces: dst walks the buffer, src = dst - dist with
    # dist in [384, 4096), len in [4, 24), row-split like the real packer.
    i = np.arange(N_PIECES, dtype=np.int64)
    dst = 1024 + (i * 16) % (ROWS * 128 - 8192 - 2048)
    dist = rng.integers(384, 4096, N_PIECES)
    ln = np.minimum(rng.integers(4, 24, N_PIECES), 128 - (dst & 127))
    rp = dst & 127
    q = dst - dist - rp
    r = q & 127
    w0 = ((dst >> 7) << 16) | (rp << 8) | (rp + ln)
    w1 = ((q >> 7) << 16) | (r << 8) | (128 - r)
    w0 = jnp.asarray(w0.reshape(-1, 128).astype(np.int32))
    w1 = jnp.asarray(w1.reshape(-1, 128).astype(np.int32))
    init = jnp.zeros((ROWS, 128), jnp.int32)

    for v, sr in (("noop", 16), ("noop", 64), ("noop", 256), ("nodma", 16),
                  ("full", 16), ("full", 64), ("full", 256),
                  ("scalar_smem", 256)):
        run_variant(v, w0, w1, init, stage_rows=sr)


if __name__ == "__main__":
    main()
