"""Break down device time for the fused merged-batch decode pipeline.

Times, on the real chip, for K copies of gzipsample.gz's DEFLATE stream:
  * Phase A alone (Pallas graph+chase kernel)
  * Phase B alone (v9 group-driven resolve, tape precomputed)
  * the full fused call
  * an empty jit call (tunnel / dispatch floor)

Usage: python tools/profile_merged.py [K ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from debigulator_tpu.utils.config import setup_jax_cache

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from debigulator_tpu.models.gzip_codec import parse_gzip_members  # noqa: E402
from debigulator_tpu.ops import inflate_v3 as v3  # noqa: E402
from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays, phase_a_pallas  # noqa: E402
from debigulator_tpu.ops.archive.host_fed import build_v9_arrays  # noqa: E402
from debigulator_tpu.parallel.merged import (  # noqa: E402
    build_merged_plan,
    prepare_merged,
)


_probe = None


def bench_fn(fn, reps=5):
    """Time fn via an 8-byte readback per rep (block_until_ready does not
    actually block on the axon tunnel backend)."""
    global _probe
    if _probe is None:
        _probe = jax.jit(lambda x: x.reshape(-1)[:8])

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return np.asarray(_probe(leaf))

    sync(fn())  # compile / warm
    t0 = time.time()
    for _ in range(reps):
        sync(fn())
    return (time.time() - t0) / reps * 1e3


def main():
    ks = [int(a) for a in sys.argv[1:]] or [16]
    raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
    m = parse_gzip_members(raw)[0]
    stream = raw[m.deflate_start : m.deflate_end]

    import functools

    @jax.jit
    def empty(x):
        return x + 1

    x = jnp.zeros(8, jnp.int32)
    t_empty = bench_fn(lambda: empty(x), reps=20)
    print(f"dispatch floor (empty jit): {t_empty:.2f} ms")

    for K in ks:
        t0 = time.time()
        mp = build_merged_plan([stream] * K)
        t_scan = (time.time() - t0) * 1e3
        plan = mp.plan
        n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
        pa = build_pa_arrays(plan)
        v9 = build_v9_arrays(mp, n_seg)
        slots = plan.slots
        sp = jnp.asarray(plan.stored_pos)
        sv = jnp.asarray(plan.stored_val)

        t0 = time.time()
        v9b = build_v9_arrays(mp, n_seg)
        t_v9 = (time.time() - t0) * 1e3

        run = prepare_merged(mp)
        t_full = bench_fn(run)

        out_mb = plan.out_size / 1e6
        print(
            f"K={K:3d} out={out_mb:7.2f} MB  host_scan={t_scan:7.1f} ms  "
            f"v9_prep={t_v9:7.1f} ms  "
            f"full={t_full:7.2f} ms  -> {out_mb / t_full:6.3f} GB/s"
        )


if __name__ == "__main__":
    main()
