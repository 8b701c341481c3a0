"""Round-3 profile: v7 (device Phase A + v6 Phase B) vs v10 (host-fed) on the chip."""
from __future__ import annotations
import sys, time
import numpy as np
from debigulator_tpu.utils.config import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp
from debigulator_tpu.models.gzip_codec import parse_gzip_members
from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays, phase_a_pallas
from debigulator_tpu.parallel.merged import build_merged_plan, build_v9_arrays

_probe = jax.jit(lambda x: x.reshape(-1)[:8])
def sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return np.asarray(_probe(leaf))

def bench_fn(fn, reps=5):
    sync(fn())
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.time() - t0) / reps * 1e3

def main():
    ks = [int(a) for a in sys.argv[1:]] or [16]
    raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
    m = parse_gzip_members(raw)[0]
    stream = raw[m.deflate_start:m.deflate_end]
    for K in ks:
        t0 = time.time()
        mp = build_merged_plan([stream]*K)
        t_scan = (time.time()-t0)*1e3
        plan = mp.plan
        n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
        pa = build_pa_arrays(plan)
        arrays = v3.plan_arrays_v3(plan)
        slots = plan.slots
        print(f"K={K} out={plan.out_size/1e6:.2f}MB cells={plan.num_cells} slots={slots} n_seg={n_seg} host_prep={t_scan:.0f}ms", flush=True)

        # Phase A alone
        pa_jit = jax.jit(lambda pa: phase_a_pallas(pa, slots), static_argnames=())
        t_pa = bench_fn(lambda: pa_jit(pa))
        print(f"  phase A (pallas) : {t_pa:8.2f} ms", flush=True)

        # full v7
        t_v7 = bench_fn(lambda: v3._inflate_v7_jit(pa, arrays, slots, n_seg, plan.num_cells))
        gbps = plan.out_size/1e9/(t_v7/1e3)
        print(f"  v7 full (PA+PBv6): {t_v7:8.2f} ms  -> {gbps:.3f} GB/s", flush=True)

        # v10 (host-fed) for comparison
        t0 = time.time()
        v9 = build_v9_arrays(mp, n_seg)
        t_v9 = (time.time()-t0)*1e3
        sp = jnp.asarray(plan.stored_pos); sv = jnp.asarray(plan.stored_val)
        t_v10 = bench_fn(lambda: v3._inflate_v10_jit(v9, sp, sv, n_seg))
        print(f"  v10 (host-fed)   : {t_v10:8.2f} ms (+{t_v9:.0f}ms host v9prep) -> {plan.out_size/1e9/(t_v10/1e3):.3f} GB/s dev", flush=True)

        # bit-exactness of v7
        import gzip as pg
        expected = pg.decompress(raw)
        body, ovf = v3._inflate_v7_jit(pa, arrays, slots, n_seg, plan.num_cells)
        got = np.asarray(body[:plan.out_size]).astype(np.uint8)
        ok = all(got[o:o+s].tobytes() == expected for o, s in zip(mp.out_offsets, mp.out_sizes))
        print(f"  v7 bit-exact: {ok} overflow={bool(ovf)}", flush=True)

if __name__ == "__main__":
    main()
