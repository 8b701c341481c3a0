"""Round-3 profile: flagship v13 (device PA op-tapes + op-walk PB) breakdown."""
from __future__ import annotations
import sys, time
import numpy as np
from debigulator_tpu.utils.config import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp
from debigulator_tpu.models.gzip_codec import parse_gzip_members
from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays, phase_a13_pallas
from debigulator_tpu.parallel.merged import build_merged_plan, prepare_merged

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
    import gzip as pg
    expected = pg.decompress(raw)
    for K in ks:
        t0 = time.time()
        mp = build_merged_plan([stream]*K, records=False)
        t_scan = (time.time()-t0)*1e3
        plan = mp.plan
        n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
        t0 = time.time()
        pa = build_pa_arrays(plan)
        a7 = v3.plan_arrays_v7(plan)
        sync(pa["cellw"])  # force staging
        t_stage = (time.time()-t0)*1e3
        slots = plan.slots
        print(f"K={K} out={plan.out_size/1e6:.2f}MB cells={plan.num_cells} slots={slots} n_seg={n_seg} host={t_scan:.0f}ms stage={t_stage:.0f}ms", flush=True)

        pa_jit = jax.jit(lambda pa: phase_a13_pallas(pa, slots))
        t_pa = bench_fn(lambda: pa_jit(pa))
        print(f"  phase A13 alone    : {t_pa:8.2f} ms", flush=True)

        t_full = bench_fn(lambda: v3._inflate_v13_jit(pa, a7, slots, n_seg))
        gbps = plan.out_size/1e9/(t_full/1e3)
        print(f"  flagship v13 full : {t_full:8.2f} ms -> {gbps:.3f} GB/s device", flush=True)

        body, ovf = v3._inflate_v13_jit(pa, a7, slots, n_seg)
        got = np.asarray(body[:plan.out_size]).astype(np.uint8)
        ok = all(got[o:o+s].tobytes() == expected for o, s in zip(mp.out_offsets, mp.out_sizes))
        print(f"  bit-exact: {ok} overflow={bool(ovf)}", flush=True)

if __name__ == "__main__":
    main()
