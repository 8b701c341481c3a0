"""Capture a device trace of the flagship v15 pipeline and print the
per-op time attribution (the evidence tool behind PERF_NOTES.md).

Usage: python tools/trace_v15.py [K]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# The trace tool is the ONE sanctioned user of the attribution-only
# DBG_V15_SKIP flags; acknowledge before phase_b_v15 imports (it fails
# closed without this — outputs are wrong with any section skipped).
if os.environ.get("DBG_V15_SKIP"):
    os.environ["DBG_V15_SKIP_ACK"] = "unsafe"

from debigulator_tpu.utils.config import setup_jax_cache

setup_jax_cache()

import jax  # noqa: E402

from debigulator_tpu.parallel.merged import build_merged_plan, prepare_merged  # noqa: E402
from debigulator_tpu.utils.profiling import device_trace, trace_op_summary  # noqa: E402


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    import gzip as pg
    import zlib

    raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
    base = pg.decompress(raw)
    streams = []
    for i in range(K):
        rot = (i * 40961) % len(base)
        content = base[rot:] + base[:rot]
        c = zlib.compressobj(6 + (i % 4), zlib.DEFLATED, -15)
        streams.append(c.compress(content) + c.flush())

    probe = jax.jit(lambda x: x.reshape(-1)[:8])
    mp = build_merged_plan(streams, records=False)
    run = prepare_merged(mp)
    np.asarray(probe(run()))  # warm

    t0 = time.time()
    for _ in range(3):
        body = run()
    np.asarray(probe(body))
    dt = (time.time() - t0) / 3
    print(f"device/batch: {dt*1e3:.1f} ms  -> {mp.plan.out_size/dt/1e9:.3f} GB/s")

    import os

    if os.environ.get("DBG_NOTRACE"):
        return

    logdir = "/tmp/dbg_trace_v15"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    with device_trace(logdir):
        for _ in range(3):
            body = run()
        np.asarray(probe(body))
    for ms, name in trace_op_summary(logdir, top=25):
        print(f"{ms/3:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
