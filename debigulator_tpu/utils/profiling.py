"""Tracing / profiling hooks (SURVEY §5.1).

The reference's observability is wall-clock printf (hellopng.c:210-236,
build.sh:34 xctrace recipe).  Here: jax.profiler traces (Perfetto/
TensorBoard) around any pipeline section, named scopes per phase, and a
trace summarizer used to attribute device time to ops.  (Host-side
phase timing lives in utils.logging.PhaseLog.)
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/dbg_trace"):
    """Capture a device profiler trace around the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Named scope for kernels: shows up in traces (phase labels)."""
    import jax

    return jax.named_scope(name)


def trace_op_summary(logdir: str, top: int = 15) -> list[tuple[float, str]]:
    """Parse a captured trace into (total_ms, op_name) rows — the tool used
    throughout this framework's own optimization (see commit log)."""
    import glob
    import gzip
    import json

    agg: dict[str, float] = {}
    for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("dur", 0) > 100:
                agg[e.get("name", "?")] = agg.get(e.get("name", "?"), 0) + e["dur"]
    rows = sorted(((v / 1e3, k) for k, v in agg.items()), reverse=True)
    return rows[:top]
