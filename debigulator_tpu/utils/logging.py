"""Structured logging / observability (SURVEY §5.5).

The reference narrates with compile-time-gated printf (inflate.c:846-850,
decode_png.c:1279-1283 behind *_SILENCE).  Here: one tiny structured
logger honoring the runtime ``Config.verbosity`` (0 silent, 1 summaries,
2 debug), emitting `[dbg] event key=value ...` lines to stderr — greppable
and machine-parseable without a logging-framework dependency.

Decode pipelines emit per-item summaries (dims, block counts, checksum
status, timings) at verbosity >= 1; phase-level detail at >= 2.
"""

from __future__ import annotations

import sys
import time


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.3f}"
    return str(v)


def log(level: int, event: str, **fields) -> None:
    """Emit one structured line iff Config.verbosity >= level."""
    from debigulator_tpu.utils.config import get_config

    if get_config().verbosity < level:
        return
    kv = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
    sys.stderr.write(f"[dbg] {event}{' ' if kv else ''}{kv}\n")


class PhaseLog:
    """Section timing that both logs (verbosity >= 2, per phase) and
    accumulates a summary dict for verbosity >= 1 callers."""

    def __init__(self, event: str):
        self.event = event
        self.t0 = time.time()
        self.phases: list[tuple[str, float]] = []
        self._last = self.t0

    def mark(self, name: str) -> None:
        now = time.time()
        self.phases.append((name, now - self._last))
        self._last = now
        log(2, f"{self.event}.{name}", ms=(now - self.t0) * 1e3)

    def done(self, **fields) -> None:
        total = time.time() - self.t0
        detail = {f"{n}_ms": dt * 1e3 for n, dt in self.phases}
        log(1, self.event, total_ms=total * 1e3, **detail, **fields)
