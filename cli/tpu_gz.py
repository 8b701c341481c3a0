#!/usr/bin/env python
"""tpu_gz — gzip decode/encode CLI (parity target: reference hellogz.c).

  python cli/tpu_gz.py decode file.gz [-o out] [--host] [--repeat N]
  python cli/tpu_gz.py encode file    [-o out.gz]

--repeat N reproduces hellogz.c's stress loop (hellogz.c:64-74) as a
throughput measurement.
"""

from __future__ import annotations

import argparse
import os
import sys

# Standalone-script convenience: make the repo root importable when run as
# `python cli/tpu_gz.py` (sys.path[0] is cli/ in that mode).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu_gz")
    ap.add_argument("-v", "--verbose", action="count", default=0,
                    help="decode summaries (-v) / phase debug (-vv)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("decode")
    d.add_argument("file")
    d.add_argument("-o", "--output")
    d.add_argument("--host", action="store_true", help="host oracle path")
    d.add_argument("--repeat", type=int, default=1)
    d.add_argument("--no-verify", action="store_true")
    d.add_argument("--trace", metavar="LOGDIR", nargs="?",
                   const="/tmp/dbg_trace",
                   help="capture a jax.profiler device trace around the "
                        "steady-state decode and print the top ops")
    e = sub.add_parser("encode")
    e.add_argument("file")
    e.add_argument("-o", "--output")
    args = ap.parse_args(argv)
    if args.verbose:
        from debigulator_tpu.utils.config import get_config

        get_config().verbosity = max(get_config().verbosity, args.verbose)

    from debigulator_tpu.utils.config import setup_jax_cache

    if args.cmd == "decode":
        data = open(args.file, "rb").read()
        verify = not args.no_verify
        if args.host:
            from debigulator_tpu.models.gzip_codec import decode_gzip

            fn = lambda: decode_gzip(data, verify=verify)
        else:
            setup_jax_cache()
            from debigulator_tpu.models.pipeline import decode_gzip_device

            fn = lambda: decode_gzip_device(data, verify=verify)
        t0 = time.time()
        out = fn()
        first = time.time() - t0
        if getattr(args, "trace", None):
            from debigulator_tpu.utils.profiling import (
                device_trace,
                trace_op_summary,
            )

            with device_trace(args.trace) as logdir:
                out = fn()
            sys.stderr.write(f"trace written to {logdir}; top ops:\n")
            for ms, name in trace_op_summary(logdir, top=10):
                sys.stderr.write(f"  {ms:9.2f} ms  {name}\n")
        if args.repeat > 1:
            t0 = time.time()
            for _ in range(args.repeat - 1):
                out = fn()
            dt = (time.time() - t0) / (args.repeat - 1)
        else:
            dt = first
        sys.stderr.write(
            f"{args.file}: {len(data)} -> {len(out)} bytes; "
            f"first {first*1e3:.1f} ms, steady {dt*1e3:.1f} ms "
            f"({len(out)/dt/1e6:.1f} MB/s out)\n"
        )
        if args.output:
            open(args.output, "wb").write(out)
        else:
            sys.stdout.buffer.write(out[:4096])
        return 0

    data = open(args.file, "rb").read()
    from debigulator_tpu.models.gzip_codec import encode_gzip

    t0 = time.time()
    blob = encode_gzip(data, fname=args.file.rsplit("/", 1)[-1].encode())
    dt = time.time() - t0
    out_path = args.output or args.file + ".gz"
    open(out_path, "wb").write(blob)
    sys.stderr.write(
        f"{args.file}: {len(data)} -> {len(blob)} bytes "
        f"({len(blob)/max(len(data),1):.3f}x) in {dt*1e3:.1f} ms -> {out_path}\n"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
