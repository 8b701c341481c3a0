#!/usr/bin/env python
"""tpu_bmp — BMP decode/encode CLI (parity: reference hellobmp.c).

  python cli/tpu_bmp.py roundtrip a.bmp [-o out.bmp]
  python cli/tpu_bmp.py info a.bmp
"""

from __future__ import annotations

import argparse
import os
import sys

# Standalone-script convenience: make the repo root importable when run as
# `python cli/tpu_bmp.py` (sys.path[0] is cli/ in that mode).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu_bmp")
    ap.add_argument("-v", "--verbose", action="count", default=0,
                    help="decode summaries (-v) / phase debug (-vv)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("roundtrip")
    r.add_argument("file")
    r.add_argument("-o", "--output")
    i = sub.add_parser("info")
    i.add_argument("file")
    args = ap.parse_args(argv)
    if args.verbose:
        from debigulator_tpu.utils.config import get_config

        get_config().verbosity = max(get_config().verbosity, args.verbose)

    from debigulator_tpu.models import bmp_codec
    from debigulator_tpu.utils.preview import summary

    data = open(args.file, "rb").read()
    if args.cmd == "info":
        w, h = bmp_codec.get_bmp_width_height(data)
        print(f"{args.file}: {w}x{h}")
        return 0
    img = bmp_codec.decode_bmp(data)
    blob = bmp_codec.encode_bmp(img)
    img2 = bmp_codec.decode_bmp(blob)
    good = bool((img == img2).all())
    sys.stderr.write(
        f"{args.file}: {summary(img)} roundtrip="
        f"{'bit-exact' if good else 'MISMATCH'}\n"
    )
    if args.output:
        open(args.output, "wb").write(blob)
    return 0 if good else 1


if __name__ == "__main__":
    sys.exit(main())
