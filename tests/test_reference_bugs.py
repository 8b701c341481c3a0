"""The two corpus PNGs whose goldens intentionally differ from the
compiled reference stay PROVABLY intentional (VERDICT r4 item 9).

tests/golden_png.json marks backgrounddetailed1 and phoebus as
`matches_reference: False`.  These tests pin the exact mechanism of each
divergence so the delta can never silently drift:

* **backgrounddetailed1** (color type 2): the reference runs its
  RGB->RGBA expansion loop (decode_png.c:1512-1535) INSIDE the row loop,
  re-expanding the whole image once per scanline; rows after the first
  therefore unfilter against expanded (wrong) previous-scanline bytes.
  Modeling exactly that interleaving (dense unfilter writes + full-image
  back-to-front expansion after every row) reproduces the reference's
  output byte-for-byte, while the spec decode matches PIL.

* **phoebus** (color type 6): the reference's non-overlap LZ77 fast path
  copies `total_length * sizeof(uint32_t)` bytes (inflate.c:1868, SURVEY
  2.10.2); when dist < 4*length the memcpy overlaps its own destination
  (undefined behavior) and corrupts isolated bytes of the trailing RLE
  run feeding the image's last row.  Its own standalone inflate on the
  same payload (different buffer alignment) is bit-exact with zlib, so
  the corruption is UB-alignment-dependent — not modelable from spec.
  tests/phoebus_reference_diff.json records the divergence measured from
  the compiled reference on this platform: exactly 188 bytes, all in the
  last row's RLE tail; everywhere else we match the reference, and at
  the divergent positions the spec answer (filter 2 with zero residuals
  => copy of the previous row) is what we produce.
"""

import hashlib
import json
import os
import struct
import zlib

import numpy as np
import pytest

RES = "/root/reference/resources"
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_png.json")))


def _idat(path: str) -> bytes:
    d = open(path, "rb").read()
    pos, idat = 8, b""
    while pos < len(d):
        ln, typ = struct.unpack_from(">I4s", d, pos)
        if typ == b"IDAT":
            idat += d[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return idat


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _reference_type2_decode(raw: np.ndarray, w: int, h: int) -> bytes:
    """Bit-exact model of decode_png.c's color-type-2 path: the dense
    3-byte-per-pixel unfilter (a/b/c read from the CURRENT buffer state,
    decode_png.c:1422-1507) interleaved with the per-row FULL-IMAGE
    back-to-front RGB->RGBA expansion (decode_png.c:1512-1535)."""
    n = w * h
    buf = np.zeros(4 * n, np.int32)
    stride = 3 * w + 1
    for row in range(h):
        ft = raw[row * stride]
        rb = raw[row * stride + 1 : (row + 1) * stride]
        base = row * 3 * w
        for i in range(3 * w):
            pos = base + i
            a = int(buf[pos - 3]) if i >= 3 else 0
            b = int(buf[pos - 3 * w]) if row > 0 else 0
            c = int(buf[pos - 3 * w - 3]) if (row > 0 and i >= 3) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            buf[pos] = (int(rb[i]) + pred) & 0xFF
        # The bug: expansion of the WHOLE image after EVERY row.  The
        # back-to-front in-place loop always reads ahead of its writes,
        # so it equals this vectorized gather from the pre-state.
        new = np.empty(4 * n, np.int32)
        new[0::4] = buf[0 : 3 * n : 3]
        new[1::4] = buf[1 : 3 * n : 3]
        new[2::4] = buf[2 : 3 * n : 3]
        new[3::4] = 255
        buf = new
    return buf.astype(np.uint8).tobytes()


@pytest.mark.slow
def test_backgrounddetailed1_delta_is_the_expansion_bug():
    raw = np.frombuffer(zlib.decompress(_idat(f"{RES}/backgrounddetailed1.png")),
                        np.uint8)
    modeled = _reference_type2_decode(raw, 500, 500)
    g = GOLDEN["backgrounddetailed1"]
    assert not g["matches_reference"]
    # Modeling the reference's defect reproduces its output exactly...
    assert hashlib.sha256(modeled).hexdigest() == g["reference_sha256"]
    # ...and the spec decode (== PIL, see golden builder) is our golden.
    from debigulator_tpu.models import png_codec

    ours = png_codec.decode_png(
        open(f"{RES}/backgrounddetailed1.png", "rb").read())
    assert hashlib.sha256(ours.tobytes()).hexdigest() == g["sha256"]
    assert hashlib.sha256(modeled).hexdigest() != g["sha256"]


@pytest.mark.slow
def test_phoebus_delta_is_the_overcopy_corruption():
    fix = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "phoebus_reference_diff.json")))
    pos = np.asarray(fix["positions"])
    refv = np.asarray(fix["reference_values"], np.uint8)
    from debigulator_tpu.models import png_codec

    ours = png_codec.decode_png(open(f"{RES}/phoebus.png", "rb").read())
    g = GOLDEN["phoebus"]
    assert hashlib.sha256(ours.tobytes()).hexdigest() == g["sha256"]
    flat = ours.reshape(-1)
    # Reconstruct the reference's output from ours + the recorded
    # divergence; it must hash to the reference golden — i.e. we match
    # the reference EVERYWHERE except the 188 recorded bytes.
    ref = flat.copy()
    ref[pos] = refv
    assert hashlib.sha256(ref.tobytes()).hexdigest() == g["reference_sha256"]
    # Every divergent byte is in the last row, and the spec answer there
    # is a copy of the previous row (filter 2, zero residuals): OUR
    # bytes obey it; the reference's corrupted bytes do not.
    h, w = 1024, 1024
    assert (pos // (w * 4) == h - 1).all()
    raw = np.frombuffer(zlib.decompress(_idat(f"{RES}/phoebus.png")), np.uint8)
    stride = w * 4 + 1
    last = raw[(h - 1) * stride : h * stride]
    assert last[0] == 2  # Up filter
    assert (last[1:][pos % (w * 4)] == 0).all()  # zero residuals
    assert (flat[pos] == flat[pos - w * 4]).all()  # ours == previous row
    assert not (ref[pos] == ref[pos - w * 4]).all()
