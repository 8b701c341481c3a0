"""PNG host pipeline vs the compiled reference's golden RGBA outputs.

tests/golden_png.json was produced by running the reference decoder
(decode_png.c:683) over the bundled corpus and hashing its RGBA output;
gimp_test's average pixel also matches the README anchor (README.md:47).
"""

import hashlib
import json
import pathlib
import zlib

import numpy as np
import pytest

from debigulator_tpu.models import png_codec
from debigulator_tpu.ops import unfilter as uf

GOLDEN = json.loads((pathlib.Path(__file__).parent / "golden_png.json").read_text())

# Full golden sweep via the slow python-oracle inflate is too slow for the
# small-test loop; decode the small/medium files with the oracle and the rest
# with a zlib-backed inflate_fn (unfilter + expansion still ours).
SMALL = ["structuredart1", "structuredart2", "structuredart3", "font", "extraturns"]


def _zlib_inflate_fn(data: bytes):
    out = zlib.decompressobj(-15).decompress(data)

    class _B:
        end_bit = (len(data) - 4) * 8  # not used when verify_adler=False

    return out, [_B()]


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_corpus_golden(name, corpus_dir):
    path = corpus_dir / f"{name}.png"
    data = path.read_bytes()
    w, h = png_codec.get_png_width_height(data)
    assert (w, h) == (GOLDEN[name]["width"], GOLDEN[name]["height"])
    rgba = png_codec.decode_png(
        data, inflate_fn=_zlib_inflate_fn, verify_adler=False
    )
    assert rgba.shape == (h, w, 4)
    got = hashlib.sha256(rgba.tobytes()).hexdigest()
    assert got == GOLDEN[name]["sha256"], f"RGBA mismatch vs reference for {name}"


@pytest.mark.parametrize("name", SMALL)
def test_corpus_with_own_inflate(name, corpus_dir):
    """End-to-end with our own (oracle) inflate incl. Adler verification."""
    data = (corpus_dir / f"{name}.png").read_bytes()
    rgba = png_codec.decode_png(data)
    got = hashlib.sha256(rgba.tobytes()).hexdigest()
    assert got == GOLDEN[name]["sha256"]


def test_roundtrip_encode_decode():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 41, 4), dtype=np.uint8)
    # Make it compressible in places
    img[:10] = 7
    png = png_codec.encode_png(img)
    # Decode with an independent decoder path (zlib-backed inflate).
    rgba = png_codec.decode_png(png, inflate_fn=_zlib_inflate_fn, verify_adler=False)
    np.testing.assert_array_equal(rgba, img)
    # And with our own full path incl. checksum verification.
    rgba2 = png_codec.decode_png(png)
    np.testing.assert_array_equal(rgba2, img)


def test_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(1)
    for ch in (1, 2, 3):
        img = rng.integers(0, 256, (17, 23, ch), dtype=np.uint8)
        png = png_codec.encode_png(img)
        rgba = png_codec.decode_png(png)
        if ch == 3:
            np.testing.assert_array_equal(rgba[..., :3], img)
            assert (rgba[..., 3] == 255).all()
        elif ch == 1:
            for c in range(3):
                np.testing.assert_array_equal(rgba[..., c], img[..., 0])
        else:
            for c in range(3):
                np.testing.assert_array_equal(rgba[..., c], img[..., 0])
            np.testing.assert_array_equal(rgba[..., 3], img[..., 1])


def test_unfilter_matches_independent_oracle():
    """Filter then unfilter must round-trip for every filter type."""
    rng = np.random.default_rng(2)
    h, w, bpp = 13, 29, 4
    raw = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    for f in range(5):
        prev = np.zeros(w * bpp, np.uint8)
        filtered = np.empty((h, 1 + w * bpp), np.uint8)
        for y in range(h):
            filtered[y, 0] = f
            filtered[y, 1:] = uf.filter_row(raw[y], prev, bpp, f)
            prev = raw[y]
        rec = uf.unfilter_image(filtered.reshape(-1), h, w, bpp)
        np.testing.assert_array_equal(rec, raw, err_msg=f"filter {f}")


def test_filter_search_roundtrip():
    rng = np.random.default_rng(3)
    h, w, bpp = 11, 17, 4
    raw = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    filtered = uf.filter_image_best(raw.reshape(-1), h, w, bpp)
    rec = uf.unfilter_image(filtered, h, w, bpp)
    np.testing.assert_array_equal(rec, raw)


def test_crc_corruption_detected(corpus_dir):
    data = bytearray((corpus_dir / "structuredart1.png").read_bytes())
    data[40] ^= 0xFF  # clobber a byte inside IDAT/IHDR region
    with pytest.raises(Exception):
        png_codec.decode_png(bytes(data))


def test_filter_search_device_matches_host():
    import jax.numpy as jnp

    from debigulator_tpu.ops.unfilter import filter_image_best, filter_image_best_device

    rng = np.random.default_rng(9)
    h, w, bpp = 23, 31, 4
    raw = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    host = filter_image_best(raw.reshape(-1), h, w, bpp)
    dev = np.asarray(filter_image_best_device(jnp.asarray(raw.reshape(-1)), h, w, bpp))
    np.testing.assert_array_equal(host, dev)
