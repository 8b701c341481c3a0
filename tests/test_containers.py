"""gzip / zlib / BMP container tests vs Python stdlib oracles."""

import gzip as pygzip
import io
import struct
import zlib

import numpy as np
import pytest

from debigulator_tpu.models import bmp_codec, gzip_codec, zlib_codec


def test_gzip_decode_simple():
    data = b"tpu gzip member " * 100
    blob = pygzip.compress(data)
    assert gzip_codec.decode_gzip(blob) == data


def test_gzip_decode_with_fname_and_comment():
    data = b"payload" * 50
    buf = io.BytesIO()
    with pygzip.GzipFile(filename="hello.txt", fileobj=buf, mode="wb") as f:
        f.write(data)
    assert gzip_codec.decode_gzip(buf.getvalue()) == data


def test_gzip_multimember():
    a, b = b"first member " * 30, b"second member " * 40
    blob = pygzip.compress(a) + pygzip.compress(b)
    assert gzip_codec.decode_gzip(blob) == a + b
    members = gzip_codec.index_members_exact(blob)
    assert len(members) == 2
    assert members[0].isize == len(a)
    assert members[1].isize == len(b)


def test_gzip_bad_crc_rejected():
    blob = bytearray(pygzip.compress(b"x" * 100))
    blob[-6] ^= 0xFF  # clobber CRC footer
    with pytest.raises(gzip_codec.GzipError):
        gzip_codec.decode_gzip(bytes(blob))


def test_gzip_encode_roundtrip_via_stdlib():
    data = b"framework gzip output must decode under stdlib " * 20
    blob = gzip_codec.encode_gzip(data)
    assert pygzip.decompress(blob) == data


def test_zlib_decode():
    data = b"zlib stream " * 200
    assert zlib_codec.decode_zlib(zlib.compress(data, 6)) == data


def test_zlib_bad_adler_rejected():
    blob = bytearray(zlib.compress(b"y" * 500))
    blob[-1] ^= 1
    with pytest.raises(zlib_codec.ZlibError):
        zlib_codec.decode_zlib(bytes(blob))


def test_zlib_encode_roundtrip_via_stdlib():
    data = b"ours->stdlib " * 37
    assert zlib.decompress(zlib_codec.encode_zlib(data)) == data


def test_zlib_fdict_rejected():
    blob = bytearray(zlib.compress(b"z" * 10))
    blob[1] |= 0x20
    # fix FCHECK
    rem = (blob[0] * 256 + blob[1]) % 31
    if rem:
        blob[1] = (blob[1] & ~0x1F) | ((blob[1] & 0x1F) + (31 - rem)) % 32
    with pytest.raises(zlib_codec.ZlibError):
        zlib_codec.parse_zlib_header(bytes(blob))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (19, 31, 4), dtype=np.uint8)
    blob = bmp_codec.encode_bmp(img)
    assert bmp_codec.get_bmp_width_height(blob) == (31, 19)
    out = bmp_codec.decode_bmp(blob)
    np.testing.assert_array_equal(out, img)


def test_bmp_corpus(corpus_dir):
    for name in ["fs_fightingpit.bmp", "fs_psychologist.bmp", "structuredart.bmp"]:
        data = (corpus_dir / name).read_bytes()
        w, h = bmp_codec.get_bmp_width_height(data)
        img = bmp_codec.decode_bmp(data)
        assert img.shape == (h, w, 4)
        # Round-trip through our encoder and back must be RGBA-bit-exact
        # (same gate as the reference's hellobmp flow, hellobmp.c:263-275).
        out = bmp_codec.decode_bmp(bmp_codec.encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_bmp_bottom_up_vs_top_down():
    img = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    blob = bytearray(bmp_codec.encode_bmp(img))  # encoder emits top-down
    out_td = bmp_codec.decode_bmp(bytes(blob))
    np.testing.assert_array_equal(out_td, img)
    # Flip sign of height → bottom-up: same bytes decode to flipped rows.
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    out_bu = bmp_codec.decode_bmp(bytes(blob))
    np.testing.assert_array_equal(out_bu, img[::-1])


def test_bmp_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
    blob = bmp_codec.encode_bmp(img)
    px = np.frombuffer(blob, np.uint8, offset=54)
    out = np.asarray(bmp_codec.decode_bmp_jnp(jnp.asarray(px), 8, 16, top_down=True))
    np.testing.assert_array_equal(out, img)
