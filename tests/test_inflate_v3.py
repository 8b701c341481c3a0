"""v3 gather-minimal device inflate vs zlib: bit-exactness on all block types."""

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops.inflate_v3 import inflate_device_v3


def _raw(data: bytes, level=6, strategy=0, memlevel=8) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15, memlevel, strategy)
    return c.compress(data) + c.flush()


@pytest.mark.parametrize("level", [1, 6, 9])
def test_random_data(level):
    rng = np.random.default_rng(level)
    data = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    assert inflate_device_v3(_raw(data, level)) == data


def test_compressible_text():
    data = b"the quick brown fox jumps over the lazy dog " * 500
    assert inflate_device_v3(_raw(data, 9)) == data


def test_fixed_huffman():
    data = b"hello hello hello world " * 100
    assert inflate_device_v3(_raw(data, 6, zlib.Z_FIXED)) == data


def test_stored_blocks():
    data = bytes(range(256)) * 100
    assert inflate_device_v3(_raw(data, 0)) == data


def test_multi_block_stream():
    big = np.random.default_rng(0).integers(0, 256, 60000, dtype=np.uint8).tobytes()
    comp = _raw(big, 6, 0, 1)
    assert inflate_device_v3(comp) == big


def test_mixed_stored_and_dynamic_blocks():
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    data = b"hello world " * 300 + bytes(range(256)) * 10
    comp = c.compress(data[:2000]) + c.flush(zlib.Z_FULL_FLUSH)
    comp += c.compress(data[2000:]) + c.flush()
    assert inflate_device_v3(comp) == data


def test_overlapping_backrefs_rle():
    data = b"a" * 10000 + b"bc" * 2000 + b"a" * 500
    assert inflate_device_v3(_raw(data, 9)) == data


def test_long_distance_refs():
    rng = np.random.default_rng(7)
    block = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    data = block + b"x" * 30000 + block
    assert inflate_device_v3(_raw(data, 9)) == data


def test_tape_overflow_retry():
    # Highly dense literal stream (1-ish bits/sym impossible, but RLE text
    # gives many symbols per cell) with tiny slots forces the retry path.
    data = b"aaaabbbb" * 2000
    comp = _raw(data, 9)
    assert inflate_device_v3(comp, slots=2) == data


def test_gzipsample_corpus(corpus_dir):
    import gzip as pygzip

    raw = (corpus_dir / "gzipsample.gz").read_bytes()
    expected = pygzip.decompress(raw)
    from debigulator_tpu.models.gzip_codec import parse_gzip_members

    m = parse_gzip_members(raw)[0]
    got = inflate_device_v3(raw[m.deflate_start : m.deflate_end])
    assert got == expected


def test_empty_and_tiny():
    assert inflate_device_v3(_raw(b"")) == b""
    assert inflate_device_v3(_raw(b"x")) == b"x"
    assert inflate_device_v3(_raw(b"abc")) == b"abc"
