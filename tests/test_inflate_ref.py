"""Oracle inflate vs Python zlib: all three block types + the bundled corpus."""

import gzip as pygzip
import zlib

import numpy as np
import pytest

from debigulator_tpu.ops.inflate_ref import InflateError, inflate


def _raw_deflate(data: bytes, level=6, strategy=0) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return c.compress(data) + c.flush()


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_random_data_levels(level):
    rng = np.random.default_rng(level)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    out, blocks = inflate(_raw_deflate(data, level))
    assert out == data
    assert blocks[-1].bfinal


def test_stored_blocks():
    data = bytes(range(256)) * 300  # level 0 → stored blocks
    comp = _raw_deflate(data, 0)
    out, blocks = inflate(comp)
    assert out == data
    assert all(b.btype == 0 for b in blocks)


def test_fixed_huffman():
    data = b"hello hello hello world " * 50
    comp = _raw_deflate(data, 6, zlib.Z_FIXED)
    out, blocks = inflate(comp)
    assert out == data
    assert all(b.btype == 1 for b in blocks)


def test_dynamic_huffman_compressible():
    data = (b"the quick brown fox jumps over the lazy dog " * 200)
    comp = _raw_deflate(data, 9)
    out, blocks = inflate(comp)
    assert out == data
    assert any(b.btype == 2 for b in blocks)


def test_overlapping_backrefs():
    # d=1 run (RLE-style) exercises the overlap copy semantics.
    data = b"a" * 10000 + b"bc" * 3000
    out, _ = inflate(_raw_deflate(data))
    assert out == data


def test_block_index_consistency():
    data = bytes(np.random.default_rng(3).integers(0, 256, 200000, dtype=np.uint8))
    # Force multiple blocks via small memLevel
    c = zlib.compressobj(6, zlib.DEFLATED, -15, 1)
    comp = c.compress(data) + c.flush()
    out, blocks = inflate(comp)
    assert out == data
    # Blocks tile the output contiguously.
    at = 0
    for b in blocks:
        assert b.out_start == at
        at += b.out_size
    assert at == len(out)
    # Bit ranges are increasing and non-overlapping.
    for a, b in zip(blocks, blocks[1:]):
        assert a.end_bit == b.start_bit


def test_corrupt_stream_rejected():
    data = _raw_deflate(b"hello world" * 100)
    bad = bytearray(data)
    bad[0] ^= 0x07  # clobber BTYPE/BFINAL
    with pytest.raises(InflateError):
        # May also "succeed" decoding garbage for some corruptions of later
        # bytes, but clobbering the first block header to BTYPE=3 must raise.
        bad[0] |= 0x06
        inflate(bytes(bad))


def test_gzipsample_corpus(corpus_dir):
    raw = (corpus_dir / "gzipsample.gz").read_bytes()
    expected = pygzip.decompress(raw)
    # Strip the 10-byte header (no optional fields in this file → verified in
    # container tests) and the 8-byte footer.
    from debigulator_tpu.models.gzip_codec import parse_gzip_members

    members = parse_gzip_members(raw)
    assert len(members) == 1
    m = members[0]
    out, blocks = inflate(raw[m.deflate_start : m.deflate_end])
    assert out == expected
    assert len(out) == m.isize
    assert zlib.crc32(out) == m.crc32
    assert len(blocks) == 5  # SURVEY §6: 5 dynamic-Huffman blocks
