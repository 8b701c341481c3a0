"""Property/fuzz tests: random data through zlib (all levels/strategies)
→ our decoders → identity; corrupt-stream rejection (SURVEY §4)."""

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops.inflate_ref import InflateError, inflate
from debigulator_tpu.ops.inflate_v3 import inflate_device_v3


def _rand(rng, n, mode):
    if mode == "random":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if mode == "text":
        words = [b"alpha", b"beta", b"gamma", b"delta", b" ", b"\n"]
        return b"".join(words[rng.integers(0, len(words))] for _ in range(n // 4))
    if mode == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([rng.integers(0, 4)]) * rng.integers(1, 300)
        return bytes(out[:n])
    return bytes(n)


@pytest.mark.parametrize("seed", range(6))
def test_roundtrip_fuzz_device(seed):
    rng = np.random.default_rng(seed)
    mode = ["random", "text", "runs"][seed % 3]
    n = int(rng.integers(100, 40000))
    data = _rand(rng, n, mode)
    level = int(rng.integers(1, 10))
    strategy = [0, zlib.Z_FIXED, zlib.Z_RLE, zlib.Z_FILTERED][seed % 4]
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    comp = c.compress(data) + c.flush()
    assert inflate_device_v3(comp) == data


@pytest.mark.parametrize("seed", range(8))
def test_corrupt_streams_never_crash_oracle(seed):
    """Corrupted streams must raise InflateError or decode to *something* —
    never crash/hang (the CRC layer catches wrong output upstream)."""
    rng = np.random.default_rng(100 + seed)
    data = _rand(rng, 2000, "text")
    comp = bytearray(zlib.compress(data, 6)[2:-4])
    # flip 3 random bits
    for _ in range(3):
        i = rng.integers(0, len(comp))
        comp[i] ^= 1 << rng.integers(0, 8)
    try:
        out, _ = inflate(bytes(comp), max_output=10_000_000)
    except InflateError:
        pass  # clean rejection


def test_gzip_member_fuzz():
    import gzip as pg

    from debigulator_tpu.models.gzip_codec import decode_gzip

    rng = np.random.default_rng(7)
    parts = [_rand(rng, int(rng.integers(10, 5000)), "text") for _ in range(5)]
    blob = b"".join(pg.compress(p) for p in parts)
    assert decode_gzip(blob) == b"".join(parts)
