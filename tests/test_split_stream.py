"""Sequence-parallel (split-stream) decode tests — SURVEY §5.7.

Covers the taint-exact shard split + ring-tail patch rounds layer
(parallel/split_stream.py): bit-exactness vs zlib for shard-crossing
matches, RLE chains that force patch rounds > 1, stored blocks at shard
boundaries, more shards than output (the ADVICE r2 IndexError repro),
and the shard_map path on a 4-device CPU mesh.
"""

import zlib

import numpy as np
import pytest

from debigulator_tpu.native import scanner as ns

pytestmark = pytest.mark.skipif(
    not ns.available(), reason="native library required"
)

SEG = 32768  # smallest legal seg_bytes (== DEFLATE window)


def _deflate(data: bytes, level: int = 6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _textish(n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"lazy", b"dog",
             b"deflate", b"huffman", b"window", b"shard", b"tail"]
    out = []
    total = 0
    while total < n:
        w = words[int(rng.integers(len(words)))]
        out.append(w + b" ")
        total += len(w) + 1
    return b"".join(out)[:n]


def _check(data: bytes, n_shards: int, level: int = 6):
    from debigulator_tpu.parallel.split_stream import decode_split_emulated

    stream = _deflate(data, level)
    got = decode_split_emulated(stream, n_shards, seg_bytes=SEG)
    assert got == data


def test_emulated_2_shards_text():
    _check(_textish(100_000), 2)


@pytest.mark.slow
def test_emulated_4_shards_text():
    _check(_textish(150_000), 4)


@pytest.mark.slow
def test_rle_chain_forces_patch_rounds():
    """A stream-long RLE run taints every shard's tail: rounds == n-1."""
    from debigulator_tpu.parallel.split_stream import (
        decode_split_emulated,
        plan_split_stream,
    )

    data = b"ab" * 60_000  # 120 KB of pure RLE chain
    stream = _deflate(data)
    plan = plan_split_stream(stream, 3, seg_bytes=SEG)
    assert plan.rounds >= 2, "RLE chain must require transitive patching"
    assert decode_split_emulated(stream, 3, seg_bytes=SEG) == data


@pytest.mark.slow
def test_taint_decay_single_round():
    """Mostly-incompressible data: no taint chain reaches a shard tail,
    so one patch round suffices (and it still decodes bit-exact)."""
    from debigulator_tpu.parallel.split_stream import (
        decode_split_emulated,
        plan_split_stream,
    )

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
    stream = _deflate(data)
    plan = plan_split_stream(stream, 4, seg_bytes=SEG)
    assert plan.rounds <= 1
    assert decode_split_emulated(stream, 4, seg_bytes=SEG) == data


@pytest.mark.slow
def test_more_shards_than_output():
    """ADVICE r2 repro: shard_bytes rounding leaves trailing shards empty
    (real shards < n_shards); must not crash and must stay bit-exact."""
    _check(_textish(100_000), 6)


@pytest.mark.slow
def test_stored_blocks_at_boundaries():
    """Mix stored (level 0) and compressed chunks across shard bounds."""
    parts = [_textish(40_000, seed=1), b"\x00" * 30_000, _textish(40_000, 2)]
    data = b"".join(parts)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = c.compress(parts[0]) + c.flush(zlib.Z_FULL_FLUSH)
    c0 = zlib.compressobj(0, zlib.DEFLATED, -15)
    stream += c0.compress(parts[1]) + c0.flush(zlib.Z_FULL_FLUSH)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream += c.compress(parts[2]) + c.flush()
    assert zlib.decompress(stream, -15) == data  # stream sanity
    from debigulator_tpu.parallel.split_stream import decode_split_emulated

    assert decode_split_emulated(stream, 3, seg_bytes=SEG) == data


@pytest.mark.slow
def test_shard_map_4_devices():
    """Full shard_map path: 4 sp shards over the CPU mesh, ppermute tails."""
    from debigulator_tpu.parallel.mesh import make_mesh
    from debigulator_tpu.parallel.split_stream import decode_split_stream

    data = _textish(150_000, seed=3)
    stream = _deflate(data)
    mesh = make_mesh(dp=2, sp=4)
    assert decode_split_stream(stream, mesh=mesh, seg_bytes=SEG) == data
