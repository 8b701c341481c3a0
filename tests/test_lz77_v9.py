"""v10 group-driven pipeline: packed match groups + host literals.

The v10 Phase B consumes conflict-free groups of 8 match copies packed by
the native scanner (dbg_pack_groups) and literal runs as copy pieces over
the scanner's dense literal-byte array (reference analog: the symbol loop
at inflate.c:1697-1909, here split host-index/device-execute).  All tests
run the real kernel in interpret mode on CPU and gate on bit-exactness vs
Python zlib.
"""

import random
import zlib

import numpy as np
import pytest

from debigulator_tpu.native import scanner as native_scanner
from debigulator_tpu.ops import inflate_v3 as v3

pytestmark = pytest.mark.skipif(
    not native_scanner.available(), reason="native scanner unavailable"
)


def _deflate(data: bytes, level: int = 6, strategy=zlib.Z_DEFAULT_STRATEGY):
    co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return co.compress(data) + co.flush()


def _decode_v9(streams):
    from debigulator_tpu.ops.archive.host_fed import build_v9_arrays
    from debigulator_tpu.parallel.merged import build_merged_plan

    mp = build_merged_plan(streams)
    assert mp.recs is not None, "native records required"
    plan = mp.plan
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    v9 = build_v9_arrays(mp, n_seg)
    assert v9 is not None
    import jax.numpy as jnp

    from debigulator_tpu.ops.archive.inflate_generations import _inflate_v10_jit

    body = _inflate_v10_jit(
        v9, jnp.asarray(plan.stored_pos), jnp.asarray(plan.stored_val),
        n_seg, interpret=True,
    )
    out = np.asarray(body[: plan.out_size]).astype(np.uint8)
    return [
        out[o : o + s].tobytes()
        for o, s in zip(mp.out_offsets, mp.out_sizes)
    ]


def test_scanner_records_match_oracle():
    """Record reconstruction (numpy) is bit-exact: literal runs index the
    device tape exactly where the chase writes them."""
    data = (b"the quick brown fox jumps over the lazy dog " * 200)
    stream = _deflate(data)
    blocks, lengths, cells, recs = native_scanner.scan_stream_records(
        stream, v3.CELL_BITS
    )
    plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
    arrays = v3.plan_arrays_v3(plan)
    tape, overflow, counts, _ = v3._tape_v3_jit(
        arrays, plan.n_bits, 64, exact=True
    )
    tape = np.asarray(tape)
    out = np.zeros(recs["out_size"], np.int32)
    for pos, cell, jl in zip(recs["r_pos"], recs["r_cell"], recs["r_j0len"]):
        j0, ln = jl >> 8, jl & 0xFF
        out[pos : pos + ln] = tape[cell, j0 : j0 + ln] & 0x1FF
    for pos, meta in zip(recs["m_pos"], recs["m_meta"]):
        ln, dist = meta >> 16, meta & 0xFFFF
        for k in range(ln):
            out[pos + k] = out[pos + k - dist]
    assert out.astype(np.uint8).tobytes() == data


@pytest.mark.parametrize("level", [1, 6, 9])
def test_v9_single_stream_levels(level):
    data = bytes(
        "".join(random.Random(level).choice("abcdefgh \n") for _ in range(20000)),
        "ascii",
    )
    got = _decode_v9([_deflate(data, level)])
    assert got == [data]


@pytest.mark.slow
def test_v9_batch_mixed():
    rng = random.Random(7)
    datas = [
        b"a" * 30000,                                  # deep RLE chains
        bytes(rng.randbytes(4000)),                    # stored blocks
        (b"hello world " * 1000),                      # match-heavy
        "".join(rng.choice("0123456789abcdef")
                for _ in range(30000)).encode(),       # literal-heavy
        b"",                                           # empty stream
    ]
    streams = [_deflate(d, 6) for d in datas]
    got = _decode_v9(streams)
    assert got == [bytes(d) for d in datas]


def test_v9_stored_mixed_with_huffman():
    """Stored blocks interleaved with compressed blocks (flush forces
    block boundaries; level 0 members are stored-only)."""
    rng = random.Random(9)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    parts = []
    data = b""
    for i in range(5):
        chunk = (b"repeat me " * 200) if i % 2 else bytes(rng.randbytes(2000))
        data += chunk
        parts.append(co.compress(chunk))
        parts.append(co.flush(zlib.Z_FULL_FLUSH))
    parts.append(co.flush())
    stream = b"".join(parts)
    got = _decode_v9([stream])
    assert got == [data]


@pytest.mark.slow
def test_v9_segment_boundary_crossing():
    """Matches and runs crossing SEG_BYTES boundaries split correctly:
    output larger than one segment with matches straddling the edge."""
    rng = random.Random(11)
    base = bytes(rng.randbytes(97)) * ((v3.SEG_BYTES + 200000) // 97 + 1)
    data = base[: v3.SEG_BYTES + 190000]
    got = _decode_v9([_deflate(data, 6)])
    assert got == [data]


def test_v9_window_carry_across_segments():
    """Back-references reaching into the previous output segment resolve
    through the carried 32 KiB window tail."""
    rng = random.Random(13)
    head = bytes(rng.randbytes(30000))
    # Repeat the head far apart so late matches reference old output.
    data = head + bytes(rng.randbytes(v3.SEG_BYTES - 15000)) + head
    got = _decode_v9([_deflate(data, 9)])
    assert got == [data]


@pytest.mark.slow
def test_v9_gzipsample(corpus_dir):
    import gzip as pg

    raw = (corpus_dir / "gzipsample.gz").read_bytes()
    expected = pg.decompress(raw)
    from debigulator_tpu.models.gzip_codec import parse_gzip_members

    m = parse_gzip_members(raw)[0]
    stream = raw[m.deflate_start : m.deflate_end]
    got = _decode_v9([stream, stream])
    assert got == [expected, expected]
