"""Flagship pipeline tests (interpret mode): Phase A match/run/lit tapes
+ compaction-once dense-list Phase B (v14) vs the zlib oracle.

Covers: match-heavy text, RLE chains (slow-path doubling groups),
literal-heavy fixed-Huffman streams, mixed stored/dynamic members,
multi-segment outputs (> 512 KiB), merged multi-stream batches, and the
scanner-exact slot bound (no overflow probe).
"""

import zlib

import numpy as np
import pytest

from debigulator_tpu.native import scanner as ns
from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays
from debigulator_tpu.ops.scanner import scan_stream_cells

pytestmark = pytest.mark.skipif(
    not ns.available(), reason="native library required"
)


def _deflate(data, level=6, strategy=zlib.Z_DEFAULT_STRATEGY):
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return c.compress(data) + c.flush()


def _run_v13(stream: bytes) -> bytes:
    blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
    plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
    assert plan.slots_exact, "scanner must provide the exact slot bound"
    if plan.first_state == v3.TERMINAL:
        out = np.zeros(plan.out_size, np.uint8)
        out[plan.stored_pos] = plan.stored_val
        return out.tobytes()
    pa = build_pa_arrays(plan)
    assert pa is not None
    a7 = v3.plan_arrays_v7(plan)
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    body, ovf = v3._inflate_v13_jit(
        pa, a7, plan.slots, n_seg, interpret=True
    )
    assert not bool(ovf), "overflow despite scanner-exact slots"
    return np.asarray(body[: plan.out_size]).astype(np.uint8).tobytes()


def test_text_small():
    data = b"hello world hello hello world " * 60
    assert _run_v13(_deflate(data)) == data


def test_rle_chain():
    data = b"a" * 5000 + b"bcd" * 700 + b"\x00" * 9000
    assert _run_v13(_deflate(data)) == data


def test_literal_heavy_fixed():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
    assert _run_v13(_deflate(data, strategy=zlib.Z_FIXED)) == data


@pytest.mark.slow
def test_mixed_stored_dynamic():
    rng = np.random.default_rng(3)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta "]
    text = b"".join(words[int(v) % 4] for v in rng.integers(0, 4, 20_000))
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    st = c.compress(text) + c.flush(zlib.Z_FULL_FLUSH)
    c0 = zlib.compressobj(0, zlib.DEFLATED, -15)
    st += c0.compress(b"STORED" * 2000) + c0.flush(zlib.Z_FULL_FLUSH)
    c2 = zlib.compressobj(9, zlib.DEFLATED, -15)
    st += c2.compress(text[::-1]) + c2.flush()
    full = text + b"STORED" * 2000 + text[::-1]
    assert _run_v13(st) == full


@pytest.mark.slow
def test_multi_segment_gzipsample(corpus_dir):
    import gzip

    raw = (corpus_dir / "gzipsample.gz").read_bytes()
    from debigulator_tpu.models.gzip_codec import parse_gzip_members

    m = parse_gzip_members(raw)[0]
    assert _run_v13(raw[m.deflate_start : m.deflate_end]) == gzip.decompress(raw)


@pytest.mark.slow
def test_merged_batch_v13():
    from debigulator_tpu.parallel.merged import decode_merged

    rng = np.random.default_rng(4)
    words = [b"merge ", b"batch ", b"op ", b"tape "]
    datas = [
        b"".join(words[int(v) % 4] for v in rng.integers(0, 4, 8000 + 500 * i))
        for i in range(3)
    ]
    streams = [_deflate(d, level=1 + i) for i, d in enumerate(datas)]
    outs = decode_merged(streams)
    assert outs == datas


def test_merged_flush_heavy_fixed_trim():
    """Regression (round-4 ADVICE item 1): fixed-Huffman flush-heavy
    streams pad up to 61 net bits per block on the cell-aligned virtual
    stream, so a plan's used virtual extent can EXCEED 8*len(stream).
    Trimming the merged plan to the raw byte length dropped live cells
    and silently corrupted every merged decode of such streams."""
    from debigulator_tpu.parallel.merged import decode_merged

    piece = b"flush-heavy block content of 66 bytes padding padding paddingXY\n"
    c = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    parts, data = [], b""
    for _ in range(800):
        parts.append(c.compress(piece))
        parts.append(c.flush(zlib.Z_PARTIAL_FLUSH))
        data += piece
    parts.append(c.flush())
    stream = b"".join(parts)
    plan = v3.build_plan_v3(stream, *scan_stream_cells(stream, v3.CELL_BITS)[:2],
                            cells=scan_stream_cells(stream, v3.CELL_BITS)[2])
    assert plan.used_bits > 8 * len(stream)  # the hazardous shape
    (out,) = decode_merged([stream])
    assert out == data
    # And mixed with a normal stream (exercises the per-stream rebase).
    normal = _deflate(b"normal text " * 500)
    outs = decode_merged([stream, normal])
    assert outs == [data, b"normal text " * 500]


@pytest.mark.slow
def test_v14_experiment_matches_v13():
    """The v14 Phase B experiment (compaction-once + dense-list walk)
    stays bit-exact vs the flagship on a mixed stream."""
    data = (b"experiment " * 900 + b"\x00" * 4000
            + bytes(np.random.default_rng(9).integers(0, 256, 3000,
                                                      dtype=np.uint8)))
    stream = _deflate(data)
    blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
    plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
    pa = build_pa_arrays(plan)
    a7 = v3.plan_arrays_v7(plan)
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    from debigulator_tpu.ops.archive import inflate_generations as v3gen

    body, ovf = v3gen._inflate_v14_jit(pa, a7, plan.slots, n_seg,
                                    interpret=True)
    assert not bool(ovf)
    got = np.asarray(body[: plan.out_size]).astype(np.uint8).tobytes()
    assert got == data


def _stored_mix_stream(text_kb: int, stored_kb: int, tail_kb: int):
    rng = np.random.default_rng(13)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta "]
    t1 = b"".join(words[int(v) % 4]
                  for v in rng.integers(0, 4, text_kb * 170))[: text_kb * 1024]
    mid = rng.integers(0, 256, stored_kb * 1024, dtype=np.uint8).tobytes()
    t2 = b"".join(words[int(v) % 4]
                  for v in rng.integers(0, 4, tail_kb * 170))[: tail_kb * 1024]
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    st = c.compress(t1) + c.flush(zlib.Z_FULL_FLUSH)
    c0 = zlib.compressobj(0, zlib.DEFLATED, -15)
    st += c0.compress(mid) + c0.flush(zlib.Z_FULL_FLUSH)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    st += c.compress(t2) + c.flush()
    return st, t1 + mid + t2


def test_segment_ranges_monotone_with_stored_blocks():
    """Regression (r3 review): tile-padding cells must repeat the last
    stored-offset — a zero fill made the glue's cbase/cell_end arrays
    non-monotone whenever stored blocks exist, silently corrupting
    searchsorted segment ranges on multi-segment outputs."""
    st, data = _stored_mix_stream(40, 60, 40)
    blocks, lengths, cells = scan_stream_cells(st, v3.CELL_BITS)
    plan = v3.build_plan_v3(st, blocks, lengths, cells=cells)
    pa = build_pa_arrays(plan)
    bob = np.asarray(pa["cellw"])[4].astype(np.int64)
    # Emulate the glue's cumsum on host: outlen of padding cells is 0, so
    # monotonicity of bob alone (given non-decreasing decoded cum) is the
    # invariant that matters.
    assert (np.diff(bob) >= 0).all(), "cellw[4] stored offsets not monotone"
    assert bob[-1] == bob[plan.num_cells - 1], "padding must repeat last bob"


@pytest.mark.slow
def test_multi_segment_with_stored_blocks():
    """Full repro for the searchsorted regression: > one 512 KiB segment
    AND large stored blocks in the same stream."""
    st, data = _stored_mix_stream(300, 400, 300)
    assert len(data) > v3.SEG_BYTES  # must span >= 2 segments
    assert _run_v13(st) == data


@pytest.mark.slow
def test_long_stream_chunked_window_carry():
    """Streams over the v15 run-meta cap decode via bounded flagship
    chunks with the 32 KiB window carried on device between calls
    (VERDICT r4 item 7 follow-through: a 4096^2 PNG's 80 MB scanline
    stream exceeds the per-call cap).  Forced tiny cap => many chunks;
    matches crossing chunk boundaries resolve through the carried tail."""
    rng = np.random.default_rng(5)
    data = (bytes(rng.integers(0, 64, 600_000, dtype=np.uint8))
            + b"repeat me " * 6000)
    stream = _deflate(data)
    blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
    assert len(blocks) >= 3
    out, n = v3.inflate_device_long_stream(stream, blocks, lengths, cells,
                                           cap_rows=4096)
    assert np.asarray(out[:n]).astype(np.uint8).tobytes() == data
