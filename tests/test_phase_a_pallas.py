"""Fused Pallas Phase A kernel vs the XLA decode graph + chase.

Gate: identical token tapes/counts and bit-exact final output on real and
synthetic DEFLATE streams (reference semantics: inflate.c:786-1909)."""

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.ops import phase_a_pallas as pa_mod
from debigulator_tpu.ops.scanner import scan_stream_cells


def _plan_for(stream: bytes):
    blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
    return v3.build_plan_v3(stream, blocks, lengths, cells=cells)


def _streams():
    raw = open("/root/reference/resources/gzipsample.gz", "rb").read()
    from debigulator_tpu.models.gzip_codec import parse_gzip_members

    m = parse_gzip_members(raw)[0]
    yield "gzipsample", raw[m.deflate_start : m.deflate_end], None

    rng = np.random.default_rng(7)
    text = bytes(rng.integers(97, 123, 40_000, dtype=np.uint8))
    rep = (text[:997] * 50)[:30_000]
    for name, data, level in [
        ("rand-l9", text, 9),
        ("rep-l6", rep, 6),
        ("rand-l1", text[:5_000], 1),
    ]:
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        s = co.compress(data) + co.flush()
        yield name, s, data


@pytest.mark.parametrize("case", list(_streams()), ids=lambda c: c[0])
@pytest.mark.slow
def test_tape_matches_xla(case):
    name, stream, _ = case
    plan = _plan_for(stream)
    assert plan.exact_entries
    pa = pa_mod.build_pa_arrays(plan)
    assert pa is not None, "page window should cover these streams"
    arrays = v3.plan_arrays_v3(plan)

    tape_ref, _, counts_ref, _ = v3._tape_v3_jit(
        arrays, plan.n_bits, plan.slots, exact=True
    )
    tape, counts = pa_mod.phase_a_pallas(pa, plan.slots, interpret=True)
    tape = np.asarray(tape)[: plan.num_cells]
    counts = np.asarray(counts)[: plan.num_cells]
    np.testing.assert_array_equal(counts, np.asarray(counts_ref))
    # Compare only committed slots (beyond-count slots are -1 in both).
    np.testing.assert_array_equal(tape, np.asarray(tape_ref))


@pytest.mark.parametrize("case", list(_streams()), ids=lambda c: c[0])
@pytest.mark.slow
def test_v7_end_to_end(case):
    name, stream, expected = case
    if expected is None:
        expected = zlib.decompress(stream, -15)
    plan = _plan_for(stream)
    pa = pa_mod.build_pa_arrays(plan)
    arrays = v3.plan_arrays_v3(plan)
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    body, overflow = v3._inflate_v7_jit(
        pa, arrays, plan.slots, n_seg, plan.num_cells, interpret=True
    )
    assert not bool(overflow)
    got = np.asarray(body[: plan.out_size]).astype(np.uint8).tobytes()
    assert got == expected
