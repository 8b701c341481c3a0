"""Pallas LZ77 resolver (interpret mode on CPU) vs the XLA resolver."""

import numpy as np
import pytest

from debigulator_tpu.ops import lz77_pallas as lz
from debigulator_tpu.ops.archive import lz77_generations as lzgen


def _mk_tape(tokens, slots=8):
    """tokens: list of ('lit', v) or ('match', len, dist) → (cells, slots)."""
    rows, row = [], []
    for t in tokens:
        if len(row) == slots:
            rows.append(row)
            row = []
        if t[0] == "lit":
            row.append(t[1])
        else:
            row.append(lz.TOK_MATCH_BIT | (t[1] << 16) | t[2])
    if row:
        rows.append(row)
    cells = len(rows)
    tape = np.full((cells, slots), -1, np.int32)
    counts = np.zeros(cells, np.int32)
    for i, r in enumerate(rows):
        tape[i, : len(r)] = r
        counts[i] = len(r)
    return tape, counts


def _expected(tokens):
    out = bytearray()
    for t in tokens:
        if t[0] == "lit":
            out.append(t[1])
        else:
            _, ln, d = t
            for _ in range(ln):
                out.append(out[-d])
    return bytes(out)


def _run(tokens, slots=8):
    tape, counts = _mk_tape(tokens, slots)
    exp = _expected(tokens)
    got = lzgen.resolve_tape_pallas(tape, counts, len(exp), interpret=True)
    assert got.tobytes() == exp, f"mismatch: {got.tobytes()[:40]} vs {exp[:40]}"


def test_literals_only():
    _run([("lit", i % 256) for i in range(100)])


def test_simple_match():
    toks = [("lit", ord(c)) for c in "abcdef"] + [("match", 4, 6)]
    _run(toks)


def test_overlap_rle():
    toks = [("lit", ord("x"))] + [("match", 50, 1)]
    _run(toks)


def test_overlap_period3():
    toks = [("lit", 1), ("lit", 2), ("lit", 3), ("match", 17, 3)]
    _run(toks)


def test_max_length_match():
    toks = [("lit", i % 256) for i in range(300)] + [("match", 258, 300)]
    _run(toks)


def test_mixed_cells():
    rng = np.random.default_rng(0)
    toks = []
    n = 0
    for _ in range(200):
        if n > 4 and rng.random() < 0.3:
            d = int(rng.integers(1, min(n, 200)))
            ln = int(rng.integers(3, 30))
            toks.append(("match", ln, d))
            n += ln
        else:
            toks.append(("lit", int(rng.integers(0, 256))))
            n += 1
    _run(toks)


def test_against_real_stream():
    """Full pipeline: v3 chase tape → pallas resolver vs zlib."""
    import zlib

    import jax

    from debigulator_tpu.ops import inflate_v3 as v3
    from debigulator_tpu.ops.scanner import scan_stream

    data = b"the pallas resolver must match zlib " * 120
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    comp = c.compress(data) + c.flush()
    blocks, lengths = scan_stream(comp)
    plan = v3.build_plan_v3(comp, blocks, lengths)
    arrays = v3.plan_arrays_v3(plan)
    nxt, meta = jax.jit(v3.build_graph_v3, static_argnames="n_bits")(
        arrays, n_bits=plan.n_bits
    )
    tape, overflow, counts, sweeps = v3.chase_cells(
        nxt, meta, arrays["cell_entry"], plan.n_bits, plan.slots,
        return_counts=True, exact=plan.exact_entries,
        cell_pend=arrays["cell_pend"],
    )
    assert not bool(overflow)
    got = lzgen.resolve_tape_pallas(
        np.asarray(tape), np.asarray(counts), plan.out_size, interpret=True
    )
    assert got.tobytes() == data
