"""Huffman construction vs RFC worked examples + the reference's golden triples."""

import numpy as np
import pytest

from debigulator_tpu import constants as C
from debigulator_tpu.ops.huffman import (
    HuffmanError,
    build_decode_table,
    build_decode_table_jnp,
    canonical_codes,
    decode_one_msb_jnp,
)


def test_rfc1951_worked_example():
    # RFC 1951 §3.2.2 example: lengths (3,3,3,3,3,2,4,4) for ABCDEFGH
    lengths = np.array([3, 3, 3, 3, 3, 2, 4, 4])
    codes = canonical_codes(lengths)
    expected = [0b010, 0b011, 0b100, 0b101, 0b110, 0b00, 0b1110, 0b1111]
    assert list(codes) == expected


def test_fixed_litlen_golden_triples():
    """The reference pins fixed-table entries with asserts (inflate.c:1119-1152):
    literal 0 → code 48 len 8; symbol 256 → code 0 len 7; symbol 280 → code 192
    len 8; literal 144 → code 400 len 9 (RFC 1951 §3.2.6)."""
    codes = canonical_codes(C.fixed_litlen_lengths())
    assert codes[0] == 48
    assert codes[143] == 48 + 143
    assert codes[144] == 400
    assert codes[255] == 400 + 111
    assert codes[256] == 0
    assert codes[279] == 23
    assert codes[280] == 192
    assert codes[287] == 199


def test_oversubscribed_rejected():
    with pytest.raises(HuffmanError):
        build_decode_table(np.array([1, 1, 1]))


def test_incomplete_allowed():
    t = build_decode_table(np.array([1, 0, 0]))
    assert not t.complete
    assert list(t.syms) == [0]


def test_decode_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        # Random valid (complete) code: build from random symbol frequencies
        # via a tiny package-merge-free approach: use zlib-ish length limits by
        # assigning lengths from a random Kraft-complete set.
        n = int(rng.integers(2, 60))
        lengths = _random_complete_lengths(rng, n)
        t = build_decode_table(lengths)
        codes = canonical_codes(lengths)
        # Decode each code via the table arithmetic.
        for sym in range(n):
            l = lengths[sym]
            if l == 0:
                continue
            code = codes[sym]
            off = code - t.first_code[l]
            assert 0 <= off < t.count[l]
            assert t.syms[t.index_base[l] + off] == sym


def _random_complete_lengths(rng, n):
    """Generate Kraft-complete code lengths for n symbols."""
    # Start with all symbols at ceil(log2 n) and greedily shorten.
    import math

    base = max(1, math.ceil(math.log2(n)))
    lengths = np.full(n, base, dtype=np.int32)
    # Kraft sum in units of 2^-15
    def kraft(ls):
        return sum((1 << (15 - l)) for l in ls if l > 0)

    full = 1 << 15
    # Lengthen random symbols until feasible
    while kraft(lengths) > full:
        i = int(rng.integers(0, n))
        if lengths[i] < 15:
            lengths[i] += 1
    # Shorten to make complete
    changed = True
    while kraft(lengths) < full and changed:
        changed = False
        order = rng.permutation(n)
        for i in order:
            if lengths[i] > 1 and kraft(lengths) + (1 << (15 - lengths[i])) <= full:
                lengths[i] -= 1
                changed = True
    assert kraft(lengths) == full
    return lengths


def test_jnp_table_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for _ in range(10):
        n = int(rng.integers(2, 40))
        lengths = _random_complete_lengths(rng, n)
        t_np = build_decode_table(lengths)
        t_j = build_decode_table_jnp(jnp.asarray(lengths), n)
        np.testing.assert_array_equal(np.asarray(t_j["count"]), t_np.count)
        np.testing.assert_array_equal(np.asarray(t_j["first_code"]), t_np.first_code)
        np.testing.assert_array_equal(np.asarray(t_j["index_base"]), t_np.index_base)
        np.testing.assert_array_equal(
            np.asarray(t_j["syms"])[: len(t_np.syms)], t_np.syms
        )
        assert not bool(t_j["oversubscribed"])


def test_jnp_oversubscription_flag():
    import jax.numpy as jnp

    t = build_decode_table_jnp(jnp.asarray(np.array([1, 1, 1], np.int32)), 3)
    assert bool(t["oversubscribed"])


def test_decode_one_msb_jnp_fixed_table():
    import jax.numpy as jnp

    lengths = C.fixed_litlen_lengths()
    codes = canonical_codes(lengths)
    t = build_decode_table_jnp(jnp.asarray(lengths), 288)
    # Build 15-bit windows whose top bits are each symbol's code.
    syms = np.arange(288)
    windows = (codes << (15 - lengths)).astype(np.int32)
    got_sym, got_len = decode_one_msb_jnp(jnp.asarray(windows), t)
    np.testing.assert_array_equal(np.asarray(got_sym), syms)
    np.testing.assert_array_equal(np.asarray(got_len), lengths)
