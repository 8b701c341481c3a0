"""TPU-native encoder core (ops.deflate_encode_jnp): correctness gates.

The device core (elementwise distance-ladder lengths + on-device greedy
walk) must produce streams that decode bit-exact; size-vs-stb is gated
in test_encoder_vs_reference for the host encoder and measured for the
device core in bench.py (gimp filtered rows: 61,547 B vs stb's 68,632).
"""

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops.deflate_encode_jnp import (
    deflate_fixed_device,
    lz77_parse_device,
)


@pytest.mark.parametrize(
    "name,data",
    [
        ("text", b"the quick brown fox jumps over the lazy dog " * 200),
        ("zeros", bytes(6000)),
        ("cycle4", b"abcd" * 2000),
        ("random", bytes(np.random.RandomState(7).randint(
            0, 256, 4096, dtype=np.uint8))),
        ("tiny", b"abc"),
        ("stride", bytes(np.tile(np.arange(33, dtype=np.uint8), 300))),
    ],
)
def test_device_encode_roundtrip(name, data):
    out = deflate_fixed_device(data, stride=33)
    assert zlib.decompress(out, -15) == bytes(data)


def test_device_parse_token_stream_reconstructs():
    data = np.frombuffer(b"aaaabbbbccccaaaabbbb" * 50, np.uint8)
    lit, mlen, mdist = lz77_parse_device(data, stride=20)
    out = bytearray()
    for v, l, d in zip(lit, mlen, mdist):
        if v >= 0:
            out.append(int(v))
        else:
            start = len(out) - int(d)
            for k in range(int(l)):
                out.append(out[start + k])
    assert bytes(out) == data.tobytes()


def test_mined_distances_general_match_search():
    """Input-adaptive candidates (VERDICT r4 item 6): sampled 4-gram
    hashing adds the data's real repeat distances to the device scan,
    so structured data with periods outside the static ladder still
    compresses.  Random bytes with prime period 977: the static ladder
    finds ZERO matches (stored fallback); mining finds the period and
    the stream compresses ~36x, still decoding bit-exact."""
    from debigulator_tpu.ops.deflate_encode_jnp import (
        lz77_select_device,
        mine_distances,
    )

    rng = np.random.default_rng(1)
    block = bytes(rng.integers(0, 256, 977, dtype=np.uint8))
    data = block * 60
    arr = np.frombuffer(data, np.uint8)
    assert 977 in mine_distances(arr)
    sel_static, _, _ = lz77_select_device(arr, mine=False)
    assert len(sel_static) == 0
    out = deflate_fixed_device(data)
    assert zlib.decompress(out, -15) == data
    assert len(out) < len(data) // 30
