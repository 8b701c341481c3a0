"""CRC-32 / Adler-32 vs Python zlib on random buffers + combine algebra."""

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops import checksum as ck


@pytest.mark.parametrize("n", [0, 1, 7, 64, 255, 1000, 65537])
def test_crc32_matches_zlib(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ck.crc32(data) == zlib.crc32(data)


def test_crc32_incremental_init():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 313, dtype=np.uint8).tobytes()
    assert ck.crc32(b, ck.crc32(a)) == zlib.crc32(a + b)


def test_crc32_combine():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, 1234, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 777, dtype=np.uint8).tobytes()
    got = ck.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert got == zlib.crc32(a + b)


@pytest.mark.parametrize("n", [0, 1, 64, 1000, 65537])
def test_adler32_matches_zlib(n):
    rng = np.random.default_rng(n + 100)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ck.adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("n,length", [(64, 64), (128, 100), (1024, 1000), (256, 0)])
def test_crc32_jnp_static_length(n, length):
    import jax.numpy as jnp

    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    got = int(ck.crc32_jnp(jnp.asarray(data), length))
    assert got == zlib.crc32(data[:length].tobytes())


@pytest.mark.parametrize("n,length", [(64, 64), (1024, 999)])
def test_adler32_jnp(n, length):
    import jax.numpy as jnp

    rng = np.random.default_rng(n + 5)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    got = int(ck.adler32_jnp(jnp.asarray(data), length))
    assert got == zlib.adler32(data[:length].tobytes())
