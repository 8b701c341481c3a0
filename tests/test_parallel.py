"""Sharded batch decode on the 8-device CPU mesh (DP) + ring exchange (SP)."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debigulator_tpu.parallel import batch as pb
from debigulator_tpu.parallel.mesh import make_mesh


def _raw(data: bytes, level=6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _mk_streams(n, seed=0):
    rng = np.random.default_rng(seed)
    datas, streams = [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            d = rng.integers(0, 256, int(rng.integers(100, 3000)), dtype=np.uint8).tobytes()
        elif kind == 1:
            d = b"repetitive content " * int(rng.integers(10, 200))
        else:
            d = bytes(range(256)) * int(rng.integers(1, 20))
        datas.append(d)
        streams.append(_raw(d, level=int(rng.integers(1, 10))))
    return datas, streams


def test_batched_inflate_single_device():
    datas, streams = _mk_streams(5)
    outs = pb.decode_batch_device(streams)
    for d, o in zip(datas, outs):
        assert o == d


def test_sharded_inflate_dp8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(dp=8)
    datas, streams = _mk_streams(16, seed=1)
    outs = pb.decode_batch_device(streams, mesh=mesh)
    for d, o in zip(datas, outs):
        assert o == d


def test_sharded_inflate_uneven_batch():
    mesh = make_mesh(dp=8)
    datas, streams = _mk_streams(5, seed=2)  # 5 % 8 != 0 → internal pad
    outs = pb.decode_batch_device(streams, mesh=mesh)
    for d, o in zip(datas, outs):
        assert o == d


def test_ring_tail_exchange_semantics():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=1, sp=8)
    n, tail = 64, 4
    x = jnp.arange(8 * n, dtype=jnp.int32)

    def f(xs):
        xs = xs.reshape(-1)
        return pb.ring_tail_exchange(xs, tail)

    got = shard_map(f, mesh=mesh, in_specs=P("sp"), out_specs=P("sp"))(x)
    got = np.asarray(got).reshape(8, tail)
    # Shard i>0 receives shard i-1's last `tail` elements; shard 0 zeros.
    np.testing.assert_array_equal(got[0], np.zeros(tail))
    for i in range(1, 8):
        exp = np.arange(i * n - tail, i * n)
        np.testing.assert_array_equal(got[i], exp)


@pytest.mark.slow
def test_merged_plan_decode():
    from debigulator_tpu.parallel.merged import decode_merged

    datas, streams = _mk_streams(7, seed=5)
    # add an empty stream and a stored-only stream
    import zlib as z

    c = z.compressobj(0, z.DEFLATED, -15)
    datas.append(b"stored body " * 40)
    streams.append(c.compress(datas[-1]) + c.flush())
    outs = decode_merged(streams)
    for d, o in zip(datas, outs):
        assert o == d
