"""Sanitizer layer tests (SURVEY §5.2): checkify bounds/NaN guards catch
real defects inside jit that XLA's default clamp-and-continue semantics
would hide, and the guarded oracle pipeline stays bit-exact."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debigulator_tpu.utils.sanitize import checkified, debug_mode


def test_checkify_catches_oob_index():
    from jax.experimental import checkify

    def f(x, i):
        return x[i]

    g = checkified(jax.jit(lambda x, i: x[i]))
    x = jnp.arange(8)
    assert int(g(x, jnp.int32(3))) == 3
    with pytest.raises(checkify.JaxRuntimeError):
        g(x, jnp.int32(99))


def test_checkify_catches_nan():
    from jax.experimental import checkify

    g = checkified(lambda x: jnp.log(x))
    g(jnp.asarray(2.0))
    with pytest.raises(checkify.JaxRuntimeError):
        g(jnp.asarray(-1.0))


def test_debug_mode_restores_flag():
    prev = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == prev


def test_checkified_oracle_inflate_bit_exact():
    """The XLA oracle pipeline runs clean under checkify index guards
    (no hidden clamped gathers) and stays bit-exact."""
    from debigulator_tpu.ops import inflate_v3 as v3
    from debigulator_tpu.ops.scanner import scan_stream_cells

    data = b"sanitizer pass over the oracle pipeline " * 40
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = c.compress(data) + c.flush()
    scanned = scan_stream_cells(stream, v3.CELL_BITS)
    blocks, lengths = scanned[0], scanned[1]
    cells = scanned[2]
    plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
    arrays = v3.plan_arrays_v3(plan)
    out_pad = v3._round_pow2(max(plan.out_size, 1), 256)

    g = checkified(
        lambda a: v3._inflate_v3_jit(
            a, plan.n_bits, plan.slots, out_pad, exact=plan.exact_entries)
    )
    out, overflow, _ = g(arrays)
    assert not bool(overflow)
    assert np.asarray(out[: plan.out_size]).astype(np.uint8).tobytes() == data
