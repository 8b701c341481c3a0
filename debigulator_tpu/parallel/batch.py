"""Data-parallel batch decode over a device mesh.

The unit of DP is an independent DEFLATE stream (gzip member, PNG IDAT,
corpus file).  Host plans are padded to common bucket shapes, stacked on a
leading batch axis, sharded ``P("dp")`` and decoded with the vmapped
single-stream pipeline inside ``shard_map`` — outputs gather in stream
order (SURVEY §2.11).

Sequence parallelism (one giant stream across devices) rides the same
pipeline: Phase B's parent pointers are global, and the DEFLATE window
bound (32 KiB, RFC 1951 §3.2.5 / reference inflate.c:748-779) means only
a one-hop neighbor tail exchange is semantically required —
``ring_tail_exchange`` is that primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from debigulator_tpu.ops import inflate_device as dv


def _pad_to(arr: np.ndarray, shape: tuple[int, ...], fill=0) -> np.ndarray:
    out = np.full(shape, fill, arr.dtype)
    out[tuple(slice(0, s) for s in arr.shape)] = arr
    return out


def stack_plans(plans: list[dv.StreamPlan]) -> tuple[dict, dict]:
    """Pad + stack per-stream plans into batched arrays.

    Returns (batched host arrays, static dims).  All streams share the
    padded static dims (max over batch, rounded to pow2 buckets).
    """
    nb_max = max(p.ll_count.shape[0] for p in plans)
    nbytes_max = max(p.data.shape[0] for p in plans)
    n_bits = nbytes_max * 8
    max_symbols = max(p.max_symbols for p in plans)
    out_max = dv._round_pow2(max(max(p.out_size, 1) for p in plans), 1 << 8)
    stored_max = max(1, max(p.stored_pos.shape[0] for p in plans))

    def stk(get, shape, fill=0):
        return np.stack([_pad_to(get(p), shape, fill) for p in plans])

    batched = {
        "data": stk(lambda p: p.data, (nbytes_max,)),
        "ll_count": stk(lambda p: p.ll_count, (nb_max, 16)),
        "ll_first": stk(lambda p: p.ll_first, (nb_max, 16)),
        "ll_base": stk(lambda p: p.ll_base, (nb_max, 16)),
        "ll_syms_flat": stk(lambda p: p.ll_syms.reshape(-1), (nb_max * 288,)),
        "d_count": stk(lambda p: p.d_count, (nb_max, 16)),
        "d_first": stk(lambda p: p.d_first, (nb_max, 16)),
        "d_base": stk(lambda p: p.d_base, (nb_max, 16)),
        "d_syms_flat": stk(lambda p: p.d_syms.reshape(-1), (nb_max * 32,)),
        "block_data_start": stk(lambda p: p.block_data_start, (nb_max,)),
        # Pad block_end with n_bits so searchsorted maps padded blocks last.
        "block_end": stk(lambda p: p.block_end, (nb_max,), fill=n_bits),
        "block_next_entry": stk(lambda p: p.block_next_entry, (nb_max,), fill=1),
        "block_out_base": stk(lambda p: p.block_out_base, (nb_max,)),
        # Padded stored positions point past out_max → dropped by scatter.
        "stored_pos": stk(lambda p: p.stored_pos, (stored_max,), fill=out_max),
        "stored_val": stk(lambda p: p.stored_val, (stored_max,)),
        "first_state": np.array([p.first_state for p in plans], np.int32),
        "out_size": np.array([p.out_size for p in plans], np.int32),
    }
    dims = {"n_bits": n_bits, "max_symbols": max_symbols, "out_size": out_max}
    return batched, dims


def _inflate_one(arrays, n_bits: int, max_symbols: int, out_size: int):
    """Single-stream core over already-device arrays (vmap-able)."""
    nxt, emit = dv.build_decode_graph(arrays, n_bits)
    seq = dv.materialize_orbit(nxt, arrays["first_state"], max_symbols)
    emit_seq = emit[seq]
    seq_block = jnp.clip(
        jnp.searchsorted(arrays["block_end"], seq >> 1, side="right"),
        0,
        arrays["block_end"].shape[0] - 1,
    ).astype(jnp.int32)
    return dv.resolve_output(
        emit_seq, seq_block, arrays["block_out_base"], out_size,
        arrays["stored_pos"], arrays["stored_val"],
    )


@functools.partial(jax.jit, static_argnames=("n_bits", "max_symbols", "out_size"))
def batched_inflate(batched, n_bits: int, max_symbols: int, out_size: int):
    """vmapped batch decode (single device)."""
    fn = functools.partial(
        _inflate_one, n_bits=n_bits, max_symbols=max_symbols, out_size=out_size
    )
    return jax.vmap(fn)(batched)


def sharded_inflate(mesh: Mesh, batched, dims, donate: bool = False):
    """DP-sharded batch decode: batch axis over ``dp``, outputs in order.

    Batch size must be divisible by the dp axis size (pad with empty
    streams if needed).
    """
    dp = mesh.shape["dp"]
    bsz = batched["data"].shape[0]
    if bsz % dp:
        raise ValueError(f"batch {bsz} not divisible by dp={dp}")
    shard = NamedSharding(mesh, P("dp"))
    dev_batched = {k: jax.device_put(v, shard) for k, v in batched.items()}

    @functools.partial(jax.jit, static_argnames=("n_bits", "max_symbols", "out_size"),
                       out_shardings=shard)
    def run(b, n_bits, max_symbols, out_size):
        fn = functools.partial(
            _inflate_one, n_bits=n_bits, max_symbols=max_symbols, out_size=out_size
        )
        return jax.vmap(fn)(b)

    return run(dev_batched, dims["n_bits"], dims["max_symbols"], dims["out_size"])


def decode_batch_device(streams: list[bytes], mesh: Mesh | None = None):
    """Decode a list of raw DEFLATE streams as one batched device call.

    Returns list of bytes.  With a mesh, the batch shards over ``dp``.
    """
    from debigulator_tpu.ops.scanner import scan_stream

    plans = []
    for s in streams:
        blocks, lengths = scan_stream(s)
        plans.append(dv.build_stream_plan(s, blocks, lengths))
    batched, dims = stack_plans(plans)
    if mesh is None:
        out = batched_inflate(
            {k: jnp.asarray(v) for k, v in batched.items()},
            dims["n_bits"], dims["max_symbols"], dims["out_size"],
        )
    else:
        dp = mesh.shape["dp"]
        pad = (-len(plans)) % dp
        if pad:
            for k in list(batched):
                reps = np.repeat(batched[k][-1:], pad, axis=0)
                batched[k] = np.concatenate([batched[k], reps])
        out = sharded_inflate(mesh, batched, dims)
    out_np = np.asarray(out)
    return [out_np[i, : plans[i].out_size].tobytes() for i in range(len(plans))]


def ring_tail_exchange(x, tail: int, axis_name: str = "sp"):
    """One-hop neighbor exchange of each shard's last `tail` elements.

    Inside shard_map: every shard receives its left neighbor's tail — the
    exact context a DEFLATE shard needs to resolve cross-boundary
    back-references (window ≤ 32 KiB).  Shard 0 receives zeros.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    shifted = jax.lax.ppermute(x[-tail:], axis_name, perm)
    return jnp.where(idx == 0, jnp.zeros_like(shifted), shifted)
