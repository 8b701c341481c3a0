"""Data-parallel batch decode over a device mesh (v3 engine).

The unit of DP is an independent DEFLATE stream (gzip member, PNG IDAT,
corpus file).  Host plans (exact scanner entries, rebased virtual streams)
are padded to common bucket shapes, stacked on a leading batch axis,
sharded ``P("dp")`` and decoded with the vmapped v3 pipeline inside
``shard_map`` — outputs gather in stream order (SURVEY §2.11).

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

from debigulator_tpu.ops import inflate_v3 as v3


def _pad_to(arr: np.ndarray, shape: tuple[int, ...], fill=0) -> np.ndarray:
    out = np.full(shape, fill, arr.dtype)
    out[tuple(slice(0, s) for s in arr.shape)] = arr
    return out


def stack_plans(plans: list[v3.PlanV3]) -> tuple[dict, dict]:
    """Pad + stack per-stream v3 plans into batched arrays."""
    nb_max = max(p.ll_count.shape[0] for p in plans)
    n_bits = max(p.n_bits for p in plans)
    cells_max = n_bits // v3.CELL_BITS
    nbytes = n_bits // 8 + 16
    out_max = v3._round_pow2(max(max(p.out_size, 1) for p in plans), 1 << 8)
    stored_max = max(1, max(p.stored_pos.shape[0] for p in plans))
    slots = max(p.slots for p in plans)
    assert all(p.exact_entries for p in plans), "batch path needs exact entries"

    def stk(get, shape, fill=0):
        return np.stack([_pad_to(get(p), shape, fill) for p in plans])

    batched = {
        "vbytes": stk(lambda p: p.vbytes, (nbytes,)),
        "cell_block": stk(lambda p: p.cell_block, (cells_max,)),
        "cell_entry": stk(lambda p: p.cell_entry, (cells_max,), fill=-1),
        "cell_pend": stk(lambda p: p.cell_pend, (cells_max,)),
        "ll_count": stk(lambda p: p.ll_count, (nb_max, 16)),
        "ll_first": stk(lambda p: p.ll_first, (nb_max, 16)),
        "ll_base": stk(lambda p: p.ll_base, (nb_max, 16)),
        "ll_aug_flat": stk(lambda p: p.ll_aug.reshape(-1), (nb_max * 288,)),
        "d_count": stk(lambda p: p.d_count, (nb_max, 16)),
        "d_first": stk(lambda p: p.d_first, (nb_max, 16)),
        "d_base": stk(lambda p: p.d_base, (nb_max, 16)),
        "d_aug_flat": stk(lambda p: p.d_aug.reshape(-1), (nb_max * 32,)),
        "block_next_entry": stk(
            lambda p: p.block_next_entry, (nb_max,), fill=v3.TERMINAL
        ),
        "bne_cell": stk(
            lambda p: p.block_next_entry[p.cell_block].astype(np.int32),
            (cells_max,), fill=v3.TERMINAL,
        ),
        "block_out_base": stk(lambda p: p.block_out_base, (nb_max,)),
        "stored_pos": stk(lambda p: p.stored_pos, (stored_max,), fill=out_max),
        "stored_val": stk(lambda p: p.stored_val, (stored_max,)),
    }
    dims = {"n_bits": n_bits, "slots": slots, "out_size": out_max}
    return batched, dims


def _inflate_one(arrays, n_bits: int, slots: int, out_size: int):
    """Single-stream v3 core (vmap-able, exact entries)."""
    nxt, meta = v3.build_graph_v3(arrays, n_bits)
    tape, overflow, sweeps = v3.chase_cells(
        nxt, meta, arrays["cell_entry"], n_bits, slots,
        exact=True, cell_pend=arrays["cell_pend"],
    )
    out = v3.resolve_tape_xla(
        tape, arrays["cell_block"], arrays["block_out_base"], out_size,
        arrays["stored_pos"], arrays["stored_val"],
    )
    return out, overflow


@functools.partial(jax.jit, static_argnames=("n_bits", "slots", "out_size"))
def batched_inflate(batched, n_bits: int, slots: int, out_size: int):
    """vmapped batch decode (single device)."""
    fn = functools.partial(
        _inflate_one, n_bits=n_bits, slots=slots, out_size=out_size
    )
    return jax.vmap(fn)(batched)


def sharded_inflate(mesh: Mesh, batched, dims):
    """DP-sharded batch decode: batch axis over ``dp``, outputs in order."""
    dp = mesh.shape["dp"]
    bsz = batched["vbytes"].shape[0]
    if bsz % dp:
        raise ValueError(f"batch {bsz} not divisible by dp={dp}")
    shard = NamedSharding(mesh, P("dp"))
    dev_batched = {k: jax.device_put(v, shard) for k, v in batched.items()}

    @functools.partial(
        jax.jit, static_argnames=("n_bits", "slots", "out_size"),
        out_shardings=(shard, shard),
    )
    def run(b, n_bits, slots, out_size):
        fn = functools.partial(
            _inflate_one, n_bits=n_bits, slots=slots, out_size=out_size
        )
        return jax.vmap(fn)(b)

    return run(dev_batched, dims["n_bits"], dims["slots"], dims["out_size"])


def plan_streams(streams: list[bytes]) -> list[v3.PlanV3]:
    from debigulator_tpu.ops.scanner import scan_stream_cells

    plans = []
    for s in streams:
        blocks, lengths, cells = scan_stream_cells(s, v3.CELL_BITS)
        if cells is None:
            raise RuntimeError(
                "batch decode requires the native scanner (exact entries)"
            )
        plans.append(v3.build_plan_v3(s, blocks, lengths, cells=cells))
    return plans


def decode_batch_device(streams: list[bytes], mesh: Mesh | None = None,
                        slots: int | None = None):
    """Decode a list of raw DEFLATE streams as one batched device call.

    Retries once with the exact per-cell slot bound on tape overflow.
    """
    plans = plan_streams(streams)
    if slots is not None:
        for p in plans:
            p.slots = slots
    batched, dims = stack_plans(plans)
    if mesh is None:
        out, overflow = batched_inflate(
            {k: jnp.asarray(v) for k, v in batched.items()},
            dims["n_bits"], dims["slots"], dims["out_size"],
        )
    else:
        dp = mesh.shape["dp"]
        pad = (-len(plans)) % dp
        if pad:
            for k in list(batched):
                reps = np.repeat(batched[k][-1:], pad, axis=0)
                batched[k] = np.concatenate([batched[k], reps])
        out, overflow = sharded_inflate(mesh, batched, dims)
    if bool(np.asarray(overflow).any()):
        if slots == v3.CELL_BITS:
            raise RuntimeError("tape overflow at exact slot bound (bug)")
        return decode_batch_device(streams, mesh=mesh, slots=v3.CELL_BITS)
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
