"""Mesh helpers: the comm backend is XLA collectives over ICI/DCN selected
by mesh axis placement (SURVEY §5.8) — no NCCL/MPI layer.

Axes:
  * ``dp`` — data parallel over independent work units (gzip members,
    DEFLATE blocks, PNG files/IDAT streams).  The primary axis.
  * ``sp`` — sequence parallel within one long stream: shards own
    consecutive byte ranges; cross-shard LZ77 back-references ride a
    one-hop neighbor exchange (the DEFLATE window is ≤32 KiB, so only the
    previous shard's tail matters — ring-attention-shaped, one ppermute).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp * sp} != device count {n}")
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
