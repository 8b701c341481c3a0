"""Canonical Huffman code construction and decode tables.

RFC 1951 §3.2.2 construction.  Replaces the reference's hashed-probe decoder
(reference inflate.c:494-557 `huffman_to_hashmap`, inflate.c:421-474
`hashed_huffman_decode`) with the flat canonical form: per-length
(count, first_code, index_base) plus a symbol permutation sorted by
(code length, symbol).  Decoding a code is then 15 branch-free compares and
one gather — the natural shape for data-parallel decode on TPU.

Two implementations:

* ``build_decode_table`` — NumPy, used by the host oracle and for
  precomputing the fixed tables.
* ``build_decode_table_jnp`` — pure jnp, jittable with traced code-length
  arrays (dynamic-Huffman blocks build their tables on device).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from debigulator_tpu.constants import MAX_BITS


@dataclasses.dataclass
class DecodeTable:
    """Canonical-Huffman decode table (host form).

    Attributes:
      count: (16,) number of codes of each length (count[0] unused/0).
      first_code: (16,) smallest MSB-first code value of each length.
      index_base: (16,) exclusive prefix sum of count — offset into syms.
      syms: (num_codes,) symbols sorted by (code length, symbol).
      max_len / min_len: bounds over assigned code lengths.
      complete: True if the code exactly fills the code space.
    """

    count: np.ndarray
    first_code: np.ndarray
    index_base: np.ndarray
    syms: np.ndarray
    max_len: int
    min_len: int
    complete: bool


class HuffmanError(ValueError):
    pass


def build_decode_table(lengths: np.ndarray) -> DecodeTable:
    """Build a canonical decode table from per-symbol code lengths.

    Raises HuffmanError on an over-subscribed code (more codes than the
    prefix space allows — same rejection as reference inflate.c:651-672).
    Incomplete codes are permitted (a stream that *uses* an unassigned code
    fails at decode time).
    """
    lengths = np.asarray(lengths, dtype=np.int32)
    if lengths.ndim != 1:
        raise HuffmanError("lengths must be 1-D")
    if np.any(lengths < 0) or np.any(lengths > MAX_BITS):
        raise HuffmanError("code length out of range")
    count = np.bincount(lengths, minlength=MAX_BITS + 1).astype(np.int64)
    count[0] = 0

    # RFC 1951 §3.2.2: next_code[bits] = (next_code[bits-1]+bl_count[bits-1])<<1
    first_code = np.zeros(MAX_BITS + 1, dtype=np.int64)
    code = 0
    left = 1  # remaining code space, in units of codes of current length
    for bits in range(1, MAX_BITS + 1):
        code = (code + count[bits - 1]) << 1
        first_code[bits] = code
        left = (left << 1) - count[bits]
        if left < 0:
            raise HuffmanError(f"over-subscribed code at length {bits}")
    complete = left == 0

    index_base = np.zeros(MAX_BITS + 1, dtype=np.int64)
    index_base[1:] = np.cumsum(count)[:-1]

    nonzero = np.nonzero(lengths)[0]
    order = np.argsort(lengths[nonzero], kind="stable")
    syms = nonzero[order].astype(np.int32)

    assigned = np.nonzero(count)[0]
    max_len = int(assigned.max()) if assigned.size else 0
    min_len = int(assigned.min()) if assigned.size else 0
    return DecodeTable(
        count=count.astype(np.int32),
        first_code=first_code.astype(np.int32),
        index_base=index_base.astype(np.int32),
        syms=syms,
        max_len=max_len,
        min_len=min_len,
        complete=complete,
    )


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Per-symbol MSB-first canonical code values (encoder side).

    Returns (len(lengths),) int32; entries with length 0 are 0.
    """
    t = build_decode_table(np.asarray(lengths))
    codes = np.zeros(len(lengths), dtype=np.int32)
    next_code = t.first_code.astype(np.int64).copy()
    for sym, l in enumerate(np.asarray(lengths, dtype=np.int32)):
        if l:
            codes[sym] = next_code[l]
            next_code[l] += 1
    return codes


# ---------------------------------------------------------------------------
# jnp (device, jittable) form
# ---------------------------------------------------------------------------


def build_decode_table_jnp(lengths: jnp.ndarray, num_syms: int):
    """Jittable canonical decode-table construction.

    Args:
      lengths: (num_syms,) int32 code lengths (0 = unused), may be traced.
      num_syms: static symbol count.

    Returns a dict of jnp arrays:
      count (16,), first_code (16,), index_base (16,),
      syms (num_syms,) symbol permutation (padded with 0 past the last code),
      oversubscribed: () bool — true if the code is invalid.
    """
    lengths = lengths.astype(jnp.int32)
    count = jnp.bincount(lengths, length=MAX_BITS + 1)
    count = count.at[0].set(0)

    # first_code[l] = sum_{k<l} count[k] << (l-k)   (l >= 1)
    # Vectorized over the 16x16 (l, k) grid — tiny, static.
    l_idx = jnp.arange(MAX_BITS + 1)[:, None]
    k_idx = jnp.arange(MAX_BITS + 1)[None, :]
    shift = jnp.where(l_idx > k_idx, l_idx - k_idx, 0)
    contrib = jnp.where(l_idx > k_idx, count[None, :] << shift, 0)
    first_code = jnp.sum(contrib, axis=1).astype(jnp.int32)

    # Over-subscription: for each l, first_code[l] + count[l] <= 2^l must hold.
    capacity = (jnp.int32(1) << jnp.arange(MAX_BITS + 1)).astype(jnp.int32)
    used = first_code + count
    oversub = jnp.any((count > 0) & (used > capacity))

    index_base = (jnp.cumsum(count) - count).astype(jnp.int32)

    # Symbol permutation: stable sort by length with len==0 keyed to +inf.
    sym_ids = jnp.arange(num_syms, dtype=jnp.int32)
    sort_key = jnp.where(lengths > 0, lengths, MAX_BITS + 1) * (num_syms + 1) + sym_ids
    syms = sym_ids[jnp.argsort(sort_key)]

    return {
        "count": count.astype(jnp.int32),
        "first_code": first_code,
        "index_base": index_base,
        "syms": syms.astype(jnp.int32),
        "oversubscribed": oversub,
    }


def decode_one_msb_jnp(window15, table):
    """Decode one code from a 15-bit MSB-first window (vectorizable).

    Args:
      window15: int32 array (any shape) — the next 15 stream bits, first
        stream bit in the MSB (bit 14).
      table: dict from build_decode_table_jnp.

    Returns (sym, length): decoded symbol and its code length; length 0
    means no valid code matched (corrupt stream / unassigned code).
    """
    count = table["count"]
    first_code = table["first_code"]
    index_base = table["index_base"]
    syms = table["syms"]

    length = jnp.zeros_like(window15)
    offset = jnp.zeros_like(window15)
    for l in range(1, MAX_BITS + 1):
        code_l = window15 >> (MAX_BITS - l)
        off_l = code_l - first_code[l]
        ok = (off_l >= 0) & (off_l < count[l]) & (length == 0)
        length = jnp.where(ok, l, length)
        offset = jnp.where(ok, index_base[l] + off_l, offset)
    sym = syms[offset]
    sym = jnp.where(length > 0, sym, -1)
    return sym, length
