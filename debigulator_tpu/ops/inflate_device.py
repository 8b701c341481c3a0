"""Device-parallel inflate: the TPU-native replacement for the reference's
serial symbol loop (reference inflate.c:1697-1909) and LZ77 copy
(inflate.c:1861-1897).

Architecture (v2 — measured on TPU v5e: gathers stream at ~200 G elem/s
while sequential XLA loop steps cost ~40 µs each, so the design is
gather-rich and loop-free):

* **Phase A — decode-graph construction + jump-pointer doubling.**
  For *every bit position* of the stream (×2 modes: next-code-is-litlen /
  next-code-is-distance) we vector-decode the canonical Huffman code that
  would start there, giving a functional graph ``NXT[state] → state`` and
  an emission table ``EMIT[state]`` (literal byte / match length / match
  distance).  This costs ~40 stream-sized gathers + a few hundred fused
  element-wise ops — all embarrassingly parallel.  The true symbol
  sequence is the orbit of the first state: we materialize it with jump
  pointers (``R_{j+1} = R_j[R_j]``), extending the sequence by powers of
  two — O(log n) gather rounds, no data-dependent loop.  End-of-block
  states (RFC 1951 §3.2.3) link to the next block's first state, so one
  orbit traverses the whole multi-block stream.
* **Phase B — LZ77 resolution by pointer doubling.**  Tokens get output
  positions from a prefix sum of output lengths; each output byte gets a
  parent pointer (itself for literals, ``i - dist`` inside matches);
  ``parent = parent[parent]`` resolves arbitrary-depth copy chains in
  O(log depth) gathers — replacing the reference's overlap-safe
  byte-by-byte copy.

Everything is integer jnp — jittable, shardable, bit-exact.  The host
supplies the block index (boundaries, code lengths, output offsets) from
the native C++ scanner (ops/scanner.py); all heavy work is device-side.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from debigulator_tpu import constants as C
from debigulator_tpu.ops.huffman import build_decode_table
from debigulator_tpu.ops.inflate_ref import BlockInfo

_LIT = 0
_DIST = 1

# EMIT packing: kind << 20 | value.
_K_LIT = 0
_K_LEN = 1
_K_DIST = 2
_K_NONE = 3
_VAL_MASK = (1 << 20) - 1


def _rev15(x):
    """Reverse the low 15 bits (SWAR cascade; branch-free analog of
    reference inflate.c:151-220 reverse_bit_order)."""
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x5555)) << 1) | ((x & jnp.uint32(0xAAAA)) >> 1)
    x = ((x & jnp.uint32(0x3333)) << 2) | ((x & jnp.uint32(0xCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x & jnp.uint32(0xF0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF)) << 8) | ((x & jnp.uint32(0xFF00)) >> 8)
    return (x >> jnp.uint32(1)).astype(jnp.int32)


@dataclasses.dataclass
class StreamPlan:
    """Host-built static plan for one DEFLATE stream."""

    data: np.ndarray  # uint8, padded
    n_bits: int  # padded bit-position count (static)
    # Stacked per-block decode tables (NB rows).
    ll_count: np.ndarray  # (NB,16)
    ll_first: np.ndarray
    ll_base: np.ndarray
    ll_syms: np.ndarray  # (NB,288)
    d_count: np.ndarray
    d_first: np.ndarray
    d_base: np.ndarray
    d_syms: np.ndarray  # (NB,32)
    block_data_start: np.ndarray  # (NB,) first-symbol bit of each block
    block_end: np.ndarray  # (NB,) end bit of each block
    block_next_entry: np.ndarray  # (NB,) state to jump to after EOB
    block_out_base: np.ndarray  # (NB,) stored-bytes inserted before block
    first_state: int
    out_size: int
    max_symbols: int  # static cap on orbit length (= usable bits + 2)
    stored_pos: np.ndarray
    stored_val: np.ndarray


def _round_pow2(n: int, lo: int = 1 << 10) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def build_stream_plan(data: bytes, blocks: list[BlockInfo], block_lengths) -> StreamPlan:
    buf = np.frombuffer(memoryview(data), np.uint8)
    nbytes_pad = _round_pow2(len(buf) + 8, 64)
    data_pad = np.zeros(nbytes_pad, np.uint8)
    data_pad[: len(buf)] = buf

    nb = len(blocks)
    ll_count = np.zeros((nb, 16), np.int32)
    ll_first = np.zeros((nb, 16), np.int32)
    ll_base = np.zeros((nb, 16), np.int32)
    ll_syms = np.zeros((nb, 288), np.int32)
    d_count = np.zeros((nb, 16), np.int32)
    d_first = np.zeros((nb, 16), np.int32)
    d_base = np.zeros((nb, 16), np.int32)
    d_syms = np.zeros((nb, 32), np.int32)
    block_data_start = np.zeros(nb, np.int32)
    block_end = np.zeros(nb, np.int32)
    block_next_entry = np.zeros(nb, np.int32)
    block_out_base = np.zeros(nb, np.int32)

    stored_pos_parts, stored_val_parts = [], []
    stored_before = 0
    usable_bits = 0

    # First compressed block's entry state; absorbing terminal = state 1
    # (position 0, dist mode — never a real entry; EMIT forced to NONE).
    terminal = 1
    first_state = terminal
    entry_states = []
    comp_ids = []
    for b, info in enumerate(blocks):
        block_data_start[b] = info.data_start_bit
        block_end[b] = info.end_bit
        block_out_base[b] = stored_before
        if info.btype == C.BTYPE_STORED:
            sb = info.data_start_bit // 8
            stored_pos_parts.append(
                np.arange(info.out_start, info.out_start + info.out_size, dtype=np.int32)
            )
            stored_val_parts.append(buf[sb : sb + info.out_size])
            stored_before += info.out_size
            entry_states.append(None)
            continue
        lengths = block_lengths[b]
        llt = build_decode_table(lengths[0])
        dt = build_decode_table(lengths[1])
        ll_count[b] = llt.count
        ll_first[b] = llt.first_code
        ll_base[b] = llt.index_base
        ll_syms[b, : len(llt.syms)] = llt.syms
        d_count[b] = dt.count
        d_first[b] = dt.first_code
        d_base[b] = dt.index_base
        d_syms[b, : len(dt.syms)] = dt.syms
        entry_states.append(info.data_start_bit * 2 + _LIT)
        comp_ids.append(b)
        usable_bits += info.end_bit - info.data_start_bit

    # Chain blocks: EOB of compressed block b jumps to the next compressed
    # block's entry (stored blocks contribute no states).
    next_entry = terminal
    for b in reversed(range(nb)):
        block_next_entry[b] = next_entry
        if entry_states[b] is not None:
            next_entry = entry_states[b]
    first_state = next_entry

    return StreamPlan(
        data=data_pad,
        n_bits=nbytes_pad * 8,
        ll_count=ll_count,
        ll_first=ll_first,
        ll_base=ll_base,
        ll_syms=ll_syms,
        d_count=d_count,
        d_first=d_first,
        d_base=d_base,
        d_syms=d_syms,
        block_data_start=block_data_start,
        block_end=block_end,
        block_next_entry=block_next_entry,
        block_out_base=block_out_base,
        first_state=first_state,
        out_size=(blocks[-1].out_start + blocks[-1].out_size) if blocks else 0,
        max_symbols=_round_pow2(usable_bits + 2, 1 << 8),
        stored_pos=(
            np.concatenate(stored_pos_parts) if stored_pos_parts else np.zeros(0, np.int32)
        ),
        stored_val=(
            np.concatenate(stored_val_parts) if stored_val_parts else np.zeros(0, np.uint8)
        ),
    )


def plan_to_device_arrays(plan: StreamPlan) -> dict:
    return {
        "data": jnp.asarray(plan.data),
        "ll_count": jnp.asarray(plan.ll_count),
        "ll_first": jnp.asarray(plan.ll_first),
        "ll_base": jnp.asarray(plan.ll_base),
        "ll_syms_flat": jnp.asarray(plan.ll_syms.reshape(-1)),
        "d_count": jnp.asarray(plan.d_count),
        "d_first": jnp.asarray(plan.d_first),
        "d_base": jnp.asarray(plan.d_base),
        "d_syms_flat": jnp.asarray(plan.d_syms.reshape(-1)),
        "block_data_start": jnp.asarray(plan.block_data_start),
        "block_end": jnp.asarray(plan.block_end),
        "block_next_entry": jnp.asarray(plan.block_next_entry),
        "block_out_base": jnp.asarray(plan.block_out_base),
        "stored_pos": jnp.asarray(plan.stored_pos),
        "stored_val": jnp.asarray(plan.stored_val),
    }


_LEN_BASE = jnp.asarray(C.LENGTH_BASE)
_LEN_EXTRA = jnp.asarray(C.LENGTH_EXTRA_BITS)
_DIST_BASE = jnp.asarray(C.DIST_BASE)
_DIST_EXTRA = jnp.asarray(C.DIST_EXTRA_BITS)


def _windows(data_u8):
    """25-bit-valid LSB windows at every bit position (pure vector ops)."""
    b = data_u8.astype(jnp.uint32)
    w = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    w = jnp.concatenate([w, jnp.zeros(3, jnp.uint32)])  # back to n_bytes
    w8 = jnp.repeat(w, 8)  # (n_bits,) word containing each bit
    shifts = jnp.tile(jnp.arange(8, dtype=jnp.uint32), w.shape[0])
    return w8 >> shifts  # ≥25 valid bits per position


def _decode_all_positions(win, block_id, count, first, base, syms_flat, stride):
    """Canonical decode of the code starting at every bit position."""
    rev = _rev15(win & jnp.uint32(0x7FFF))
    length = jnp.zeros_like(rev)
    offset = jnp.zeros_like(rev)
    for l in range(1, C.MAX_BITS + 1):
        code_l = rev >> (C.MAX_BITS - l)
        tab_idx = block_id * 16 + l
        cnt = count[tab_idx]
        fst = first[tab_idx]
        off_l = code_l - fst
        ok = (off_l >= 0) & (off_l < cnt) & (length == 0)
        length = jnp.where(ok, l, length)
        offset = jnp.where(ok, base[tab_idx] + off_l, offset)
    unmatched = length == 0
    length = jnp.where(unmatched, C.MAX_BITS, length)
    sym = syms_flat[jnp.clip(block_id * stride + offset, 0, syms_flat.shape[0] - 1)]
    sym = jnp.where(unmatched, -1, sym)
    return sym, length


def build_decode_graph(arrays, n_bits: int):
    """NXT/EMIT over the 2*n_bits state space (state = pos*2 + mode)."""
    win = _windows(arrays["data"])  # (n_bits,)
    block_data_start = arrays["block_data_start"]
    block_end = arrays["block_end"]
    # Position → block id: block b covers [data_start_b, end_b).
    pos = jnp.arange(n_bits, dtype=jnp.int32)
    block_id = jnp.searchsorted(block_end, pos, side="right").astype(jnp.int32)
    nb = block_end.shape[0]
    block_id = jnp.clip(block_id, 0, nb - 1)

    ll_sym, ll_len = _decode_all_positions(
        win, block_id,
        arrays["ll_count"].reshape(-1), arrays["ll_first"].reshape(-1),
        arrays["ll_base"].reshape(-1), arrays["ll_syms_flat"], 288,
    )
    d_sym, d_len = _decode_all_positions(
        win, block_id,
        arrays["d_count"].reshape(-1), arrays["d_first"].reshape(-1),
        arrays["d_base"].reshape(-1), arrays["d_syms_flat"], 32,
    )

    # Extra bits live right after the code: windows gathered at pos+len.
    ext_lit = win[jnp.clip(pos + ll_len, 0, n_bits - 1)]
    ext_dist = win[jnp.clip(pos + d_len, 0, n_bits - 1)]

    is_eob = ll_sym == 256
    is_len = ll_sym > 256
    li = jnp.clip(ll_sym - 257, 0, 28)
    leb = _LEN_EXTRA[li]
    lval = _LEN_BASE[li] + (ext_lit.astype(jnp.int32) & ((1 << leb) - 1))
    adv_lit = ll_len + jnp.where(is_len, leb, 0)
    # litlen-mode transition
    nxt_pos_lit = pos + adv_lit
    nxt_mode_lit = jnp.where(is_len, _DIST, _LIT)
    nxt_lit = nxt_pos_lit * 2 + nxt_mode_lit
    # EOB → next block entry (or terminal).
    nxt_lit = jnp.where(is_eob, arrays["block_next_entry"][block_id], nxt_lit)
    emit_lit = jnp.where(
        is_eob,
        (_K_NONE << 20),
        jnp.where(is_len, (_K_LEN << 20) | lval, (_K_LIT << 20) | jnp.clip(ll_sym, 0, 255)),
    )

    di = jnp.clip(d_sym, 0, 29)
    deb = _DIST_EXTRA[di]
    dval = _DIST_BASE[di] + (ext_dist.astype(jnp.int32) & ((1 << deb) - 1))
    nxt_dist = (pos + d_len + deb) * 2 + _LIT
    emit_dist = (_K_DIST << 20) | dval

    # Interleave into state-indexed arrays: state = pos*2 + mode.
    nxt = jnp.stack([nxt_lit, nxt_dist], axis=1).reshape(-1)
    emit = jnp.stack([emit_lit, emit_dist], axis=1).reshape(-1)
    # Clamp transitions into range; make state 1 absorbing+silent (terminal).
    nxt = jnp.clip(nxt, 0, 2 * n_bits - 1)
    nxt = nxt.at[1].set(1)
    emit = emit.at[1].set(_K_NONE << 20)
    return nxt, emit


def materialize_orbit(nxt, first_state, max_symbols: int):
    """States along the chain from first_state, via jump-pointer doubling.

    Fills S of length max_symbols: S[0]=first, S[k+2^j]=R_j[S[k]].
    """
    s = jnp.full(max_symbols, 1, jnp.int32)  # terminal-filled
    s = s.at[0].set(first_state)
    r = nxt
    filled = 1
    while filled < max_symbols:
        step = min(filled, max_symbols - filled)
        s = jax.lax.dynamic_update_slice(s, r[s[:step]], (filled,))
        filled += step
        if filled < max_symbols:
            r = r[r]
    return s


def resolve_output(emit_seq, seq_block, block_out_base, out_size: int,
                   stored_pos, stored_val):
    """Phase B: ordered emission sequence → output bytes."""
    kind = emit_seq >> 20
    val = emit_seq & _VAL_MASK
    is_lit = kind == _K_LIT
    is_len = kind == _K_LEN
    out_len = jnp.where(is_lit, 1, jnp.where(is_len, val, 0)).astype(jnp.int32)
    base = block_out_base[seq_block]
    cum = jnp.cumsum(out_len)
    out_pos = base + cum - out_len

    # dist of a match sits in the following sequence slot.
    dist = jnp.where(is_len, jnp.roll(val, -1), 0)

    out_val = jnp.zeros(out_size, jnp.int32)
    lit_tgt = jnp.where(is_lit, out_pos, out_size)
    out_val = out_val.at[lit_tgt].set(jnp.where(is_lit, val, 0), mode="drop")
    if stored_val.shape[0]:
        out_val = out_val.at[stored_pos].set(stored_val.astype(jnp.int32))

    i = jnp.arange(out_size, dtype=jnp.int32)
    t = jnp.searchsorted(out_pos, i, side="right") - 1
    t = jnp.clip(t, 0, out_pos.shape[0] - 1)
    covered = (out_pos[t] <= i) & (i < out_pos[t] + out_len[t]) & is_len[t]
    parent = jnp.where(covered, i - dist[t], i)

    def dbl_cond(carry):
        _, changed = carry
        return changed

    def dbl_body(carry):
        parent, _ = carry
        p2 = parent[parent]
        return p2, jnp.any(p2 != parent)

    parent, _ = jax.lax.while_loop(dbl_cond, dbl_body, (parent, jnp.bool_(True)))
    return out_val[parent].astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("n_bits", "max_symbols", "out_size")
)
def _inflate_jit(arrays, n_bits, max_symbols, out_size):
    nxt, emit = build_decode_graph(arrays, n_bits)
    seq = materialize_orbit(nxt, arrays_first_state(arrays), max_symbols)
    emit_seq = emit[seq]
    seq_block = jnp.clip(
        jnp.searchsorted(arrays["block_end"], seq >> 1, side="right"),
        0,
        arrays["block_end"].shape[0] - 1,
    ).astype(jnp.int32)
    out = resolve_output(
        emit_seq, seq_block, arrays["block_out_base"], out_size,
        arrays["stored_pos"], arrays["stored_val"],
    )
    return out


def arrays_first_state(arrays):
    return arrays["first_state"]


def inflate_device(data: bytes) -> bytes:
    """Full device inflate of one raw DEFLATE stream (host scans, TPU decodes)."""
    from debigulator_tpu.ops.scanner import scan_stream

    blocks, lengths = scan_stream(data)
    plan = build_stream_plan(data, blocks, lengths)
    if plan.first_state == 1:  # stored-only stream
        out = np.zeros(plan.out_size, np.uint8)
        out[plan.stored_pos] = plan.stored_val
        return out.tobytes()
    arrays = plan_to_device_arrays(plan)
    arrays["first_state"] = jnp.int32(plan.first_state)
    out = _inflate_jit(arrays, plan.n_bits, plan.max_symbols, plan.out_size)
    return np.asarray(out).tobytes()
