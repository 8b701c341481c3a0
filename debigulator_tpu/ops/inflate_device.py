"""Device-parallel inflate: the TPU-native replacement for the reference's
serial symbol loop (reference inflate.c:1697-1909) and LZ77 copy
(inflate.c:1861-1897).

Architecture (SURVEY §7, PAPERS.md rapidgzip / parallel-Huffman):

* **Phase A — lane-parallel Huffman decode with exact self-sync.**  Each
  DEFLATE block's bit range is cut into fixed-size chunks; every chunk is a
  vector lane.  Lanes decode speculatively from their chunk's first bit
  (assuming literal/length mode).  A fixpoint loop then feeds each lane the
  previous lane's exit state (bit position + litlen/dist mode) and
  re-chases until no entry changes.  Huffman streams self-synchronize, so
  this converges in a couple of sweeps; because convergence is *checked*,
  the result is exact — correctness never depends on speculation
  succeeding (worst case it degrades to one chunk per sweep).
* **Phase B — LZ77 resolution by pointer doubling.**  Tokens get output
  positions from a prefix sum of their output lengths; every output byte
  gets a parent pointer (itself for literals, `i - dist` for match bytes);
  `parent = parent[parent]` until fixpoint resolves arbitrary-depth copy
  chains in O(log depth) gathers — replacing the reference's overlap-safe
  byte-by-byte copy.

Everything is integer jnp ops (gathers, scatters, scans) — jittable,
shardable, bit-exact.  The host supplies a block index (boundaries, code
lengths, output offsets) from the native scanner; all heavy work is here.
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

# Chunk size in bits for speculative lanes.
DEFAULT_CHUNK_BITS = 512

_LIT = 0  # next code is literal/length
_DIST = 1  # next code is distance

# Packed token encoding: val (9 bits: literal byte or match length) |
# dist << 9 (0 ⇒ literal).  Empty tape slots hold -1.
_VAL_BITS = 9
_VAL_MASK = (1 << _VAL_BITS) - 1


def _rev15(x):
    """Reverse the low 15 bits (SWAR cascade; the branch-free analog of
    reference inflate.c:151-220 reverse_bit_order)."""
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x5555)) << 1) | ((x & jnp.uint32(0xAAAA)) >> 1)
    x = ((x & jnp.uint32(0x3333)) << 2) | ((x & jnp.uint32(0xCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x & jnp.uint32(0xF0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF)) << 8) | ((x & jnp.uint32(0xFF00)) >> 8)
    return x >> jnp.uint32(1)  # 16-bit reversal → 15-bit


@dataclasses.dataclass
class StreamPlan:
    """Host-built static plan for one DEFLATE stream (shapes are static)."""

    # Compressed stream bytes, padded.
    data: np.ndarray  # uint8 (n_bytes_pad,)
    # Per-block stacked decode tables.
    litlen_count: np.ndarray  # (NB, 16) int32
    litlen_first: np.ndarray
    litlen_base: np.ndarray
    litlen_syms: np.ndarray  # (NB, 288)
    dist_count: np.ndarray
    dist_first: np.ndarray
    dist_base: np.ndarray
    dist_syms: np.ndarray  # (NB, 32)
    # Per-chunk arrays (C_total,).
    chunk_start: np.ndarray  # int32 bit offsets
    chunk_end: np.ndarray
    chunk_block: np.ndarray  # block id of each chunk
    chunk_first: np.ndarray  # bool: first chunk of its block
    chunk_entry0: np.ndarray  # entry bit for first chunks (data_start_bit)
    chunk_out_base: np.ndarray  # stored-bytes correction per chunk
    # Output prefill (stored blocks) and sizes.
    out_size: int
    stored_pos: np.ndarray  # int64 positions of stored bytes (may be empty)
    stored_val: np.ndarray  # uint8 values
    num_chunks: int
    tape_slots: int  # S — max symbols per chunk


def build_stream_plan(
    data: bytes,
    blocks: list[BlockInfo],
    block_lengths: list[tuple[np.ndarray, np.ndarray] | None],
    chunk_bits: int = DEFAULT_CHUNK_BITS,
) -> StreamPlan:
    """Build the device plan from a host block index.

    Args:
      data: raw DEFLATE stream bytes.
      blocks: block index (from the native scanner / host oracle).
      block_lengths: per block, (litlen_lengths, dist_lengths) or None for
        stored blocks.  Fixed blocks may pass the fixed lengths.
    """
    buf = np.frombuffer(memoryview(data), np.uint8)
    data_pad = np.zeros(len(buf) + 8, np.uint8)
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

    chunk_start, chunk_end, chunk_block, chunk_first, chunk_entry0 = [], [], [], [], []
    chunk_out_base = []
    stored_pos_parts, stored_val_parts = [], []
    stored_before = 0

    for b, info in enumerate(blocks):
        if info.btype == C.BTYPE_STORED:
            start_byte = info.data_start_bit // 8
            stored_pos_parts.append(
                np.arange(info.out_start, info.out_start + info.out_size, dtype=np.int64)
            )
            stored_val_parts.append(buf[start_byte : start_byte + info.out_size])
            stored_before += info.out_size
            continue
        lengths = block_lengths[b]
        assert lengths is not None
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

        nbits = info.end_bit - info.data_start_bit
        nchunks = max(1, -(-nbits // chunk_bits))
        for ci in range(nchunks):
            s = info.data_start_bit + ci * chunk_bits
            e = min(s + chunk_bits, info.end_bit)
            chunk_start.append(s)
            chunk_end.append(e)
            chunk_block.append(b)
            chunk_first.append(ci == 0)
            chunk_entry0.append(info.data_start_bit if ci == 0 else s)
            chunk_out_base.append(stored_before)

    total_out = blocks[-1].out_start + blocks[-1].out_size if blocks else 0
    return StreamPlan(
        data=data_pad,
        litlen_count=ll_count,
        litlen_first=ll_first,
        litlen_base=ll_base,
        litlen_syms=ll_syms,
        dist_count=d_count,
        dist_first=d_first,
        dist_base=d_base,
        dist_syms=d_syms,
        chunk_start=np.asarray(chunk_start, np.int32),
        chunk_end=np.asarray(chunk_end, np.int32),
        chunk_block=np.asarray(chunk_block, np.int32),
        chunk_first=np.asarray(chunk_first, bool),
        chunk_entry0=np.asarray(chunk_entry0, np.int32),
        chunk_out_base=np.asarray(chunk_out_base, np.int64),
        out_size=total_out,
        stored_pos=(
            np.concatenate(stored_pos_parts)
            if stored_pos_parts
            else np.zeros(0, np.int64)
        ),
        stored_val=(
            np.concatenate(stored_val_parts)
            if stored_val_parts
            else np.zeros(0, np.uint8)
        ),
        num_chunks=len(chunk_start),
        tape_slots=chunk_bits,  # ≤1 symbol per bit ⇒ exact upper bound
    )


# ---------------------------------------------------------------------------
# Device kernels (jnp)
# ---------------------------------------------------------------------------


def _fetch_window(words_lo, pos):
    """≥25-bit LSB-first window at absolute bit position `pos` (vector).

    words_lo[i] is the LE u32 formed by bytes i..i+3; one gather + shift.
    A second gather extends to ≥32 valid bits for code+extra fetches.
    """
    byte = (pos >> 3).astype(jnp.int32)
    r = (pos & 7).astype(jnp.uint32)
    lo = words_lo[byte]
    hi = words_lo[byte + 4]
    win = (lo >> r) | jnp.where(r > 0, hi << (jnp.uint32(32) - r), jnp.uint32(0))
    return win  # 32 valid bits


def _decode_canonical(win, count, first, base, syms_flat, syms_stride, block_id):
    """Vector canonical decode from a 32-bit LSB window.

    count/first/base: (NB, 16) gathered per lane via block_id.
    Returns (sym, code_len); unmatched lanes get code_len 15 and sym of the
    last offset clamp (speculative garbage — corrected by the fixpoint).
    """
    rev = _rev15(win & jnp.uint32(0x7FFF)).astype(jnp.int32)
    length = jnp.zeros_like(rev)
    offset = jnp.zeros_like(rev)
    for l in range(1, C.MAX_BITS + 1):
        code_l = rev >> (C.MAX_BITS - l)
        cnt = count[block_id, l]
        fst = first[block_id, l]
        off_l = code_l - fst
        ok = (off_l >= 0) & (off_l < cnt) & (length == 0)
        length = jnp.where(ok, l, length)
        offset = jnp.where(ok, base[block_id, l] + off_l, offset)
    # Unmatched (corrupt/speculative): force progress with len=15.
    unmatched = length == 0
    length = jnp.where(unmatched, C.MAX_BITS, length)
    idx = jnp.clip(block_id * syms_stride + offset, 0, syms_flat.shape[0] - 1)
    sym = syms_flat[idx]
    return sym, length


_LEN_BASE = jnp.asarray(C.LENGTH_BASE)
_LEN_EXTRA = jnp.asarray(C.LENGTH_EXTRA_BITS)
_DIST_BASE = jnp.asarray(C.DIST_BASE)
_DIST_EXTRA = jnp.asarray(C.DIST_EXTRA_BITS)


def _step(state, tabs, words_lo):
    """One decode step for all lanes.  state: (pos, mode, pending_len).

    Returns new state + emission (packed token or -1) for this step.
    """
    pos, mode, pending = state
    block_id = tabs["chunk_block"]
    win = _fetch_window(words_lo, pos)

    lsym, llen = _decode_canonical(
        win,
        tabs["ll_count"],
        tabs["ll_first"],
        tabs["ll_base"],
        tabs["ll_syms_flat"],
        288,
        block_id,
    )
    dsym, dlen = _decode_canonical(
        win,
        tabs["d_count"],
        tabs["d_first"],
        tabs["d_base"],
        tabs["d_syms_flat"],
        32,
        block_id,
    )

    # --- litlen-mode outcome ---
    is_len = lsym > 256
    li = jnp.clip(lsym - 257, 0, 28)
    leb = _LEN_EXTRA[li]
    lextra = (win >> llen.astype(jnp.uint32)).astype(jnp.int32) & ((1 << leb) - 1)
    match_len = _LEN_BASE[li] + lextra
    adv_lit = llen + jnp.where(is_len, leb, 0)
    lit_emit = jnp.where(
        lsym < 256, lsym, -1
    )  # literal → token; EOB/len-sym → no emit this step
    mode_after_lit = jnp.where(is_len, _DIST, _LIT)
    pending_after_lit = jnp.where(is_len, match_len, 0)

    # --- dist-mode outcome ---
    di = jnp.clip(dsym, 0, 29)
    deb = _DIST_EXTRA[di]
    dextra = (win >> dlen.astype(jnp.uint32)).astype(jnp.int32) & ((1 << deb) - 1)
    dist_val = _DIST_BASE[di] + dextra
    adv_dist = dlen + deb
    match_emit = pending | (dist_val << _VAL_BITS)

    in_lit = mode == _LIT
    adv = jnp.where(in_lit, adv_lit, adv_dist)
    emit = jnp.where(in_lit, lit_emit, match_emit)
    new_mode = jnp.where(in_lit, mode_after_lit, _LIT)
    new_pending = jnp.where(in_lit, pending_after_lit, 0)
    new_pos = pos + jnp.maximum(adv, 1)
    return (new_pos, new_mode, new_pending), emit


def _chase(entry_pos, entry_mode, entry_pending, tabs, words_lo, max_steps, tape=None):
    """Chase all lanes from entry states to their chunk ends.

    Without tape: returns exit states (for the fixpoint).  With tape
    (C, S) int32: also scatters emitted tokens per lane in step order.
    """
    chunk_end = tabs["chunk_end"]
    n_lanes = entry_pos.shape[0]

    def cond(carry):
        (pos, mode, pending), k, *_ = carry
        return (k < max_steps) & jnp.any(pos < chunk_end)

    def body(carry):
        (pos, mode, pending), k, cnt, tp = carry
        active = pos < chunk_end
        (npos, nmode, npending), emit = _step((pos, mode, pending), tabs, words_lo)
        npos = jnp.where(active, npos, pos)
        nmode = jnp.where(active, nmode, mode)
        npending = jnp.where(active, npending, pending)
        do_emit = active & (emit >= 0)
        if tp is not None:
            slot = jnp.where(do_emit, cnt, tp.shape[1])
            tp = tp.at[jnp.arange(n_lanes), slot].set(
                jnp.where(do_emit, emit, -1), mode="drop"
            )
        cnt = cnt + do_emit.astype(jnp.int32)
        return (npos, nmode, npending), k + 1, cnt, tp

    cnt0 = jnp.zeros(n_lanes, jnp.int32)
    carry = ((entry_pos, entry_mode, entry_pending), jnp.int32(0), cnt0, tape)
    (pos, mode, pending), _, cnt, tape_out = jax.lax.while_loop(cond, body, carry)
    return (pos, mode, pending), cnt, tape_out


def decode_tokens(plan_arrays, num_chunks: int, tape_slots: int):
    """Phase A: token tape for the whole stream (jittable core).

    plan_arrays: dict of device arrays from StreamPlan.
    Returns (tape (C, S) int32 packed tokens, counts (C,), sweeps).
    """
    tabs = plan_arrays
    chunk_start = tabs["chunk_start"]
    chunk_first = tabs["chunk_first"]
    chunk_entry0 = tabs["chunk_entry0"]
    chunk_block = tabs["chunk_block"]
    words_lo = tabs["words_lo"]
    max_steps = tape_slots

    # Fixpoint over entry states.
    entry_pos = chunk_entry0.astype(jnp.int32)
    entry_mode = jnp.zeros(num_chunks, jnp.int32)
    entry_pending = jnp.zeros(num_chunks, jnp.int32)

    def fix_cond(carry):
        _, _, _, changed, sweeps = carry
        return changed & (sweeps < num_chunks + 2)

    def fix_body(carry):
        e_pos, e_mode, e_pend, _, sweeps = carry
        (x_pos, x_mode, x_pend), _, _ = _chase(
            e_pos, e_mode, e_pend, tabs, words_lo, max_steps
        )
        # entry[c] = exit[c-1] unless first chunk of a block (fixed) or the
        # previous chunk is from a different block.
        prev_pos = jnp.concatenate([e_pos[:1], x_pos[:-1]])
        prev_mode = jnp.concatenate([e_mode[:1], x_mode[:-1]])
        prev_pend = jnp.concatenate([e_pend[:1], x_pend[:-1]])
        n_pos = jnp.where(chunk_first, chunk_entry0, prev_pos)
        n_mode = jnp.where(chunk_first, 0, prev_mode)
        n_pend = jnp.where(chunk_first, 0, prev_pend)
        # Exit past this chunk's span: clamp into [start, end] is not needed —
        # a previous-lane exit beyond our end means this chunk holds no symbol
        # start; the chase loop sees pos >= end and exits immediately.
        changed = jnp.any(
            (n_pos != e_pos) | (n_mode != e_mode) | (n_pend != e_pend)
        )
        return n_pos, n_mode, n_pend, changed, sweeps + 1

    entry_pos, entry_mode, entry_pending, _, sweeps = jax.lax.while_loop(
        fix_cond,
        fix_body,
        (entry_pos, entry_mode, entry_pending, jnp.bool_(True), jnp.int32(0)),
    )

    # Emit pass.
    tape = jnp.full((num_chunks, tape_slots + 1), -1, jnp.int32)
    _, counts, tape = _chase(
        entry_pos, entry_mode, entry_pending, tabs, words_lo, max_steps, tape=tape
    )
    return tape[:, :tape_slots], counts, sweeps


def resolve_output(tape, chunk_out_base, out_size: int, stored_pos, stored_val):
    """Phase B: packed token tape → output bytes (jittable).

    tape: (C, S) int32; chunk_out_base: (C,) int32 stored-bytes offsets.
    Returns (out_size,) uint8.
    """
    c_, s_ = tape.shape
    flat = tape.reshape(-1)
    val = flat & _VAL_MASK
    dist = (flat >> _VAL_BITS).astype(jnp.int32)
    valid = flat >= 0
    is_match = valid & (dist > 0)
    out_len = jnp.where(is_match, val, jnp.where(valid, 1, 0)).astype(jnp.int32)

    base = jnp.repeat(chunk_out_base.astype(jnp.int32), s_)
    cum = jnp.cumsum(out_len)
    out_pos = base + cum - out_len  # exclusive prefix + stored correction

    # Literal scatter.
    out_val = jnp.zeros(out_size, jnp.int32)
    lit_mask = valid & (dist == 0)
    lit_tgt = jnp.where(lit_mask, out_pos, out_size)
    out_val = out_val.at[lit_tgt].set(jnp.where(lit_mask, val, 0), mode="drop")
    if stored_val.shape[0]:
        out_val = out_val.at[stored_pos].set(stored_val.astype(jnp.int32))

    # Parent pointers: cover match ranges via searchsorted over out_pos.
    i = jnp.arange(out_size, dtype=jnp.int32)
    t = jnp.searchsorted(out_pos, i, side="right") - 1
    t = jnp.clip(t, 0, out_pos.shape[0] - 1)
    covered = (out_pos[t] <= i) & (i < out_pos[t] + out_len[t]) & is_match[t]
    parent = jnp.where(covered, i - dist[t], i)

    def dbl_cond(carry):
        parent, changed = carry
        return changed

    def dbl_body(carry):
        parent, _ = carry
        p2 = parent[parent]
        return p2, jnp.any(p2 != parent)

    parent, _ = jax.lax.while_loop(dbl_cond, dbl_body, (parent, jnp.bool_(True)))
    return out_val[parent].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def plan_to_device_arrays(plan: StreamPlan) -> dict:
    buf = plan.data
    b = buf.astype(np.uint32)
    words_lo = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    # pad so byte+4 gathers stay in range
    words_lo = np.concatenate([words_lo, np.zeros(8, np.uint32)])
    return {
        "words_lo": jnp.asarray(words_lo),
        "ll_count": jnp.asarray(plan.litlen_count),
        "ll_first": jnp.asarray(plan.litlen_first),
        "ll_base": jnp.asarray(plan.litlen_base),
        "ll_syms_flat": jnp.asarray(plan.litlen_syms.reshape(-1)),
        "d_count": jnp.asarray(plan.dist_count),
        "d_first": jnp.asarray(plan.dist_first),
        "d_base": jnp.asarray(plan.dist_base),
        "d_syms_flat": jnp.asarray(plan.dist_syms.reshape(-1)),
        "chunk_start": jnp.asarray(plan.chunk_start),
        "chunk_end": jnp.asarray(plan.chunk_end),
        "chunk_block": jnp.asarray(plan.chunk_block),
        "chunk_first": jnp.asarray(plan.chunk_first),
        "chunk_entry0": jnp.asarray(plan.chunk_entry0),
        "chunk_out_base": jnp.asarray(plan.chunk_out_base.astype(np.int32)),
    }


@functools.partial(jax.jit, static_argnames=("num_chunks", "tape_slots", "out_size"))
def _inflate_jit(arrays, num_chunks, tape_slots, out_size, stored_pos, stored_val):
    tape, counts, sweeps = decode_tokens(arrays, num_chunks, tape_slots)
    out = resolve_output(
        tape, arrays["chunk_out_base"], out_size, stored_pos, stored_val
    )
    return out, counts, sweeps


def inflate_device(data: bytes, chunk_bits: int = DEFAULT_CHUNK_BITS) -> bytes:
    """Full device inflate of one raw DEFLATE stream.

    Host scans block boundaries (native scanner when available, oracle
    otherwise), device decodes tokens + resolves LZ77.
    """
    from debigulator_tpu.ops.scanner import scan_stream

    blocks, lengths = scan_stream(data)
    plan = build_stream_plan(data, blocks, lengths, chunk_bits)
    if plan.num_chunks == 0:  # stored-only stream
        out = np.zeros(plan.out_size, np.uint8)
        out[plan.stored_pos] = plan.stored_val
        return out.tobytes()
    arrays = plan_to_device_arrays(plan)
    out, counts, sweeps = _inflate_jit(
        arrays,
        plan.num_chunks,
        plan.tape_slots,
        plan.out_size,
        jnp.asarray(plan.stored_pos.astype(np.int32)),
        jnp.asarray(plan.stored_val),
    )
    return np.asarray(out).tobytes()
