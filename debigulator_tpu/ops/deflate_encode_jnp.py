"""TPU-native DEFLATE encoder core (jnp): elementwise LZ77 lengths.

The host encoder (ops.deflate_encode) is a NumPy port of the array
design; its per-candidate match extension gathers bytes at arbitrary
offsets — fine on CPU, but XLA gathers on TPU cost ~8.6 ns/element
(serial), so a gather-based parse cannot reach the compiled reference's
~67 MB/s (stb_write.h:895 on this host's gimp_test filtered rows).

This module restructures candidate search so the hot path is PURELY
elementwise + scans (no gathers at all):

* match lengths are computed per CANDIDATE DISTANCE d as run lengths of
  the elementwise equality eq_d[i] = data[i] == data[i-d]: the
  next-zero position is a reversed cumulative-min, so each distance
  costs three vectorized passes;
* the candidate set is a static ladder (1..4, 8, the PNG row stride,
  ...) — on filtered-image data (the reference encoder's only workload)
  short distances plus the row stride capture the long runs that carry
  the compression; arbitrary-distance hash candidates are the host
  encoder's job (quality mode);
* the greedy token walk operates on the best-(len, dist) arrays.

Output tokens feed the existing field/bit-packing machinery, so streams
keep the same compatibility gates (decode bit-exact under the compiled
reference inflate.c, zlib).
"""

from __future__ import annotations

import functools

import numpy as np

from debigulator_tpu import constants as C

#: Static candidate distance ladder (plus the caller's row stride).
BASE_DISTANCES = (1, 2, 3, 4, 8)


#: Greedy-walk kernel staging rows (positions per stage = SUB*128).
_WALK_SUB = 128


def _greedy_walk_kernel(n_ref, bl_hbm, bd_hbm, pos_ref, meta_ref, cnt_ref,
                        bl_s, bd_s, op_s, om_s, sems):
    """Sequential greedy LZ77 selection on device.

    Walks positions 0..n advancing by max(len, 1); emits (pos,
    len<<16|dist) for selected matches.  Scalar-core loop over SMEM
    stages — visits = selected matches + literal bytes (not n) on
    compressible data.  Outputs flush as full stages (the final partial
    stage pads with zeros; cnt gives the true record count)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = n_ref[0]
    cap = _WALK_SUB * 128

    def outer(state):
        i, k, flushed = state
        r0 = (i // 128) // 8 * 8
        base0 = r0 * 128
        stage_end = jnp.minimum(n, base0 + cap)
        nblk = (stage_end - base0 + 1023) // 1024

        def dma(b, _):
            pltpu.make_async_copy(bl_hbm.at[pl.ds(r0 + b * 8, 8), :],
                                  bl_s.at[pl.ds(b * 8, 8), :],
                                  sems.at[0]).start()
            pltpu.make_async_copy(bd_hbm.at[pl.ds(r0 + b * 8, 8), :],
                                  bd_s.at[pl.ds(b * 8, 8), :],
                                  sems.at[1]).start()
            return 0

        def dma_w(b, _):
            pltpu.make_async_copy(bl_hbm.at[pl.ds(r0 + b * 8, 8), :],
                                  bl_s.at[pl.ds(b * 8, 8), :],
                                  sems.at[0]).wait()
            pltpu.make_async_copy(bd_hbm.at[pl.ds(r0 + b * 8, 8), :],
                                  bd_s.at[pl.ds(b * 8, 8), :],
                                  sems.at[1]).wait()
            return 0

        jax.lax.fori_loop(0, nblk, dma, 0)
        jax.lax.fori_loop(0, nblk, dma_w, 0)

        def inner(st):
            i, k, flushed = st
            jl = i - base0
            ln = bl_s[jl >> 7, jl & 127]
            take = ln >= 3
            kl = k - flushed
            op_s[kl >> 7, kl & 127] = i
            om_s[kl >> 7, kl & 127] = jnp.where(
                take, (ln << 16) | bd_s[jl >> 7, jl & 127], 0)
            k = k + take.astype(jnp.int32)
            i = i + jnp.where(take, ln, 1)
            # Flush a full output stage.
            full = (k - flushed) >= cap

            @pl.when(full)
            def _():
                fr = flushed // 128
                pltpu.make_async_copy(
                    op_s, pos_ref.at[pl.ds(fr, _WALK_SUB), :],
                    sems.at[2]).start()
                pltpu.make_async_copy(
                    op_s, pos_ref.at[pl.ds(fr, _WALK_SUB), :],
                    sems.at[2]).wait()
                pltpu.make_async_copy(
                    om_s, meta_ref.at[pl.ds(fr, _WALK_SUB), :],
                    sems.at[3]).start()
                pltpu.make_async_copy(
                    om_s, meta_ref.at[pl.ds(fr, _WALK_SUB), :],
                    sems.at[3]).wait()

            flushed = jnp.where(full, flushed + cap, flushed)
            return (i, k, flushed)

        i, k, flushed = jax.lax.while_loop(
            lambda st: st[0] < stage_end, inner, (i, k, flushed))
        return (i, k, flushed)

    i, k, flushed = jax.lax.while_loop(
        lambda st: st[0] < n, outer, (0, 0, 0))
    # Final partial flush (zero the tail first so padding is len 0).
    kl = k - flushed

    def zero_tail(j, _):
        @pl.when(j >= kl)
        def _():
            om_s[j >> 7, j & 127] = 0
            op_s[j >> 7, j & 127] = 0
        return 0

    jax.lax.fori_loop(0, cap, zero_tail, 0)
    fr = flushed // 128
    pltpu.make_async_copy(op_s, pos_ref.at[pl.ds(fr, _WALK_SUB), :],
                          sems.at[2]).start()
    pltpu.make_async_copy(op_s, pos_ref.at[pl.ds(fr, _WALK_SUB), :],
                          sems.at[2]).wait()
    pltpu.make_async_copy(om_s, meta_ref.at[pl.ds(fr, _WALK_SUB), :],
                          sems.at[3]).start()
    pltpu.make_async_copy(om_s, meta_ref.at[pl.ds(fr, _WALK_SUB), :],
                          sems.at[3]).wait()
    cnt_ref[0] = k


#: First-readback cap in match rows (x128 matches, x1 KiB per row pair).
_READ_ROWS = 512


@functools.lru_cache(maxsize=None)
def _select_jit(n: int, dists: tuple, cap: int, interpret: bool):
    """ONE fused jit: elementwise lengths -> Pallas greedy walk -> packed
    (cnt | pos rows | meta rows) output.  The round-4 path paid two
    dispatches plus THREE synced readbacks (~20 ms tunnel latency each);
    this pays one dispatch plus ONE capped readback (+1 spill readback
    only when a 4 MB+ input selects > 65k matches)."""
    import jax
    import jax.numpy as jnp

    rows = -(-n // 128)
    rows_p = (-(-rows // 8) * 8) + _WALK_SUB + 8
    out_rows = rows_p + _WALK_SUB

    def f(data):
        data = data.astype(jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)
        best_len = jnp.zeros(n, jnp.int32)
        best_dist = jnp.zeros(n, jnp.int32)
        # Per-distance streaming form (measured FASTER than one stacked
        # (D, n) batched cummin, which materializes ~2x100 MB
        # intermediates at 4 MB inputs).
        for d in dists:
            eq = jnp.concatenate(
                [jnp.zeros(d, jnp.bool_), data[d:] == data[:-d]])
            z = jnp.where(eq, n, idx)
            nz = jax.lax.cummin(z, reverse=True)
            ln = jnp.minimum(nz - idx, cap)
            better = (ln >= C.MIN_MATCH_LENGTH) & (ln > best_len)
            best_len = jnp.where(better, ln, best_len)
            best_dist = jnp.where(better, d, best_dist)
        pad = rows_p * 128 - n
        bl2d = jnp.pad(best_len, (0, pad)).reshape(rows_p, 128)
        bd2d = jnp.pad(best_dist, (0, pad)).reshape(rows_p, 128)
        pos2d, meta2d, cnt = pl_call(bl2d, bd2d)
        rr = min(_READ_ROWS, out_rows)
        head = jnp.concatenate(
            [jnp.broadcast_to(cnt, (1, 128)).astype(jnp.int32),
             pos2d[:rr], meta2d[:rr]])
        return head, pos2d, meta2d

    def pl_call(bl2d, bd2d):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        return pl.pallas_call(
            _greedy_walk_kernel,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.SMEM((_WALK_SUB, 128), jnp.int32),
                pltpu.SMEM((_WALK_SUB, 128), jnp.int32),
                pltpu.SMEM((_WALK_SUB, 128), jnp.int32),
                pltpu.SMEM((_WALK_SUB, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(jnp.asarray([n], jnp.int32), bl2d, bd2d)

    return jax.jit(f)


#: Sampled-candidate mining: positions sampled / top distances added.
_MINE_SAMPLE = 1 << 15
_MINE_TOP = 4


def mine_distances(data: np.ndarray, k: int = _MINE_TOP) -> list[int]:
    """Input-adaptive candidate distances: hash 4-grams at ~32k sampled
    positions, take each sample's distance to the PREVIOUS occurrence of
    its hash, histogram, return the top-k distances.  O(sample) NumPy on
    the host — generalizes the static ladder to arbitrary periodic /
    structured data (the reference's stb encoder finds such matches via
    its per-position hash chain, stb_write.h:867-877; here they become
    extra device-scan candidates)."""
    n = len(data)
    if n < 4096:
        return []
    step = max(1, n // _MINE_SAMPLE)
    pos = np.arange(0, n - 4, step, dtype=np.int64)
    d = data.astype(np.uint32)
    h = (d[pos] * 2654435761 ^ d[pos + 1] * 40503
         ^ d[pos + 2] * 668265263 ^ d[pos + 3] * 374761393) & 0xFFFF
    order = np.argsort(h, kind="stable")
    hs, ps = h[order], pos[order]
    same = hs[1:] == hs[:-1]
    gaps = (ps[1:] - ps[:-1])[same]
    gaps = gaps[(gaps >= 1) & (gaps < 32768)]
    if not len(gaps):
        return []
    vals, counts = np.unique(gaps, return_counts=True)
    top = vals[np.argsort(-counts)][: 2 * k]
    # Prefer distinct magnitudes (skip near-duplicates of the ladder).
    out = []
    for v in top:
        v = int(v)
        if all(abs(v - e) > 2 for e in list(BASE_DISTANCES) + out):
            out.append(v)
        if len(out) >= k:
            break
    return out


def lz77_select_device(data: np.ndarray, stride: int | None = None,
                       dev_data=None, mine: bool = True):
    """Fused device lengths + greedy walk.  Returns (sel, lens, dists)
    numpy arrays of the selected matches; one dispatch, one readback in
    the common case.  dev_data: optional pre-staged device copy of data
    (bench hook: excludes the h2d transfer from the timed region).
    mine=True adds input-adaptive candidate distances (mine_distances)
    to the static ladder."""
    import jax
    import jax.numpy as jnp

    n = len(data)
    dists = list(BASE_DISTANCES)
    if stride and stride not in dists:
        dists.append(int(stride))
    if mine:
        dists.extend(mine_distances(np.asarray(data, np.uint8)))
    dist_t = tuple(sorted(set(d for d in dists if d < n)))
    interpret = jax.default_backend() == "cpu"
    f = _select_jit(n, dist_t, C.MAX_MATCH_LENGTH, interpret)
    head, pos2d, meta2d = f(dev_data if dev_data is not None
                            else jnp.asarray(np.asarray(data, np.uint8)))
    head_np = np.asarray(head)  # the ONE synced readback
    rr = (head_np.shape[0] - 1) // 2
    k = int(head_np[0, 0])
    kr = -(-k // 128) if k else 0
    if kr <= rr:
        pos = head_np[1 : 1 + max(kr, 1)].reshape(-1)[:k]
        meta = head_np[1 + rr : 1 + rr + max(kr, 1)]
        meta = meta.reshape(-1)[:k]
    else:  # spill: very match-dense input, one extra readback
        pos = np.asarray(pos2d[:kr]).reshape(-1)[:k]
        meta = np.asarray(meta2d[:kr]).reshape(-1)[:k]
    return (pos.astype(np.int64), (meta >> 16).astype(np.int64),
            (meta & 0xFFFF).astype(np.int64))


def lz77_parse_device(data: np.ndarray, stride: int | None = None,
                      dev_data=None):
    """Greedy parse using device-computed lengths.

    Returns an ARRAY token triple (lit, len, dist) — lit == -1 marks
    matches — accepted directly by deflate_encode._tokens_to_fields.
    The Python loop touches only SELECTED MATCHES (~tokens/avg-run);
    literal gaps are materialized with vectorized range expansion, never
    per byte.
    """
    data = np.asarray(data, np.uint8)
    n = len(data)
    if n < 8:
        z = np.zeros(n, np.int64)
        return (data.astype(np.int64), z, z)
    sel, lens, dists = lz77_select_device(data, stride=stride,
                                          dev_data=dev_data)
    m = len(sel)
    # Literal gaps: [gap g start, gap g end) = [prev match end, match g).
    gap_start = np.concatenate([[0], sel + lens]) if m else np.array([0])
    gap_end = np.concatenate([sel, [n]]) if m else np.array([n])
    gap_len = gap_end - gap_start
    total_lits = int(gap_len.sum())
    # Vectorized range expansion: source index of each literal byte.
    lit_base = np.cumsum(gap_len) - gap_len
    lit_src = (np.arange(total_lits, dtype=np.int64)
               + np.repeat(gap_start - lit_base, gap_len))
    # Token layout: gap g's literals then match g (last gap has none).
    T = total_lits + m
    lit = np.empty(T, np.int64)
    mlen = np.zeros(T, np.int64)
    mdist = np.zeros(T, np.int64)
    # Match token positions: after gap g's literals.
    mpos = lit_base[:m] + gap_len[:m] + np.arange(m, dtype=np.int64)
    is_lit = np.ones(T, bool)
    is_lit[mpos] = False
    lit[is_lit] = data[lit_src]
    lit[mpos] = -1
    mlen[mpos] = lens
    mdist[mpos] = dists
    return (lit, mlen, mdist)


def deflate_fixed_device(data, stride: int | None = None,
                         dev_data=None) -> bytes:
    """Fixed-Huffman DEFLATE with the device LZ77 core (stb-compatible
    single block, stored fallback)."""
    from debigulator_tpu.ops import deflate_encode as enc

    data_np = np.frombuffer(memoryview(bytes(data)), dtype=np.uint8)
    n = len(data_np)
    tokens = lz77_parse_device(data_np, stride=stride, dev_data=dev_data)
    vals, bits = enc._tokens_to_fields(
        tokens,
        enc._FIXED_LITLEN_CODES, enc._FIXED_LITLEN_LENGTHS,
        enc._FIXED_DIST_CODES, enc._FIXED_DIST_LENGTHS,
    )
    eob_bits = int(enc._FIXED_LITLEN_LENGTHS[256])
    eob_val = int(enc._reverse_bits(
        np.array([enc._FIXED_LITLEN_CODES[256]]), np.array([eob_bits]))[0])
    vals = np.concatenate([vals, [np.uint64(eob_val)]])
    bits = np.concatenate([bits, [eob_bits]])
    packed, _ = enc.pack_bits(vals, bits, prefix_bits=3, prefix_val=0b011)
    if len(packed) >= n + 5 * ((n + 65534) // 65535):
        return enc.deflate_stored(data_np)
    return packed
