"""Sequence-parallel decode of ONE DEFLATE stream across mesh devices.

This is the SP/CP layer promised in SURVEY §5.7 (the codec analog of ring
attention): the stream's output range splits into consecutive shards, one
per device on the ``sp`` mesh axis.  DEFLATE back-references reach at
most 32 KiB behind (RFC 1951 §3.2.5, reference inflate.c:748-779), so a
shard depends on its left neighbor only through that tail — but the
dependency is *transitive* (a copy of a copy of the window).

The host scan already walks every token, so instead of speculating we
compute the dependency **exactly** (native ``dbg_taint``): which output
bytes — and therefore which match records — derive, transitively, from
their shard's incoming window, and whether taint reaches each shard's
outgoing tail.  The device schedule is then:

  phase 1   every shard resolves ALL its pieces in parallel with a zero
            window (tainted bytes are provisional, everything else final)
  round r   one-hop ring ``ppermute`` of the 32 KiB tails, then every
            shard replays only its *tainted* matches over its own output
            (phase-1 literals and clean matches are already final)

The number of rounds is host-known: shard s is final in round
``final_round[s] = 0 if s == 0 else (final_round[s-1] + 1 if taint
reaches shard s-1's tail else 1)`` — for typical data taint decays well
before the tail, giving exactly one round.  A worst-case stream (one RLE
run spanning everything) degrades to n_shards rounds, still correct.

All shards execute the same SPMD program under ``shard_map``; the tails
ride ICI as a single ``ppermute`` per round.  The per-shard resolver is
the flagship v15/v16 frontier-batched walk (ops.phase_b_v15.walk_all_v16
via plan_records_v15 — the same kernel the merged single-chip path runs;
the archive v10 group walk this layer used through round 4 is gone).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from debigulator_tpu.ops import inflate_v3 as v3
from debigulator_tpu.ops.phase_b_v15 import (
    WIN_ROWS,
    plan_records_v15,
    run_records_v15,
)

WINDOW = 32768


def _split_at(pos, meta_len, bound_of):
    """Split records (pos, len) at per-record boundaries bound_of(pos).

    Returns index arrays (orig_idx, pos, len_a_or_b, lit_advance)
    interleaved A/B with zero-length halves dropped; order (and
    therefore stream order) is preserved.  Works for matches (dist
    unchanged by an A/B split) and literal runs (lit offset advances by
    len_a).
    """
    pos = pos.astype(np.int64)
    ln = meta_len.astype(np.int64)
    bound = bound_of(pos)
    len_a = np.minimum(ln, bound - pos)
    len_b = ln - len_a
    idx = np.arange(len(pos), dtype=np.int64)
    p2 = np.stack([pos, bound], 1).reshape(-1)
    l2 = np.stack([len_a, len_b], 1).reshape(-1)
    i2 = np.stack([idx, idx], 1).reshape(-1)
    off2 = np.stack([np.zeros_like(len_a), len_a], 1).reshape(-1)
    keep = l2 > 0
    return i2[keep], p2[keep], l2[keep], off2[keep]


@dataclasses.dataclass
class SplitPlan:
    n_shards: int
    shard_bytes: int  # multiple of seg_bytes
    n_seg: int  # segments per shard
    seg_bytes: int
    out_size: int
    rounds: int
    phase1: dict  # stacked per-shard walk arrays (leading axis = shard)
    patch: dict  # stacked per-shard walk arrays for tainted matches
    lit: np.ndarray  # shared dense literal rows (replicated)


def plan_split_stream(stream: bytes, n_shards: int,
                      seg_bytes: int | None = None) -> SplitPlan:
    """Host plan: scan, split records per shard, taint-analyse, pack."""
    from debigulator_tpu.native.scanner import taint_matches
    from debigulator_tpu.parallel.merged import build_merged_plan

    mp_all = build_merged_plan([stream])
    recs = mp_all.recs
    if recs is None:
        raise RuntimeError("split-stream decode requires the native scanner")
    out_size = mp_all.plan.out_size
    SEG = seg_bytes if seg_bytes is not None else v3.SEG_BYTES
    if SEG < WINDOW:
        raise ValueError("seg_bytes must be >= the 32 KiB DEFLATE window")
    shard_bytes = -(-out_size // n_shards)
    shard_bytes = -(-shard_bytes // SEG) * SEG
    n_seg = shard_bytes // SEG

    # --- split match records at shard boundaries, then taint ---------------
    m_pos = recs["m_pos"].astype(np.int64)
    m_len = (recs["m_meta"].astype(np.int64) >> 16) & 0xFFFF
    m_dist = recs["m_meta"].astype(np.int64) & 0xFFFF
    bound = lambda p: (p // shard_bytes + 1) * shard_bytes
    mi, mp_, ml, _ = _split_at(m_pos, m_len, bound)
    md = m_dist[mi]
    m_meta_s = ((ml << 16) | md).astype(np.int32)
    m_pos_s = mp_.astype(np.int32)

    t = taint_matches(m_pos_s, m_meta_s, out_size, shard_bytes, WINDOW,
                      n_shards=n_shards)
    if t is None:
        raise RuntimeError("split-stream decode requires the native library")
    m_taint, tail_taint = t

    # --- split literal runs at shard boundaries ---------------------------
    r_len = recs["r_j0len"].astype(np.int64) & 0xFF
    ri, rp_, rl, roff = _split_at(recs["r_pos"].astype(np.int64), r_len, bound)
    r_lit0_s = recs["r_lit0"].astype(np.int64)[ri] + roff

    # --- per-shard walk plans (flagship v15 record format) -----------------
    lit = recs["lit"]
    shard_of_m = (mp_ // shard_bytes).astype(np.int64)
    shard_of_r = (rp_ // shard_bytes).astype(np.int64)
    sp = np.asarray(mp_all.plan.stored_pos, np.int64)
    sv = np.asarray(mp_all.plan.stored_val, np.uint8)
    phase1_l, patch_l = [], []
    for s in range(n_shards):
        km = shard_of_m == s
        kr = shard_of_r == s
        ks = (sp >= s * shard_bytes) & (sp < (s + 1) * shard_bytes)
        base = s * shard_bytes
        phase1_l.append(plan_records_v15(
            mp_[km] - base, m_meta_s[km].astype(np.int64),
            rp_[kr] - base, r_lit0_s[kr], rl[kr], lit, n_seg, SEG,
            stored_pos=sp[ks] - base, stored_val=sv[ks],
        ))
        kp = km & (m_taint.astype(bool)[: len(km)] if len(m_taint) else km)
        patch_l.append(plan_records_v15(
            mp_[kp] - base, m_meta_s[kp].astype(np.int64),
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.int64), lit, n_seg, SEG,
        ))

    # --- rounds from the tail-taint chain ---------------------------------
    rounds = 0
    fr = 0
    for s in range(1, n_shards):
        fr = (fr + 1) if tail_taint[s - 1] else 1
        rounds = max(rounds, fr)

    def stack(dicts):
        keys = [k for k in dicts[0] if k != "lit2d"]
        out = {}
        for k in keys:
            parts = [np.asarray(d[k]) for d in dicts]
            rows = max(p.shape[0] for p in parts)
            padded = []
            for p in parts:
                q = np.zeros((rows,) + p.shape[1:], p.dtype)
                q[: p.shape[0]] = p
                padded.append(q)
            out[k] = np.stack(padded)
        return out

    return SplitPlan(
        n_shards=n_shards,
        shard_bytes=shard_bytes,
        n_seg=n_seg,
        seg_bytes=SEG,
        out_size=out_size,
        rounds=rounds,
        phase1=stack(phase1_l),
        patch=stack(patch_l),
        lit=np.asarray(phase1_l[0]["lit2d"]),
    )


def _shard_arrays(d, s, lit):
    out = {k: v[s] for k, v in d.items()}
    out["lit2d"] = lit
    return out


def decode_split_emulated(stream: bytes, n_shards: int,
                          interpret: bool | None = None,
                          seg_bytes: int | None = None) -> bytes:
    """Run the split-stream schedule shard-by-shard on one device.

    Identical plan, phases, tail hand-offs and patch rounds as the
    shard_map path (the tails move via host slices instead of ppermute) —
    the single-chip / CI validation of the sp layer's correctness.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    plan = plan_split_stream(stream, n_shards, seg_bytes=seg_bytes)
    lit = jnp.asarray(plan.lit)

    outs = []
    for s in range(n_shards):
        outs.append(run_records_v15(
            _shard_arrays(plan.phase1, s, lit), plan.seg_bytes,
            interpret=interpret,
        ))
    zero_tail = jnp.zeros((WIN_ROWS, 128), jnp.int32)
    for _ in range(plan.rounds):
        tails = [zero_tail] + [
            o[-WINDOW:].reshape(WIN_ROWS, 128) for o in outs[:-1]
        ]
        outs = [
            run_records_v15(
                _shard_arrays(plan.patch, s, lit), plan.seg_bytes,
                tail0=tails[s], body_init=outs[s], interpret=interpret,
            )
            for s in range(n_shards)
        ]
    body = np.concatenate([np.asarray(o) for o in outs])[: plan.out_size]
    return body.astype(np.uint8).tobytes()


def decode_split_stream(stream: bytes, mesh=None, n_shards: int | None = None,
                        interpret: bool | None = None,
                        seg_bytes: int | None = None) -> bytes:
    """Decode ONE raw DEFLATE stream sharded over the mesh's ``sp`` axis.

    Every device resolves its own output shard in parallel; R host-known
    rounds of one-hop ring tail exchange + tainted-match replay make the
    result exact.  Returns the decoded bytes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from debigulator_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(dp=1, sp=n_shards or len(jax.devices()))
    sp_n = mesh.shape["sp"]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    plan = plan_split_stream(stream, sp_n, seg_bytes=seg_bytes)

    lit = jnp.asarray(plan.lit)

    def stacked(d):
        return {k: jnp.asarray(v) for k, v in d.items()}

    p1 = stacked(plan.phase1)
    pp = stacked(plan.patch)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P()),
        out_specs=P("sp"),
        check_vma=False,
    )
    def run(p1_s, pp_s, lit_r):
        p1_d = {k: v[0] for k, v in p1_s.items()}
        pp_d = {k: v[0] for k, v in pp_s.items()}
        p1_d["lit2d"] = lit_r
        pp_d["lit2d"] = lit_r
        out = run_records_v15(p1_d, plan.seg_bytes, interpret=interpret)
        for _ in range(plan.rounds):
            tail = out[-WINDOW:].reshape(WIN_ROWS, 128)
            idx = jax.lax.axis_index("sp")
            perm = [(i, (i + 1) % sp_n) for i in range(sp_n)]
            tin = jax.lax.ppermute(tail, "sp", perm)
            tin = jnp.where(idx == 0, jnp.zeros_like(tin), tin)
            out = run_records_v15(pp_d, plan.seg_bytes, tail0=tin,
                                  body_init=out, interpret=interpret)
        return out[None]

    out = jax.jit(run)(p1, pp, lit)
    body = np.asarray(out).reshape(-1)[: plan.out_size]
    return body.astype(np.uint8).tobytes()
