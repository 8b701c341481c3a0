"""Merged-plan batching: N independent DEFLATE streams as ONE device call.

Streams concatenate on the virtual bitstream: each stream's blocks keep
their own EOB chain (ending in TERMINAL), cells carry exact entries, and
output positions are globally offset per stream.  DEFLATE distances only
ever reference within a stream's own output, so the concatenated output
regions stay independent — no padding waste, no vmap, one fused
graph+chase+resolve call for the whole batch.  This is the single-chip
batch-throughput path (the tunnel costs ~50-100 ms per device call, so
batching per call is the lever); the vmap/shard_map path in
parallel.batch covers multi-device dp.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from debigulator_tpu.ops import inflate_v3 as v3


@dataclasses.dataclass
class MergedPlan:
    plan: v3.PlanV3
    out_offsets: list[int]  # per-stream start in the merged output
    out_sizes: list[int]
    #: Merged token records for the v9 group-driven Phase B (or None when
    #: the native scanner is unavailable): m_pos/m_meta (matches, stream-
    #: global output offsets), r_pos/r_cell/r_j0len (literal runs in tape
    #: coordinates).  All offsets are merged-global.
    recs: dict | None = None


def build_merged_plan(streams: list[bytes], records: bool = True,
                      scanned: list | None = None) -> MergedPlan:
    """records=False skips the scanner's token-record emission and the
    record merging — the device-resident (v7/v13) pipeline needs only
    block index + cell entries, so the host cost stays O(blocks+cells)
    per stream.  scanned: optional pre-computed per-stream scan results
    ((blocks, lengths, cells) tuples) so container codecs that already
    indexed the streams don't pay a second scan."""
    from debigulator_tpu.ops.scanner import scan_stream_cells, scan_stream_records

    all_blocks: list = []
    all_lengths: list = []
    states_parts, pend_parts = [], []
    out_offsets, out_sizes = [], []
    bit_cursor = 0  # virtual-cell-aligned bit cursor (for entry rebasing)
    out_cursor = 0
    merged_data_parts = []
    exact = True

    # We merge at the PlanV3 array level: build each stream's plan, then
    # shift and concatenate.  Per-stream scans + plan builds are
    # independent, and the native scanner is a ctypes call (GIL
    # released), so they run on a thread pool — the host scan was the
    # serial e2e ceiling flagged in round 3 (host_ms_per_stream 4.4).
    def scan_one(i):
        s = streams[i]
        if scanned is not None:
            blocks, lengths, cells = scanned[i]
            recs = None
        elif records:
            blocks, lengths, cells, recs = scan_stream_records(s, v3.CELL_BITS)
        else:
            blocks, lengths, cells = scan_stream_cells(s, v3.CELL_BITS)
            recs = None
        return recs, v3.build_plan_v3(s, blocks, lengths, cells=cells)

    if len(streams) > 1:
        import concurrent.futures as cf
        import os as _os

        # Load the native library once BEFORE the pool: a concurrent
        # first import inside worker threads can fail and latch the
        # "native unavailable" fallback.
        from debigulator_tpu.ops.scanner import _get_native

        _get_native()
        workers = min(len(streams), max(2, _os.cpu_count() or 2))
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(scan_one, range(len(streams))))
    else:
        results = [scan_one(i) for i in range(len(streams))]
    recs_list = [r for r, _ in results]
    plans = [p for _, p in results]
    exact = all(p.exact_entries for p in plans)
    have_recs = all(r is not None for r in recs_list) and recs_list

    nb_total = sum(p.ll_count.shape[0] for p in plans)

    def cat(get, pad_shape=None):
        return np.concatenate([get(p) for p in plans])

    # Virtual stream: concatenate used cell ranges (each plan's vbytes is
    # padded to pow2 — keep only the used cells).
    vb_parts, cell_entry_parts, cell_pend_parts, cell_block_parts = [], [], [], []
    ll_parts = {k: [] for k in ("count", "first", "base", "aug")}
    d_parts = {k: [] for k in ("count", "first", "base", "aug")}
    bne_parts, bob_parts = [], []
    stored_pos_parts, stored_val_parts = [], []
    bit_cursor = 0
    block_cursor = 0
    stored_cursor = 0
    lit_cursor = 0
    rec_parts = {k: [] for k in ("m_pos", "m_meta", "r_pos",
                                 "r_cell", "r_j0len", "r_lit0", "lit")}
    max_cell_tokens = 0
    from debigulator_tpu.ops.phase_a_pallas import TC as _TC

    tc_bits = _TC * v3.CELL_BITS

    for p, prec, s in zip(plans, recs_list, streams):
        if have_recs:
            cell_base = bit_cursor // v3.CELL_BITS
            rec_parts["m_pos"].append(prec["m_pos"] + out_cursor)
            rec_parts["m_meta"].append(prec["m_meta"])
            rec_parts["r_pos"].append(prec["r_pos"] + out_cursor)
            rec_parts["r_cell"].append(prec["r_cell"] + cell_base)
            rec_parts["r_j0len"].append(prec["r_j0len"])
            # Merged-global dense literal offsets: run r's literals start
            # at the prefix sum of earlier run lengths (stream order).
            rln = (prec["r_j0len"] & 0xFF).astype(np.int64)
            lit0 = np.cumsum(rln) - rln + lit_cursor
            rec_parts["r_lit0"].append(lit0.astype(np.int32))
            rec_parts["lit"].append(prec["lit_bytes"])
            lit_cursor += int(rln.sum())
            max_cell_tokens = max(max_cell_tokens, prec["max_cell_tokens"])
        # Per-stream extent: trim the plan's pow2 bit padding to the plan's
        # TRUE used virtual extent, then round UP to a whole number of
        # Phase A tiles (TC cells) so no tile ever spans two streams —
        # mixed-stream tiles break the kernel's table-page locality (many
        # small streams' blocks in one tile => ordinal range > PAGE =>
        # pa=None => the slow per-bit XLA fallback).  Tile-tail cells are
        # empty (entry -1) and carry the stream's LAST block id (a 0 fill
        # would also break page locality at the stream tail).  NB: the
        # virtual layout cell-aligns every block, so used_bits can exceed
        # 8*len(s) on flush-heavy streams — trimming to the raw byte
        # length dropped live cells (round-4 regression, ADVICE item 1).
        real_bits = p.used_bits
        used_bits = -(-real_bits // tc_bits) * tc_bits
        ncells = used_bits // v3.CELL_BITS
        real_cells = -(-real_bits // v3.CELL_BITS)

        def fit(a, fill, n=ncells):
            out = np.full(n, fill, a.dtype)
            m = min(len(a), n)
            out[:m] = a[:m]
            return out

        vb_parts.append(fit(p.vbytes, 0, n=used_bits // 8))
        entries = fit(p.cell_entry, -1).astype(np.int64)
        shift = entries >= 0
        entries[shift] += 2 * bit_cursor
        cell_entry_parts.append(entries)
        cell_pend_parts.append(fit(p.cell_pend, 0))
        cb_s = fit(p.cell_block, 0)
        if 0 < real_cells < ncells:
            cb_s[real_cells:] = cb_s[real_cells - 1]
        cell_block_parts.append(cb_s + block_cursor)

        ll_parts["count"].append(p.ll_count)
        ll_parts["first"].append(p.ll_first)
        ll_parts["base"].append(p.ll_base)
        ll_parts["aug"].append(p.ll_aug)
        d_parts["count"].append(p.d_count)
        d_parts["first"].append(p.d_first)
        d_parts["base"].append(p.d_base)
        d_parts["aug"].append(p.d_aug)

        bne = p.block_next_entry.astype(np.int64).copy()
        live = bne >= 0
        bne[live] += 2 * bit_cursor
        bne_parts.append(bne)
        # Compressed output accumulates through the GLOBAL tape cumsum, so
        # per-block correction is only the stored-bytes offset.
        bob_parts.append(p.block_out_base + stored_cursor)

        if p.stored_pos.shape[0]:
            stored_pos_parts.append(p.stored_pos + out_cursor)
            stored_val_parts.append(p.stored_val)
        stored_cursor += int(p.stored_pos.shape[0])

        out_offsets.append(out_cursor)
        out_sizes.append(p.out_size)
        out_cursor += p.out_size
        bit_cursor += used_bits
        block_cursor += p.ll_count.shape[0]

    n_bits = v3._round_pow2(max(bit_cursor, v3.CELL_BITS), 1 << 10)
    vbytes = np.zeros(n_bits // 8 + 16, np.uint8)
    vb = np.concatenate(vb_parts)
    vbytes[: len(vb)] = vb
    num_cells = n_bits // v3.CELL_BITS

    def pad_cells(parts, fill):
        arr = np.concatenate(parts)
        out = np.full(num_cells, fill, arr.dtype)
        out[: len(arr)] = arr
        return out

    merged = v3.PlanV3(
        vbytes=vbytes,
        n_bits=n_bits,
        num_cells=num_cells,
        cell_block=pad_cells(
            cell_block_parts, int(cell_block_parts[-1][-1]) if cell_block_parts else 0
        ).astype(np.int32),
        cell_entry=pad_cells(cell_entry_parts, -1).astype(np.int32),
        ll_count=np.concatenate(ll_parts["count"]),
        ll_first=np.concatenate(ll_parts["first"]),
        ll_base=np.concatenate(ll_parts["base"]),
        ll_aug=np.concatenate(ll_parts["aug"]),
        d_count=np.concatenate(d_parts["count"]),
        d_first=np.concatenate(d_parts["first"]),
        d_base=np.concatenate(d_parts["base"]),
        d_aug=np.concatenate(d_parts["aug"]),
        block_next_entry=np.concatenate(bne_parts).astype(np.int32),
        block_out_base=np.concatenate(bob_parts).astype(np.int32),
        first_state=plans[0].first_state if plans else v3.TERMINAL,
        out_size=out_cursor,
        stored_pos=(np.concatenate(stored_pos_parts) if stored_pos_parts
                    else np.zeros(0, np.int32)),
        stored_val=(np.concatenate(stored_val_parts) if stored_val_parts
                    else np.zeros(0, np.uint8)),
        slots=max(p.slots for p in plans) if plans else v3.DEFAULT_SLOTS,
        exact_entries=exact,
        cell_pend=pad_cells(cell_pend_parts, 0).astype(np.int32),
        slots_exact=bool(plans) and all(p.slots_exact for p in plans),
    )
    recs = None
    if have_recs:
        recs = {k: (np.concatenate(v) if v else np.zeros(0, np.int32))
                for k, v in rec_parts.items()}
        recs["max_cell_tokens"] = max_cell_tokens
        # Exact tape capacity (token tape rows are 128 lanes, so slots must
        # divide 128); the scanner bound makes the overflow probe moot.
        merged.slots = next(
            s for s in (16, 32, 64) if s >= max(max_cell_tokens, 1)
        )
        merged.slots_exact = True
    return MergedPlan(plan=merged, out_offsets=out_offsets,
                      out_sizes=out_sizes, recs=recs)


def _pad_rec_rows(a: np.ndarray, stage_rows: int) -> np.ndarray:
    """Reshape a flat record array to (rows, 128), rows padded to a stage
    multiple plus two slack stages (kernel DMA windows run past the live
    range, and the double-buffered walk prefetches one stage further;
    padded entries are masked off by index-range checks)."""
    n = len(a)
    rows = -(-max(n, 1) // 128)
    rows = -(-rows // stage_rows) * stage_rows + 2 * stage_rows
    out = np.zeros(rows * 128, a.dtype if a.dtype == np.int32 else np.int32)
    out[:n] = a
    return out.reshape(rows, 128)


def prepare_merged(mp: MergedPlan, interpret: bool | None = None):
    """Stage a merged plan's arrays on device once; return a zero-argument
    runner that executes the fused decode call (device byte buffer out).

    The FLAGSHIP path is device-resident: the Pallas Phase A kernel
    decodes every Huffman symbol on chip (host work = block index + cell
    entries only), then the segmented Phase B resolves LZ77.  Falls back
    to the XLA Phase A (v5) when the Pallas kernel can't cover the plan
    (speculative entries or a tile spanning more than one table page).

    (The superseded host-fed v10/v12 pipeline lives in
    ops.archive.host_fed, reachable only from its tests/tools.)
    """
    import jax
    import jax.numpy as jnp

    from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays

    plan = mp.plan
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)

    import os as _os

    pa_np = (build_pa_arrays(plan, stage=False)
             if plan.exact_entries else None)
    if pa_np is not None and _os.environ.get("DBG_PHASE_B", "v15") != "v13":
        # Flagship v15 with ONE-transfer packed staging (each separate
        # host->device array costs ~21 ms of tunnel latency).
        buf, metas = v3.pack_stage_arrays(pa_np, plan)
        dev_buf = jnp.asarray(buf)

        def call(slots: int):
            return v3._inflate_v15_packed_jit(
                dev_buf, metas, slots, n_seg, interpret=interpret)
    elif pa_np is not None:
        pa = {k: jnp.asarray(v) for k, v in pa_np.items()}
        arrays = v3.plan_arrays_v7(plan)

        def call(slots: int):
            return v3.flagship_jit()(
                pa, arrays, slots, n_seg, interpret=interpret,
            )
    else:
        arrays = v3.plan_arrays_v3(plan)

        def call(slots: int):
            return v3._inflate_v5_jit(
                arrays, plan.n_bits, slots, n_seg,
                exact=plan.exact_entries, interpret=interpret,
            )

    # Tape overflow is a property of the PLAN (slot bound vs densest cell),
    # not of the data flowing through a given call.  With scanner-exact
    # slots (plan.slots_exact) overflow is impossible and no device probe
    # runs at all; otherwise resolve it once here so steady-state calls
    # never read the overflow flag back (a device round-trip).
    slots = plan.slots
    if not plan.slots_exact:
        _, overflow = call(slots)
        if bool(overflow):
            slots = v3.CELL_BITS
            _, overflow = call(slots)
            assert not bool(overflow), "tape overflow at the exact slot bound"

    def run():
        body, _ = call(slots)
        return body

    return run


def run_merged_plan(mp: MergedPlan, interpret: bool | None = None):
    """Run a merged plan as ONE fused device call → device byte buffer."""
    return prepare_merged(mp, interpret=interpret)()


def decode_merged(streams: list[bytes]) -> list[bytes]:
    """Decode N streams in one fused device call; outputs in order."""
    import numpy as np

    mp = build_merged_plan(streams, records=False)
    if not mp.plan.exact_entries:
        raise RuntimeError("merged decode requires the native scanner")
    body = run_merged_plan(mp)
    body = np.asarray(body[: mp.plan.out_size]).astype(np.uint8)
    return [
        body[off : off + size].tobytes()
        for off, size in zip(mp.out_offsets, mp.out_sizes)
    ]
