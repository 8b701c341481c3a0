"""Paged symbol lookup: merged plans with NB > DIRECT_NB_MAX blocks.

The direct int8 one-hot matmul stops scaling past ~64 blocks (reference
scale: inflate.c keeps ONE table pair live at a time, inflate.c:1530-1653;
we keep hundreds for batch decode).  The paged path scans cell tiles
against a dynamic PAGE_NB-block table window.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from debigulator_tpu.ops import inflate_v3 as v3


def _mk_streams(n, seed=0):
    rng = np.random.default_rng(seed)
    payloads, streams = [], []
    for i in range(n):
        # ~4 KB compressible payload -> >=1 KB compressed -> >=128 cells,
        # so a 512-cell tile spans only a few blocks (paged precondition).
        words = rng.integers(0, 40, 900)
        p = b" ".join(b"word%d" % w for w in words) + bytes(
            rng.integers(0, 256, 64, dtype=np.uint8)
        )
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        s = co.compress(p) + co.flush()
        payloads.append(p)
        streams.append(s)
    return payloads, streams


def test_tile_page_map_monotone():
    cb = np.repeat(np.arange(128, dtype=np.int32), 64)
    pb = v3.tile_page_map(cb, 128)
    assert pb is not None
    # every tile's span fits the page window
    cb2 = cb.reshape(-1, min(v3.TILE_CELLS, len(cb)))
    assert np.all(cb2[:, -1] - pb < v3.PAGE_NB)


def test_tile_page_map_rejects_dense_blocks():
    # 801 blocks over 1484 cells (immunetomustsurvive.png shape): a tile
    # spans hundreds of blocks -> paging must refuse.
    cb = np.minimum(np.arange(2048, dtype=np.int32) // 2, 800)
    assert v3.tile_page_map(cb, 801) is None


@pytest.mark.slow
def test_merged_paged_decode_bit_exact():
    pytest.importorskip("jax")
    from debigulator_tpu.parallel.merged import build_merged_plan

    payloads, streams = _mk_streams(70)
    mp = build_merged_plan(streams)
    plan = mp.plan
    nb = plan.ll_count.shape[0]
    assert nb > v3.DIRECT_NB_MAX, "test must exercise the large-NB path"
    arrays = v3.plan_arrays_v3(plan)
    assert "tile_page" in arrays, "paged mode should be available"

    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    body, overflow = v3._inflate_v5_jit(
        arrays, plan.n_bits, plan.slots, n_seg, exact=plan.exact_entries,
        interpret=True,
    )
    assert not bool(overflow)
    got = np.asarray(body[: plan.out_size]).astype(np.uint8).tobytes()
    assert got == b"".join(payloads)


@pytest.mark.slow
def test_v5_multi_segment_decode():
    """v6 Phase B across several 512 KiB output segments with window carry
    and non-128-aligned per-segment cell ranges."""
    pytest.importorskip("jax")
    from debigulator_tpu.ops.scanner import scan_stream_cells

    rng = np.random.default_rng(7)
    words = rng.integers(0, 300, 300_000)
    payload = b" ".join(b"w%d" % w for w in words)  # ~1.4 MB, matchy
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = co.compress(payload) + co.flush()
    blocks, lengths, cells = scan_stream_cells(stream, v3.CELL_BITS)
    plan = v3.build_plan_v3(stream, blocks, lengths, cells=cells)
    arrays = v3.plan_arrays_v3(plan)
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    assert n_seg >= 2
    body, overflow = v3._inflate_v5_jit(
        arrays, plan.n_bits, plan.slots, n_seg, exact=plan.exact_entries,
        interpret=True,
    )
    assert not bool(overflow)
    got = np.asarray(body[: plan.out_size]).astype(np.uint8).tobytes()
    assert got == payload
