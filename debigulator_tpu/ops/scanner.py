"""Host-side DEFLATE stream scanner: block index + per-block code lengths.

The device pipeline needs, per block: bit boundaries, output offsets, and
the Huffman code lengths (reference analog: the header parsing at
inflate.c:901-917 / :1204-1289).  Finding where block k+1 starts requires
decoding block k, so an exact index implies one serial pass; that pass is
done here on the host — by the native C++ scanner when built (fast path),
else by the Python oracle — while all symbol/LZ77/unfilter work runs on
device.

The scanner is the DEFLATE analog of a dataloader: a thin, IO-side native
component feeding the accelerator.
"""

from __future__ import annotations

import numpy as np

from debigulator_tpu import constants as C
from debigulator_tpu.ops.inflate_ref import (
    BlockInfo,
    _BitReader,
    inflate,
    read_dynamic_lengths,
)

_native = None
_native_checked = False
_native_lock = __import__("threading").Lock()


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        with _native_lock:
            if not _native_checked:
                try:
                    from debigulator_tpu.native import scanner as native_scanner

                    if not native_scanner.available():
                        raise RuntimeError("native lib failed to load")
                    _native = native_scanner
                except Exception:
                    _native = None
                _native_checked = True
    return _native


def scan_stream(data) -> tuple[list[BlockInfo], list]:
    """Index a raw DEFLATE stream.

    Returns (blocks, lengths) where lengths[b] is (litlen_lengths,
    dist_lengths) for Huffman blocks and None for stored blocks.
    """
    native = _get_native()
    if native is not None:
        return native.scan_stream(bytes(memoryview(data)))
    return _scan_stream_py(data)


def scan_stream_cells(data, cell_bits: int):
    """Index + exact per-cell decoder entry states (native fast path).

    Returns (blocks, lengths, cells) with cells = (states int64 array,
    pend int32 array, mct int) in the virtual cell layout of inflate_v3
    — mct is the scanner's exact per-cell token bound (max tokens
    decoded by any single cell, used to pick the tape slot count without
    an overflow probe) — or cells=None when the native scanner is
    unavailable (callers then fall back to the speculative entry
    fixpoint).
    """
    native = _get_native()
    if native is not None:
        return native.scan_stream(bytes(memoryview(data)), cell_bits=cell_bits)
    blocks, lengths = _scan_stream_py(data)
    return blocks, lengths, None


def scan_stream_records(data, cell_bits: int):
    """Index + cell entries + dense token records (v8 pipeline).

    Returns (blocks, lengths, cells, recs); recs is None when the native
    scanner is unavailable (callers fall back to the tape-walk pipelines).
    """
    native = _get_native()
    if native is not None:
        return native.scan_stream_records(
            bytes(memoryview(data)), cell_bits=cell_bits)
    blocks, lengths = _scan_stream_py(data)
    return blocks, lengths, None, None


def _scan_stream_py(data) -> tuple[list[BlockInfo], list]:
    _, blocks = inflate(data)
    lengths: list = []
    fixed = (C.fixed_litlen_lengths(), C.fixed_dist_lengths())
    for b in blocks:
        if b.btype == C.BTYPE_STORED:
            lengths.append(None)
        elif b.btype == C.BTYPE_FIXED:
            lengths.append(fixed)
        else:
            br = _BitReader(data, b.start_bit + 3)
            lengths.append(read_dynamic_lengths(br))
    return blocks, lengths
