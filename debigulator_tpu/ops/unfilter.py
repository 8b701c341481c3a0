"""PNG scanline (un)filtering.

Parity target: reference decode_png.c:441-541 (Paeth predictor + filters
0-4) and decode_png.c:1422-1507 (the h×w×bpp reconstruction triple loop),
and the encoder side stb_write.h:1092-1170 (per-row best-of-5 filter
search).

Design (TPU-first):

* The reconstruction recurrence couples pixel (x, y) to (x-1, y), (x, y-1)
  and (x-1, y-1) — an anti-diagonal wavefront.  The device kernel
  (ops.unfilter_wavefront) walks diagonals with rows as vector lanes.
* This module holds the NumPy oracle (used by the host pipeline and as the
  test ground truth) plus the fully-vectorized forms for the cheap cases
  (None/Up whole-image, Sub via per-row cumsum) that need no wavefront.
"""

from __future__ import annotations

import numpy as np

from debigulator_tpu import constants as C


class FilterError(ValueError):
    pass


def paeth(a, b, c):
    """Paeth predictor (PNG spec §9.4), vectorized over arrays."""
    a = a.astype(np.int32)
    b = b.astype(np.int32)
    c = c.astype(np.int32)
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def unfilter_image(filtered: np.ndarray, height: int, width: int, bpp: int) -> np.ndarray:
    """Reconstruct raw bytes from filtered scanlines (NumPy oracle).

    Args:
      filtered: (height * (1 + width*bpp),) uint8 — filter byte + row data.
    Returns (height, width*bpp) uint8 reconstructed bytes.
    """
    stride = width * bpp
    filtered = np.asarray(filtered, dtype=np.uint8).reshape(height, 1 + stride)
    ftypes = filtered[:, 0]
    if np.any(ftypes > 4):
        raise FilterError(f"invalid filter type {int(ftypes.max())}")
    rows = filtered[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        cur = rows[y]
        if f == C.PNG_FILTER_NONE:
            rec = cur.copy()
        elif f == C.PNG_FILTER_UP:
            rec = cur + prev
        elif f == C.PNG_FILTER_SUB:
            # Sub is a per-channel prefix-sum mod 256.
            rec = cur.reshape(-1, bpp).astype(np.uint32)
            rec = np.cumsum(rec, axis=0, dtype=np.uint32).astype(np.uint8).reshape(-1)
        elif f == C.PNG_FILTER_AVERAGE:
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp].astype(np.int32)
                rec[x : x + bpp] = (
                    cur[x : x + bpp].astype(np.int32) + ((left + up) >> 1)
                ).astype(np.uint8)
                left = rec[x : x + bpp].astype(np.int32)
        else:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                rec[x : x + bpp] = cur[x : x + bpp] + paeth(left, up, upleft)
                left = rec[x : x + bpp]
                upleft = up
        out[y] = rec
        prev = rec
    return out


def filter_row(raw: np.ndarray, prev: np.ndarray, bpp: int, ftype: int) -> np.ndarray:
    """Apply PNG filter `ftype` to one raw row (encoder direction)."""
    raw = raw.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    upleft = np.zeros_like(prev)
    upleft[bpp:] = prev[:-bpp]
    if ftype == C.PNG_FILTER_NONE:
        out = raw
    elif ftype == C.PNG_FILTER_SUB:
        out = raw - left
    elif ftype == C.PNG_FILTER_UP:
        out = raw - prev
    elif ftype == C.PNG_FILTER_AVERAGE:
        out = raw - ((left + prev) >> 1)
    elif ftype == C.PNG_FILTER_PAETH:
        out = raw - paeth(
            left.astype(np.uint8), prev.astype(np.uint8), upleft.astype(np.uint8)
        ).astype(np.int32)
    else:
        raise FilterError(f"invalid filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def filter_image_best(raw: np.ndarray, height: int, width: int, bpp: int) -> np.ndarray:
    """Per-row best-of-5 filter search by minimum sum of |residual| as signed
    bytes (the stb/libpng MSAD heuristic, stb_write.h:1146-1170).

    Filters depend only on *raw* neighbor rows, so all rows and all five
    candidates compute at once (no row recurrence — unlike unfiltering).
    Returns (height*(1+width*bpp),) uint8 filtered stream.
    """
    stride = width * bpp
    raw = np.asarray(raw, dtype=np.uint8).reshape(height, stride).astype(np.int32)
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, bpp:] = raw[:-1, :-bpp]
    cands = np.stack(
        [
            raw,
            raw - left,
            raw - up,
            raw - ((left + up) >> 1),
            raw - paeth(left, up, upleft).astype(np.int32),
        ]
    ).astype(np.uint8)  # (5, h, stride), mod 256
    scores = np.abs(cands.astype(np.int8).astype(np.int32)).sum(axis=2)  # (5, h)
    best_f = scores.argmin(axis=0)  # (h,)
    out = np.empty((height, 1 + stride), dtype=np.uint8)
    out[:, 0] = best_f
    out[:, 1:] = cands[best_f, np.arange(height)]
    return out.reshape(-1)


def filter_image_best_device(raw, height: int, width: int, bpp: int):
    """jnp form of the filter search (device path; same MSAD heuristic)."""
    import jax.numpy as jnp

    stride = width * bpp
    raw = jnp.asarray(raw).reshape(height, stride).astype(jnp.int32)
    left = jnp.pad(raw, ((0, 0), (bpp, 0)))[:, :stride]
    up = jnp.pad(raw, ((1, 0), (0, 0)))[:height]
    upleft = jnp.pad(raw, ((1, 0), (bpp, 0)))[:height, :stride]

    p = left + up - upleft
    pa, pb, pc = jnp.abs(p - left), jnp.abs(p - up), jnp.abs(p - upleft)
    paeth_pred = jnp.where(
        (pa <= pb) & (pa <= pc), left, jnp.where(pb <= pc, up, upleft)
    )
    cands = (
        jnp.stack(
            [raw, raw - left, raw - up, raw - ((left + up) >> 1), raw - paeth_pred]
        )
        & 0xFF
    )
    signed = jnp.where(cands > 127, cands - 256, cands)
    scores = jnp.abs(signed).sum(axis=2)
    best_f = jnp.argmin(scores, axis=0)
    chosen = jnp.take_along_axis(cands, best_f[None, :, None], axis=0)[0]
    out = jnp.concatenate(
        [best_f[:, None].astype(jnp.uint8), chosen.astype(jnp.uint8)], axis=1
    )
    return out.reshape(-1)
