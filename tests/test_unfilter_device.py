"""Device unfilter kernels vs the NumPy oracle."""

import numpy as np
import pytest

from debigulator_tpu import constants as C
from debigulator_tpu.ops import unfilter as uf
from debigulator_tpu.ops.unfilter_device import (
    unfilter_device,
    unfilter_rowfast,
    unfilter_subfast,
    unfilter_wavefront,
)


def _make_filtered(rng, h, w, bpp, filter_choices):
    raw = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    ftypes = rng.choice(filter_choices, size=h)
    filtered = np.empty((h, 1 + w * bpp), np.uint8)
    prev = np.zeros(w * bpp, np.uint8)
    for y in range(h):
        filtered[y, 0] = ftypes[y]
        filtered[y, 1:] = uf.filter_row(raw[y], prev, bpp, int(ftypes[y]))
        prev = raw[y]
    return filtered.reshape(-1), raw


@pytest.mark.parametrize("bpp", [1, 3, 4])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_wavefront_all_filters(bpp, filters):
    rng = np.random.default_rng(bpp * 10 + len(filters))
    h, w = 17, 23
    filtered, raw = _make_filtered(rng, h, w, bpp, filters)
    got = np.asarray(unfilter_wavefront(filtered, h, w, bpp))
    np.testing.assert_array_equal(got, raw)


def test_rowfast_matches_oracle():
    rng = np.random.default_rng(0)
    h, w, bpp = 31, 19, 4
    filtered, raw = _make_filtered(rng, h, w, bpp, [0, 2])
    got = np.asarray(unfilter_rowfast(filtered, h, w, bpp))
    np.testing.assert_array_equal(got, raw)


def test_subfast_matches_oracle():
    rng = np.random.default_rng(1)
    h, w, bpp = 12, 40, 3
    filtered, raw = _make_filtered(rng, h, w, bpp, [0, 1])
    got = np.asarray(unfilter_subfast(filtered, h, w, bpp))
    np.testing.assert_array_equal(got, raw)


def test_dispatcher_on_corpus_like_sizes():
    rng = np.random.default_rng(2)
    for h, w, bpp, filters in [
        (64, 48, 4, [0, 1, 2, 3, 4]),
        (20, 100, 3, [2]),
        (5, 5, 1, [4]),
        (1, 7, 4, [1]),
        (7, 1, 4, [0, 4]),
    ]:
        filtered, raw = _make_filtered(rng, h, w, bpp, filters)
        got = unfilter_device(filtered, h, w, bpp)
        np.testing.assert_array_equal(got, raw, err_msg=f"{h}x{w}x{bpp} {filters}")
