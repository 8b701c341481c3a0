"""Pallas wavefront unfilter + fused PNG decode path (interpret mode)."""

import hashlib
import json
import pathlib

import numpy as np
import pytest

from debigulator_tpu.ops.unfilter import unfilter_image
from debigulator_tpu.ops.unfilter_pallas import unfilter_wavefront_pallas

RES = pathlib.Path("/root/reference/resources")
GOLDEN = json.load(open(pathlib.Path(__file__).parent / "golden_png.json"))


@pytest.mark.parametrize(
    "h,w,bpp", [(16, 16, 4), (8, 24, 3), (33, 17, 1), (12, 5, 2), (3, 50, 2)]
)
def test_wavefront_pallas_matches_oracle(h, w, bpp):
    rng = np.random.RandomState(h * 100 + w)
    raw = rng.randint(0, 256, h * (1 + w * bpp), dtype=np.uint8)
    raw = raw.reshape(h, -1)
    raw[:, 0] = rng.randint(0, 5, h)  # all five filter types
    flat = raw.reshape(-1)
    exp = np.asarray(unfilter_image(flat, h, w, bpp)).reshape(h, w * bpp)
    got = np.asarray(
        unfilter_wavefront_pallas(flat, h, w, bpp, interpret=True)
    )
    assert (got == exp).all()


@pytest.mark.slow
def test_fused_png_decode_matches_golden(monkeypatch):
    """The ONE-dispatch fused PNG path (v15 inflate + adler + Pallas
    unfilter) decodes bit-exact on a small corpus image."""
    monkeypatch.setenv("DBG_FORCE_FUSED_PNG", "1")
    from debigulator_tpu.models.pipeline import decode_png_device

    raw = (RES / "font.png").read_bytes()
    rgba = decode_png_device(raw)
    sha = hashlib.sha256(np.ascontiguousarray(rgba).tobytes()).hexdigest()
    assert sha == GOLDEN["font"]["sha256"]


def test_fused_png_corpus_matches_host(monkeypatch):
    """Fused corpus path (ONE merged inflate + per-image slice/Adler/
    unfilter dispatches) equals the host decoder on small synthetic
    images covering RGBA, RGB, and gray."""
    monkeypatch.setenv("DBG_FORCE_FUSED_PNG", "1")
    from debigulator_tpu.models import png_codec
    from debigulator_tpu.models.pipeline import decode_png_corpus_device

    rng = np.random.RandomState(7)
    blobs = []
    for h, w, ch in ((21, 13, 4), (16, 9, 3), (11, 30, 1)):
        img = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
        # Low-entropy rows so the encoder emits real matches, not stored.
        img[::2] = img[0]
        blobs.append(png_codec.encode_png(img))
    imgs = decode_png_corpus_device(blobs)
    for blob, got in zip(blobs, imgs):
        exp = png_codec.decode_png(blob)
        assert (np.asarray(got) == exp).all()
