"""VERDICT r4 item 7 gate: 4096x4096 RGBA PNG through the FUSED device
path (tiled wavefront unfilter), bit-exact vs the NumPy oracle."""
from debigulator_tpu.utils.config import setup_jax_cache
setup_jax_cache()
import struct
import time
import zlib

import numpy as np

from debigulator_tpu.models.pipeline import decode_png_device
from debigulator_tpu.ops.unfilter import unfilter_image as unfilter_oracle

H = W = 4096
rng = np.random.default_rng(5)
# Compressible-ish pixels with all filter types exercised by the encoder:
base = rng.integers(0, 256, (H, W, 4), dtype=np.uint8)
base[::3] = base[0]
base[:, ::2, 1] = 77

# Build the PNG with stdlib zlib (tool-side fixture synthesis only).
stride = W * 4
raw = bytearray()
ft = np.tile(np.array([0, 1, 2, 3, 4], np.uint8), H // 5 + 1)[:H]
prev = np.zeros(stride, np.int32)
for y in range(H):
    row = base[y].reshape(-1).astype(np.int32)
    f = int(ft[y])
    a = np.concatenate([np.zeros(4, np.int32), row[:-4]])
    pa = np.concatenate([np.zeros(4, np.int32), prev[:-4]])
    if f == 0: res = row
    elif f == 1: res = row - a
    elif f == 2: res = row - prev
    elif f == 3: res = row - ((a + prev) >> 1)
    else:
        p = a + prev - pa
        pl_ = np.abs(p - a); pb = np.abs(p - prev); pc = np.abs(p - pa)
        pred = np.where((pl_ <= pb) & (pl_ <= pc), a, np.where(pb <= pc, prev, pa))
        res = row - pred
    raw.append(f)
    raw.extend((res & 0xFF).astype(np.uint8).tobytes())
    prev = row

comp = zlib.compress(bytes(raw), 6)
def chunk(typ, payload):
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))
png = (b"\x89PNG\r\n\x1a\n"
       + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0)))
for i in range(0, len(comp), 1 << 20):
    png += chunk(b"IDAT", comp[i:i + (1 << 20)])
png += chunk(b"IEND", b"")
print(f"synthetic png: {len(png)/1e6:.1f} MB compressed, {H*W*4/1e6:.0f} MB RGBA")

t0 = time.time()
rgba = decode_png_device(bytes(png))
print(f"device decode: {time.time()-t0:.2f}s (incl compile on first run)")
assert rgba.shape == (H, W, 4)
# Oracle: NumPy unfilter of the known raw scanlines.
recon = np.asarray(unfilter_oracle(np.frombuffer(bytes(raw), np.uint8), H, W, 4))
assert (rgba.reshape(H, W*4) == recon.reshape(H, W*4)).all(), "MISMATCH vs oracle"
assert (rgba == base).all(), "MISMATCH vs source pixels"
t0 = time.time()
rgba = decode_png_device(bytes(png))
dt = time.time() - t0
print(f"4096x4096 fused decode OK, bit-exact; warm {dt:.2f}s = {H*W*4/dt/1e6:.0f} MB/s")
