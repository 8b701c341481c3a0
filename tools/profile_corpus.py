"""Profile decode_png_corpus_device phase-by-phase on the real chip."""
from debigulator_tpu.utils.config import setup_jax_cache
setup_jax_cache()
import glob
import time

import jax
import numpy as np

from debigulator_tpu.models.pipeline import decode_png_corpus_device

files = sorted(glob.glob("/root/reference/resources/*.png"))
blobs = [open(f, "rb").read() for f in files]
probe = jax.jit(lambda x: x.reshape(-1)[:8])

# warm (compiles)
t0 = time.time()
imgs = decode_png_corpus_device(blobs)
print(f"warm (compile) {time.time()-t0:.2f}s")
rgba_bytes = sum(i.nbytes for i in imgs)

# Golden gate: every image must match its recorded sha256.
import hashlib, json, os
gold = json.load(open("/root/repo/tests/golden_png.json"))
for f, img in zip(files, imgs):
    name = os.path.basename(f)[:-4]
    got = hashlib.sha256(img.tobytes()).hexdigest()
    assert got == gold[name]["sha256"], f"{name} MISMATCH"
print("golden: 15/15 sha256 ok")

for rep in range(2):
    t0 = time.time()
    imgs = decode_png_corpus_device(blobs)
    dt = time.time() - t0
    print(f"full (numpy out): {dt*1e3:.0f} ms -> {rgba_bytes/dt/1e6:.1f} MB/s")

from debigulator_tpu.utils.config import get_config
get_config().verbosity = 2
for rep in range(2):
    t0 = time.time()
    pix = decode_png_corpus_device(blobs, as_numpy=False)
    np.asarray(probe(pix[-1]))
    dt = time.time() - t0
    print(f"device-resident: {dt*1e3:.0f} ms -> {rgba_bytes/dt/1e6:.1f} MB/s")

import os
if os.environ.get("DBG_CORPUS_TRACE"):
    from debigulator_tpu.utils.profiling import device_trace, trace_op_summary
    logdir = "/tmp/dbg_trace_corpus"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with device_trace(logdir):
        pix = decode_png_corpus_device(blobs, as_numpy=False)
        np.asarray(probe(pix[-1]))
    for ms, name in trace_op_summary(logdir, top=30):
        print(f"{ms:9.2f} ms  {name}")
