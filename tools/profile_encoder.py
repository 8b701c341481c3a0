"""Phase timing for the device DEFLATE encoder on the real chip."""
from debigulator_tpu.utils.config import setup_jax_cache
setup_jax_cache()
import time

import jax
import jax.numpy as jnp
import numpy as np

from debigulator_tpu.models import png_codec
from debigulator_tpu.ops import deflate_encode as enc
from debigulator_tpu.ops import deflate_encode_jnp as dj
from debigulator_tpu.ops.unfilter import filter_image_best

rgba = png_codec.decode_png(open("/root/reference/resources/gimp_test.png", "rb").read())
rh, rw = rgba.shape[:2]
filt = np.asarray(filter_image_best(rgba.reshape(rh, rw * 4), rh, rw, 4)).tobytes()
data_np = np.frombuffer(filt, np.uint8)
n = len(data_np)
stride = rw * 4 + 1
probe = jax.jit(lambda x: x.reshape(-1)[:8])
dev = jax.device_put(data_np)
np.asarray(probe(dev.astype(jnp.int32)))

out = dj.deflate_fixed_device(filt, stride=stride, dev_data=dev)  # warm
t0 = time.time(); out = dj.deflate_fixed_device(filt, stride=stride, dev_data=dev)
print(f"total device-encode: {(time.time()-t0)*1e3:.1f} ms -> {n/ (time.time()-t0)/1e6:.1f} MB/s, {len(out)} B")

# Phase: select (fused lengths + walk + readback)
t0 = time.time(); sel, lens, dists = dj.lz77_select_device(data_np, stride=stride, dev_data=dev)
print(f"select (lengths+walk+readback): {(time.time()-t0)*1e3:.1f} ms, {len(sel)} matches")
# Phase: parse (select + token assembly)
t0 = time.time(); tokens = dj.lz77_parse_device(data_np, stride=stride, dev_data=dev)
print(f"parse: {(time.time()-t0)*1e3:.1f} ms, {len(tokens[0])} tokens")
# Phase: host fields+pack
t0 = time.time()
vals, bits = enc._tokens_to_fields(tokens, enc._FIXED_LITLEN_CODES, enc._FIXED_LITLEN_LENGTHS, enc._FIXED_DIST_CODES, enc._FIXED_DIST_LENGTHS)
print(f"tokens_to_fields: {(time.time()-t0)*1e3:.1f} ms")
t0 = time.time(); packed, _ = enc.pack_bits(vals, bits, prefix_bits=3, prefix_val=0b011)
print(f"pack_bits: {(time.time()-t0)*1e3:.1f} ms")
