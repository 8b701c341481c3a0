"""debigulator_tpu — a TPU-native lossless-compression framework.

Brand-new JAX/XLA/Pallas re-design of the capabilities of
ArtOfBBQ/debigulator (DEFLATE + gzip + PNG + BMP codecs): speculative
lane-parallel Huffman decode, scan-based LZ77 resolution, vectorized PNG
(un)filtering, shardable checksums, and data-parallel batch decode over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from debigulator_tpu import constants  # noqa: F401
