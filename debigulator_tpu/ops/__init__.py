"""Device/compute ops: bit math, Huffman, inflate, LZ77, checksums, unfilter."""
