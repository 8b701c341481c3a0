"""Format codecs (the framework's "model families"): gzip, zlib, PNG, BMP."""
