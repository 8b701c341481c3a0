"""Runtime configuration (replaces the reference's compile-time #defines,
SURVEY §5.6: INFLATE_SILENCE / DECODE_PNG_IGNORE_CRC_CHECKS / hardcoded
scratch sizes become explicit, runtime-switchable settings)."""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    #: Verify CRC-32 / Adler-32 / ISIZE on decode (reference skips most).
    verify_checksums: bool = True
    #: Reject malformed streams instead of best-effort output.
    strict: bool = True
    #: Use the native C++ host scanner when available.
    use_native_scanner: bool = True
    #: Use the Pallas LZ77 resolver on TPU backends.
    use_pallas_lz77: bool = True
    #: Persistent XLA compilation cache directory ("" disables).
    compilation_cache: str = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"
    )
    #: Verbosity: 0 silent, 1 decode summaries, 2 phase debug
    #: (read by utils.logging.log; CLIs raise it via -v/-vv).
    verbosity: int = int(os.environ.get("DBG_VERBOSITY", "0"))


_config = Config()


def get_config() -> Config:
    return _config


def setup_jax_cache() -> None:
    """Enable the persistent compilation cache (compiles through the remote
    service are expensive; the cache makes them one-time per shape)."""
    cfg = get_config()
    if cfg.compilation_cache:
        import jax

        os.makedirs(cfg.compilation_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
