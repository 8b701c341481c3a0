"""Sanitizer layer (SURVEY §5.2): the JAX analog of the reference's
AddressSanitizer-only build (build.sh:19) and valgrind recipes.

The reference's one blessed build runs under ASan; kernels here are
integer-only device code, so the equivalent guards are:

* ``debug_mode()`` — process-wide debug switches: ``jax_debug_nans``
  (any float sneaking into the integer pipelines trips immediately) and
  ``jax_disable_most_optimizations`` off-by-default knobs;
* ``checkified(fn)`` — wrap a jittable function with ``checkify`` so
  out-of-bounds indexing and div-by-zero inside jit raise structured
  errors instead of clamping silently (XLA's default).  Used by the
  debug tier of tests on the XLA oracle pipeline; interpret-mode Pallas
  (``interpret=True``, exercised throughout the test suite) remains the
  "sanitizer build" for the kernels themselves, with real bounds
  semantics per ref access.
"""

from __future__ import annotations

import contextlib
import functools


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Context: enable jax debug checks (debug_nans) and restore after."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified(fn, *, errors=None):
    """checkify-wrap ``fn``: returns a callable that raises
    ``jax.experimental.checkify.JaxRuntimeError`` on index-out-of-bounds
    / NaN / div-by-zero inside the traced computation."""
    from jax.experimental import checkify

    errs = errors if errors is not None else (
        checkify.index_checks | checkify.float_checks | checkify.div_checks
    )
    wrapped = checkify.checkify(fn, errors=errs)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = wrapped(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run
