"""CRC-32 and Adler-32: data-parallel, shardable, bit-exact.

The reference computes CRC-32 with a serial per-byte table loop
(reference decode_png.c:313-334 `update_crc` over the hardcoded table at
decode_png.c:29-286) and never verifies Adler-32.  Here both checksums are
designed for parallel hardware from the start:

* CRC-32 is linear over GF(2): ``crc_raw(A ⊕ B) = crc_raw(A) ⊕ crc_raw(B)``
  and leading zeros are free.  We therefore reshape the buffer into lanes,
  run the byte recurrence *across* lanes (sequential only in the short chunk
  dimension), and tree-combine lane CRCs with precomputed
  "multiply by x^(8k)" GF(2) matrices.  The same combine matrices give
  ``crc32_combine`` for stitching shard-local CRCs over a device mesh.
* Adler-32 reduces to two weighted sums — embarrassingly parallel.

NumPy host versions and jnp device versions share the same tables.
"""

from __future__ import annotations

import numpy as np

from debigulator_tpu.constants import ADLER_MOD, CRC32_POLY


def _make_crc_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(CRC32_POLY), t >> 1)
    return t


CRC_TABLE = _make_crc_table()

# ---------------------------------------------------------------------------
# GF(2) matrix algebra over the CRC state (32x32 matrices as 32 uint32 columns)
# ---------------------------------------------------------------------------


def gf2_matvec(mat: np.ndarray, vec):
    """mat: (32,) uint32 columns; vec: uint32 scalar/array. Returns mat @ vec."""
    vec = np.asarray(vec, dtype=np.uint32)
    out = np.zeros_like(vec)
    for j in range(32):
        bit = (vec >> np.uint32(j)) & np.uint32(1)
        out ^= bit * mat[j]
    return out


def gf2_matmat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a @ b) with both as column arrays: result column j = a @ b[:, j]."""
    return gf2_matvec(a, b)


def _zero_byte_matrix() -> np.ndarray:
    """Matrix of one step ``s' = (s >> 8) ^ T[s & 0xFF]`` with input byte 0."""
    cols = np.empty(32, dtype=np.uint32)
    for j in range(32):
        s = np.uint32(1 << j)
        cols[j] = (s >> np.uint32(8)) ^ CRC_TABLE[int(s & np.uint32(0xFF))]
    return cols


#: SHIFT_POW2[k] = matrix appending 2^k zero bytes (k in 0..31).
def _make_shift_pow2() -> np.ndarray:
    mats = np.empty((32, 32), dtype=np.uint32)
    m = _zero_byte_matrix()
    for k in range(32):
        mats[k] = m
        m = gf2_matmat(m, m)
    return mats


SHIFT_POW2 = _make_shift_pow2()


def crc_shift(crc, nbytes: int):
    """Apply "append nbytes zero bytes" to a raw CRC state (scalar or array)."""
    crc = np.asarray(crc, dtype=np.uint32)
    k = 0
    while nbytes:
        if nbytes & 1:
            crc = gf2_matvec(SHIFT_POW2[k], crc)
        nbytes >>= 1
        k += 1
    return crc


def crc32_combine(crc_a: int, crc_b: int, len_b: int) -> int:
    """CRC32(A||B) from CRC32(A), CRC32(B), len(B) (zlib-compatible algebra)."""
    # With F(s, M) the table recurrence: crc32(M) = F(~0, M) ^ ~0.
    # F(s, B) = F(s, 0^|B|) ^ F(0, B); and F(0,B) = crc32(B) ^ ~0 ^ F(~0, 0^|B|... )
    # Easiest correct route: work in raw-linear space.
    a_raw = np.uint32(crc_a)
    b_raw = np.uint32(crc_b)
    # crc32(A||B) = shift(crc32(A) ^ FF, |B|) ^ FF ^ crc32(B) ^ shift(FF,|B|) ^ FF
    # Derivation: crc32(X)^~0 = F(~0,X). F(~0,A||B) = F(F(~0,A),B)
    #   = shift(F(~0,A),|B|) ^ F(0,B);  F(0,B) = F(~0,B) ^ shift(~0,|B|)
    ff = np.uint32(0xFFFFFFFF)
    fa = a_raw ^ ff  # F(~0, A)
    fb = b_raw ^ ff  # F(~0, B)
    f0b = fb ^ crc_shift(ff, len_b)  # F(0, B)
    fab = crc_shift(fa, len_b) ^ f0b
    return int(fab ^ ff)


# ---------------------------------------------------------------------------
# Host (NumPy) checksums
# ---------------------------------------------------------------------------


_NATIVE_CK = None


def _native_checksums():
    """The native slice-by-8 forms when the library is present (the
    NumPy lane-parallel forms below are ~8 MB/s on the small per-chunk
    buffers PNG parsing feeds them — 1.1 s of the round-4 corpus walk
    was host CRC)."""
    global _NATIVE_CK
    if _NATIVE_CK is None:
        try:
            from debigulator_tpu.native import scanner as _ns

            _NATIVE_CK = _ns if _ns.available() else False
        except Exception:  # pragma: no cover - import-time breakage only
            _NATIVE_CK = False
    return _NATIVE_CK


def crc32(data, crc: int = 0) -> int:
    """CRC-32 (gzip/PNG flavor) of a bytes-like object, lane-parallel."""
    ns = _native_checksums()
    if ns:
        return ns.crc32(data, crc)
    buf = np.frombuffer(memoryview(data), dtype=np.uint8)
    n = buf.size
    if n == 0:
        return crc
    state = np.uint32(crc) ^ np.uint32(0xFFFFFFFF)
    # Lead with zeros so every lane has equal length; leading zeros are free
    # in raw-linear space: F(0, 0^k || M) = F(0, M).
    lanes = max(1, min(4096, n // 64))
    chunk = -(-n // lanes)
    pad = lanes * chunk - n
    padded = np.zeros(lanes * chunk, dtype=np.uint8)
    padded[pad:] = buf
    cols = padded.reshape(lanes, chunk)
    s = np.zeros(lanes, dtype=np.uint32)
    for i in range(chunk):  # sequential in chunk dim, vector across lanes
        s = (s >> np.uint32(8)) ^ CRC_TABLE[(s ^ cols[:, i]) & np.uint32(0xFF)]
    # Tree-combine lanes: lane l covers bytes ending (lanes-1-l)*chunk from end.
    m = lanes
    shift_mat = None
    width = chunk
    while m > 1:
        # combine pairs (2i, 2i+1): crc = shift(left, width) ^ right
        if m % 2:
            s = np.concatenate([np.zeros(1, dtype=np.uint32), s])
            m += 1
        left, right = s[0::2], s[1::2]
        # shift left lanes by current width
        sl = left.copy()
        nb, k = width, 0
        while nb:
            if nb & 1:
                sl = gf2_matvec(SHIFT_POW2[k], sl)
            nb >>= 1
            k += 1
        s = sl ^ right
        m //= 2
        width *= 2
    raw = s[0]
    # We computed F(0, 0^pad || M) but need F(init_state, M):
    raw ^= crc_shift(state, n)
    return int(raw ^ np.uint32(0xFFFFFFFF))


def adler32(data, adler: int = 1) -> int:
    """Adler-32 (zlib flavor), fully vectorized."""
    ns = _native_checksums()
    if ns:
        return ns.adler32(data, adler)
    buf = np.frombuffer(memoryview(data), dtype=np.uint8).astype(np.uint64)
    n = buf.size
    s1 = np.uint64(adler & 0xFFFF)
    s2 = np.uint64((adler >> 16) & 0xFFFF)
    if n:
        total = int(buf.sum())
        # s2 += n*s1_init + sum_i (n-i)*b_i
        weights = np.arange(n, 0, -1, dtype=np.uint64)
        wsum = int((buf * weights).sum())
        s2 = (int(s2) + n * int(s1) + wsum) % ADLER_MOD
        s1 = (int(s1) + total) % ADLER_MOD
    return (int(s2) << 16) | int(s1)


# ---------------------------------------------------------------------------
# Device (jnp) checksums — same algorithm, jittable, shard-combinable
# ---------------------------------------------------------------------------


def _matvec_jnp(mat, vec):
    import jax.numpy as jnp

    out = jnp.zeros_like(vec)
    for j in range(32):
        bit = (vec >> jnp.uint32(j)) & jnp.uint32(1)
        out = out ^ bit * mat[j]
    return out


def _shift_static_jnp(vec, nbytes: int, shift_pow2):
    k = 0
    while nbytes:
        if nbytes & 1:
            vec = _matvec_jnp(shift_pow2[k], vec)
        nbytes >>= 1
        k += 1
    return vec


def _shift_traced_jnp(vec, nbytes, shift_pow2):
    """Shift by a traced byte count: 32 predicated matrix applications."""
    import jax.numpy as jnp

    nbytes = jnp.asarray(nbytes, jnp.uint32)
    for k in range(32):
        bit = (nbytes >> jnp.uint32(k)) & jnp.uint32(1)
        shifted = _matvec_jnp(shift_pow2[k], vec)
        vec = jnp.where(bit.astype(bool), shifted, vec)
    return vec


def crc32_raw_jnp(buf):
    """Raw linear CRC state F(0, buf) of a full static uint8 array (jittable).

    Leading zero bytes do not affect the result, so callers with variable
    message lengths mask + roll the message to the buffer tail first.
    """
    import jax
    import jax.numpy as jnp

    buf = buf.astype(jnp.uint8)
    n = buf.shape[0]
    table = jnp.asarray(CRC_TABLE)
    shift_pow2 = jnp.asarray(SHIFT_POW2)

    lanes = max(1, min(1024, n // 8))
    chunk = -(-n // lanes)
    pad = lanes * chunk - n
    padded = jnp.concatenate([jnp.zeros(pad, jnp.uint8), buf])
    cols = padded.reshape(lanes, chunk)

    def step(s, col):
        idx = ((s ^ col.astype(jnp.uint32)) & jnp.uint32(0xFF)).astype(jnp.int32)
        return (s >> jnp.uint32(8)) ^ table[idx], None

    s, _ = jax.lax.scan(step, jnp.zeros(lanes, jnp.uint32), cols.T)

    # Tree-combine lanes (lane l is followed by (lanes-1-l)*chunk bytes).
    m, width = lanes, chunk
    while m > 1:
        if m % 2:
            s = jnp.concatenate([jnp.zeros(1, jnp.uint32), s])
            m += 1
        left, right = s[0::2], s[1::2]
        s = _shift_static_jnp(left, width, shift_pow2) ^ right
        m //= 2
        width *= 2
    return s[0]


def crc32_jnp(buf, length=None):
    """CRC-32 of buf[:length]; jittable; `length` may be traced.

    Variable lengths are handled by rolling the message to the buffer tail
    (leading zeros are free in raw-linear space) and applying the init-state
    contribution with a traced GF(2) shift.
    """
    import jax.numpy as jnp

    buf = buf.astype(jnp.uint8)
    n = buf.shape[0]
    shift_pow2 = jnp.asarray(SHIFT_POW2)
    ff = jnp.uint32(0xFFFFFFFF)
    if length is None or (isinstance(length, int) and length == n):
        raw = crc32_raw_jnp(buf)
        return _shift_static_jnp(ff, n, shift_pow2) ^ raw ^ ff
    idx = jnp.arange(n)
    ln = jnp.asarray(length, jnp.int32)
    data = jnp.where(idx < ln, buf, 0)
    rolled = jnp.roll(data, n - ln)
    raw = crc32_raw_jnp(rolled)
    if isinstance(length, int):
        init = _shift_static_jnp(ff, length, shift_pow2)
    else:
        init = _shift_traced_jnp(ff, ln.astype(jnp.uint32), shift_pow2)
    return init ^ raw ^ ff


def crc_shift_matrix(nbytes: int) -> np.ndarray:
    """Column form of the append-nbytes-zeros matrix."""
    mat = np.array([np.uint32(1 << j) for j in range(32)], dtype=np.uint32)
    k = 0
    while nbytes:
        if nbytes & 1:
            mat = gf2_matmat(SHIFT_POW2[k], mat)
        nbytes >>= 1
        k += 1
    return mat


def adler32_jnp(buf, length=None):
    """Adler-32 of buf[:length]; jittable, uint32-safe; length may be traced.

    s1 = 1 + Σ b_i, s2 = length + Σ (length - i)·b_i  (mod 65521), computed
    with two-level modular partial sums so nothing exceeds uint32 range.
    """
    import jax.numpy as jnp

    n = buf.shape[0]
    if length is None:
        length = n
    buf = buf.astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.uint32)
    ln = jnp.asarray(length, jnp.uint32)
    mod = jnp.uint32(ADLER_MOD)
    mask = idx < ln
    vals = jnp.where(mask, buf, jnp.uint32(0))
    # Per-term weighted values, pre-reduced: ((ln - i) % m) * b < 2^24.
    w = jnp.where(mask, (ln - idx) % mod, jnp.uint32(0))
    terms = (w * vals) % mod  # < m

    def _modsum(x):
        # Tree-reduce mod m keeping partial sums < 2^32 (chunks of 256 < 2^24·256).
        while x.shape[0] > 1:
            k = x.shape[0]
            c = min(256, k)
            padn = (-k) % c
            x = jnp.concatenate([x, jnp.zeros(padn, jnp.uint32)])
            x = jnp.sum(x.reshape(-1, c), axis=1) % mod
        return x[0]

    s1 = (jnp.uint32(1) + _modsum(vals % mod)) % mod
    s2 = (ln % mod + _modsum(terms)) % mod
    return (s2 << jnp.uint32(16)) | s1


_jit_cache = {}


def _jitted(fn):
    import jax

    if fn not in _jit_cache:
        _jit_cache[fn] = jax.jit(fn)
    return _jit_cache[fn]


def adler32_device(buf) -> int:
    """Adler-32 of an on-device byte buffer (int32/uint8 values 0-255);
    ONE jitted dispatch + a 4-byte result readback (an unjitted op chain
    costs ~20 ms per dispatch through the dev tunnel)."""
    import jax.numpy as jnp

    return int(_jitted(adler32_jnp)(jnp.asarray(buf)))


def crc32_device(buf) -> int:
    """CRC-32 of an on-device byte buffer; one dispatch + 4-byte readback."""
    import jax.numpy as jnp

    return int(_jitted(crc32_jnp)(jnp.asarray(buf)))
