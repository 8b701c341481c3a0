"""Native (C++) host runtime bindings: scanner, serial inflate, checksums.

The shared library is built from native/dbg_native.cpp on first use (g++ is
part of the environment); set DBG_NO_NATIVE=1 to force the pure-Python
fallbacks everywhere.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "dbg_native.cpp"
_SO = pathlib.Path(__file__).resolve().parent / "libdbg_native.so"


def _build() -> bool:
    if not _SRC.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", str(_SO), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable.

    Thread-safe: concurrent first calls (e.g. the merged-plan scan pool)
    block on the lock instead of observing the half-initialized state.
    """
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        return _get_lib_locked()


def _get_lib_locked():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    if os.environ.get("DBG_NO_NATIVE"):
        _TRIED = True
        return None
    if not _SO.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime
    ):
        if not _build():
            _TRIED = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _TRIED = True
        return None
    lib.dbg_scan.restype = ctypes.c_int64
    lib.dbg_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dbg_scan2.restype = ctypes.c_int64
    lib.dbg_scan2.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dbg_pack_groups.restype = ctypes.c_int64
    lib.dbg_pack_groups.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.dbg_taint.restype = ctypes.c_int64
    lib.dbg_taint.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.dbg_crc32.restype = ctypes.c_uint32
    lib.dbg_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
    lib.dbg_adler32.restype = ctypes.c_uint32
    lib.dbg_adler32.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
    _LIB = lib
    _TRIED = True
    return _LIB
