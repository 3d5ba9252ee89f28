"""Loader for the native MPS tokenizer (_mps_native.cpp).

Compiles the C++ source into a shared library on first use (g++ -O2,
cached next to the source, rebuilt when the source is newer) and wraps
it with ctypes. Everything degrades gracefully: if g++ is missing, the
build fails, or FIRSTORDERLP_NO_NATIVE_MPS=1 is set, `load()` returns
None and mps.read_mps falls back to the pure-Python parser. Parity
between the two paths is asserted field-exactly by
tests/test_mps_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_mps_native.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_mps_native.so")

_lock = threading.Lock()
_lib = None
_load_attempted = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    return proc.returncode == 0 and os.path.exists(_LIB)


def load():
    """Returns the ctypes library handle, or None if unavailable."""
    global _lib, _load_attempted
    if os.environ.get("FIRSTORDERLP_NO_NATIVE_MPS"):
        return None
    with _lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        stale = (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        p = ctypes.POINTER
        lib.folp_mps_parse.restype = ctypes.c_void_p
        lib.folp_mps_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.folp_mps_error.restype = ctypes.c_char_p
        lib.folp_mps_error.argtypes = [ctypes.c_void_p]
        for fn in ("nvar", "ncon", "annz", "qnnz",
                   "varnames_len", "connames_len"):
            g = getattr(lib, f"folp_mps_{fn}")
            g.restype = ctypes.c_int64
            g.argtypes = [ctypes.c_void_p]
        lib.folp_mps_c0.restype = ctypes.c_double
        lib.folp_mps_c0.argtypes = [ctypes.c_void_p]
        for fn in ("name", "objsense"):
            g = getattr(lib, f"folp_mps_{fn}")
            g.restype = ctypes.c_char_p
            g.argtypes = [ctypes.c_void_p]
        f64p = p(ctypes.c_double)
        i64p = p(ctypes.c_int64)
        lib.folp_mps_copy.restype = None
        lib.folp_mps_copy.argtypes = [ctypes.c_void_p] + [f64p] * 5 + [
            i64p, i64p, f64p, i64p, i64p, f64p]
        for fn in ("varnames", "connames"):
            g = getattr(lib, f"folp_mps_{fn}")
            g.restype = None
            g.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.folp_mps_destroy.restype = None
        lib.folp_mps_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_bytes(lib, text: bytes):
    """Parses decompressed MPS bytes; returns an mps.MpsData.

    Raises mps.MpsParseError on malformed input (same condition set as
    the pure-Python parser; messages may differ in wording).
    """
    from . import mps  # deferred: avoid import cycle

    handle = lib.folp_mps_parse(text, len(text))
    try:
        err = lib.folp_mps_error(handle)
        if err:
            raise mps.MpsParseError(err.decode())

        nvar = lib.folp_mps_nvar(handle)
        ncon = lib.folp_mps_ncon(handle)
        annz = lib.folp_mps_annz(handle)
        qnnz = lib.folp_mps_qnnz(handle)

        c = np.empty(nvar)
        lvar = np.empty(nvar)
        uvar = np.empty(nvar)
        lcon = np.empty(ncon)
        ucon = np.empty(ncon)
        arows = np.empty(annz, dtype=np.int64)
        acols = np.empty(annz, dtype=np.int64)
        avals = np.empty(annz)
        qrows = np.empty(qnnz, dtype=np.int64)
        qcols = np.empty(qnnz, dtype=np.int64)
        qvals = np.empty(qnnz)

        def ptr(a, ty):
            # ctypes rejects a pointer into an empty array
            return a.ctypes.data_as(ctypes.POINTER(ty))

        lib.folp_mps_copy(
            handle,
            ptr(c, ctypes.c_double), ptr(lvar, ctypes.c_double),
            ptr(uvar, ctypes.c_double), ptr(lcon, ctypes.c_double),
            ptr(ucon, ctypes.c_double),
            ptr(arows, ctypes.c_int64), ptr(acols, ctypes.c_int64),
            ptr(avals, ctypes.c_double),
            ptr(qrows, ctypes.c_int64), ptr(qcols, ctypes.c_int64),
            ptr(qvals, ctypes.c_double),
        )

        def names(fn_len, fn_copy, count):
            n = fn_len(handle)
            if count == 0:
                return []
            buf = ctypes.create_string_buffer(n)
            fn_copy(handle, buf)
            return buf.raw[:n].decode().split("\n")

        varnames = names(lib.folp_mps_varnames_len,
                         lib.folp_mps_varnames, nvar)
        connames = names(lib.folp_mps_connames_len,
                         lib.folp_mps_connames, ncon)

        return mps.MpsData(
            name=lib.folp_mps_name(handle).decode(),
            objsense=lib.folp_mps_objsense(handle).decode(),
            nvar=int(nvar),
            ncon=int(ncon),
            c0=lib.folp_mps_c0(handle),
            c=c,
            lvar=lvar,
            uvar=uvar,
            lcon=lcon,
            ucon=ucon,
            arows=arows,
            acols=acols,
            avals=avals,
            qrows=qrows,
            qcols=qcols,
            qvals=qvals,
            varnames=varnames,
            connames=connames,
        )
    finally:
        lib.folp_mps_destroy(handle)
