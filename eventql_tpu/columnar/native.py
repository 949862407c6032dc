"""ctypes bindings for the native (C++) columnar codec.

Loads native/build/libeventql_native.so, building it on first use if a
toolchain is available. All entry points have numpy fallbacks in
eventql_tpu.columnar.cstable; the native path is the production ingest
codec (the reference's equivalent decoders are C++:
io/cstable/columns/*, util/util/BitPackDecoder.cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(
    os.path.join(_NATIVE_DIR, "build", "libeventql_native.so")
)

_lib = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("EVENTQL_TPU_NO_NATIVE") == "1":
        _load_failed = True
        return None
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None

    lib.evql_simdbp128_unpack.restype = ctypes.c_int
    lib.evql_simdbp128_unpack.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint32,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.evql_leb128_decode.restype = ctypes.c_int64
    lib.evql_leb128_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.evql_lenenc_strings.restype = ctypes.c_int64
    lib.evql_lenenc_strings.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _try_load() is not None


def simdbp128_unpack(buf: bytes, n: int, maxbits: int) -> Optional[np.ndarray]:
    lib = _try_load()
    if lib is None:
        return None
    out = np.zeros(n, dtype=np.uint32)
    rc = lib.evql_simdbp128_unpack(
        buf,
        len(buf),
        maxbits,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        return None
    return out


def leb128_decode(buf: bytes, count: int) -> Optional[np.ndarray]:
    lib = _try_load()
    if lib is None:
        return None
    out = np.zeros(count, dtype=np.uint64)
    rc = lib.evql_leb128_decode(
        buf, len(buf), count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    )
    if rc < 0:
        return None
    return out


def lenenc_strings(buf: bytes, count: int):
    lib = _try_load()
    if lib is None:
        return None
    offsets = np.zeros(count, dtype=np.uint64)
    lengths = np.zeros(count, dtype=np.uint32)
    rc = lib.evql_lenenc_strings(
        buf,
        len(buf),
        count,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc < 0:
        return None
    return offsets, lengths
