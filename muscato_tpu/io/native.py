"""ctypes bindings for the native host library (native/muscato_native.cpp).

Provides CRC-32C and the snappy block/framed codecs at C speed; sz.py
dispatches here when the library is available and falls back to its pure
Python implementation otherwise.  `python native/build.py` builds it; this
module also attempts a one-time lazy build when a compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_LIB = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))
_SO = os.path.join(_NATIVE_DIR, "libmuscato_native.so")


def _try_build() -> None:
    src = os.path.join(_NATIVE_DIR, "muscato_native.cpp")
    if not os.path.exists(src):
        return
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


def get_lib():
    """The loaded library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and os.environ.get("MUSCATO_NO_NATIVE_BUILD") != "1":
        _try_build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mn_crc32c.restype = ctypes.c_uint32
    lib.mn_crc32c.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
    lib.mn_max_compressed.restype = ctypes.c_size_t
    lib.mn_max_compressed.argtypes = [ctypes.c_size_t]
    lib.mn_block_compress.restype = ctypes.c_longlong
    lib.mn_block_compress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.mn_block_decompress.restype = ctypes.c_longlong
    lib.mn_block_decompress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.mn_frame_max_compressed.restype = ctypes.c_size_t
    lib.mn_frame_max_compressed.argtypes = [ctypes.c_size_t]
    lib.mn_frame_compress.restype = ctypes.c_longlong
    lib.mn_frame_compress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.mn_frame_decompressed_bound.restype = ctypes.c_size_t
    lib.mn_frame_decompressed_bound.argtypes = [u8p, ctypes.c_size_t]
    lib.mn_frame_decompress.restype = ctypes.c_longlong
    lib.mn_frame_decompress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    _LIB = lib
    return _LIB


def _buf(data: bytes):
    return ctypes.cast(ctypes.create_string_buffer(data, len(data)), ctypes.POINTER(ctypes.c_uint8)), len(data)


def crc32c(data: bytes) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    p, n = _buf(data)
    return int(lib.mn_crc32c(p, n, 0))


def frame_compress(data: bytes) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    p, n = _buf(data)
    cap = int(lib.mn_frame_max_compressed(n))
    out = ctypes.create_string_buffer(cap)
    sz = lib.mn_frame_compress(p, n, ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), cap)
    if sz < 0:
        return None
    return out.raw[:sz]


def frame_decompress(data: bytes) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    p, n = _buf(data)
    cap = int(lib.mn_frame_decompressed_bound(p, n))
    out = ctypes.create_string_buffer(max(cap, 1))
    sz = lib.mn_frame_decompress(p, n, ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), cap)
    if sz < 0:
        return None
    return out.raw[:sz]
