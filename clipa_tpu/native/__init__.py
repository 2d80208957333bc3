"""Native (C++) host components: tokenizer, JPEG decode, TFRecord scan.

Built lazily with the bundled Makefile (g++ + libjpeg-turbo); everything
has a pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libclipa_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build(force: bool = False) -> str:
    """Compiles the native library; returns its path."""
    with _lock:
        if force or not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-s"] + (["-B"] if force else []),
                           cwd=_DIR, check=True, capture_output=True)
    return _LIB_PATH


def load(auto_build: bool = True) -> ctypes.CDLL:
    """Loads (building if needed) the native library."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise OSError("native build previously failed")
    try:
        if auto_build:
            build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        _build_failed = True
        raise

    # --- wordpiece ---
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int64
    lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int32),
                              ctypes.c_int64]
    # --- jpeg ---
    lib.jpeg_info.restype = ctypes.c_int
    lib.jpeg_info.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.jpeg_decode_crop_resize.restype = ctypes.c_int
    lib.jpeg_decode_crop_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    # --- tfrecord ---
    lib.tfr_scan.restype = ctypes.c_int64
    lib.tfr_scan.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.c_int64, ctypes.c_int]
    lib.tfr_crc32c_masked.restype = ctypes.c_uint32
    lib.tfr_crc32c_masked.argtypes = [ctypes.c_char_p, ctypes.c_int64]

    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False
