"""ctypes bindings for the C++ data loader (native/dataloader.cpp):
JPEG/PNG decode + resize + crop + [-1,1] float32 with a multithreaded
prefetch ring — the native equivalent of the reference's DataLoader worker
processes (train.py:206-212). Compiled on first use; falls back to the
Python loader when the toolchain or codec libs are missing."""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_ERR = None


def _repo_root():
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def _build_and_load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    src_dir = os.path.join(_repo_root(), "native")
    so = os.path.join(src_dir, "libafdata.so")
    src = os.path.join(src_dir, "dataloader.cpp")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", src,
                 "-o", so, "-ljpeg", "-lpng", "-lpthread"],
                check=True, capture_output=True, timeout=300)
        lib = ctypes.CDLL(so)
        lib.dl_create.restype = ctypes.c_void_p
        lib.dl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_uint, ctypes.c_int]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float)]
        lib.dl_destroy.argtypes = [ctypes.c_void_p]
        lib.dl_decode_one.restype = ctypes.c_int
        lib.dl_decode_one.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except Exception as e:  # missing toolchain/codecs -> python fallback
        _LIB_ERR = e
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def decode_one(path, resolution, random_crop=False, random_flip=False):
    """Decode a single image to (R, R, 3) float32 in [-1, 1]."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
    out = np.empty((resolution, resolution, 3), np.float32)
    flags = (1 if random_crop else 0) | (2 if random_flip else 0)
    rc = lib.dl_decode_one(
        path.encode(), resolution, flags,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


class NativeBatchLoader:
    """Infinite prefetched batch stream over a list of image paths."""

    def __init__(self, paths, resolution=256, batch=16, threads=4, seed=0,
                 random_crop=False, random_flip=False):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
        self._lib = lib
        self.resolution = resolution
        self.batch = batch
        self._encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._encoded))(*self._encoded)
        flags = (1 if random_crop else 0) | (2 if random_flip else 0)
        self._handle = lib.dl_create(arr, len(self._encoded), resolution,
                                     batch, threads, seed, flags)
        if not self._handle:
            raise RuntimeError("dl_create failed")

    def next(self):
        out = np.empty((self.batch, self.resolution, self.resolution, 3),
                       np.float32)
        rc = self._lib.dl_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("loader stopped")
        return {"input": out}

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
