"""ctypes bindings for the native C++ data loader (csrc/loader.cc).

Builds the shared library on first use (cached); falls back cleanly —
callers check :func:`available` and use the PIL path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["available", "decode_eval_batch", "decode_train_batch",
           "decode_geom_batch"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcnsn_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _CSRC], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.cnsn_decode_eval_batch.restype = ctypes.c_int
        lib.cnsn_decode_eval_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.cnsn_decode_train_batch.restype = ctypes.c_int
        lib.cnsn_decode_train_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        if hasattr(lib, "cnsn_decode_geom_batch"):
            lib.cnsn_decode_geom_batch.restype = ctypes.c_int
            lib.cnsn_decode_geom_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_eval_batch(paths: Sequence[str], resize: int, crop: int,
                      mean: np.ndarray, std: np.ndarray,
                      threads: int = 8) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty((len(paths), crop, crop, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    failures = lib.cnsn_decode_eval_batch(
        _paths_array(paths), len(paths), resize, crop, _fptr(mean),
        _fptr(std), _fptr(out), threads)
    if failures:
        raise IOError(f"native loader failed on {failures} images")
    return out


def decode_train_batch(paths: Sequence[str], size: int, mean: np.ndarray,
                       std: np.ndarray, seeds: np.ndarray,
                       threads: int = 8) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty((len(paths), size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    failures = lib.cnsn_decode_train_batch(
        _paths_array(paths), len(paths), size, _fptr(mean), _fptr(std),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), _fptr(out),
        threads)
    if failures:
        raise IOError(f"native loader failed on {failures} images")
    return out


def geom_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "cnsn_decode_geom_batch")


def decode_geom_batch(paths: Sequence[str], size: int, seeds: np.ndarray,
                      threads: int = 8) -> np.ndarray:
    """RandomResizedCrop + flip only, raw (N, size, size, 3) uint8 —
    the host side of the on-device AugMix pipeline."""
    lib = _load()
    assert lib is not None
    out = np.empty((len(paths), size, size, 3), np.uint8)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    failures = lib.cnsn_decode_geom_batch(
        _paths_array(paths), len(paths), size,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if failures:
        raise IOError(f"native loader failed on {failures} images")
    return out
