"""ctypes binding for the native C++ batch gatherer (native/gather.cpp).

Compiled on first use with g++ (cached beside the source); every call site
falls back to the numpy gather when the toolchain or .so is unavailable, so
the pipeline never hard-depends on the native tier.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent / "native" / "gather.cpp"
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    # The .so name embeds a source-content hash: always built from the
    # committed source (never shipped prebuilt — binaries are gitignored),
    # and rebuilt exactly when the source changes. mtime comparisons are
    # unreliable after checkout (git stamps both files identically).
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _SRC.parent / f"libgather-{tag}.so"
    if not so.exists():
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", str(so), str(_SRC)]
        logger.info("Building native gather: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
        for stale in _SRC.parent.glob("libgather*.so"):
            if stale != so:
                stale.unlink(missing_ok=True)
    lib = ctypes.CDLL(str(so))
    lib.gather_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.gather_u8.restype = None
    lib.shuffle_indices.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64, ctypes.c_uint64]
    lib.shuffle_indices.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception as e:  # toolchain missing / build failure
            logger.warning("native gather unavailable (%s); using numpy", e)
    return _lib


class NativeGatherer:
    """Holds shard base pointers for repeated zero-Python batch gathers."""

    def __init__(self, shards: List[np.ndarray]):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native gather library unavailable")
        self._lib = lib
        self._shards = shards  # keep memmaps alive
        self.item_shape = shards[0].shape[1:]
        self.item_bytes = int(np.prod(self.item_shape))
        ptrs = (ctypes.c_void_p * len(shards))()
        for i, s in enumerate(shards):
            assert s.dtype == np.uint8 and s.flags["C_CONTIGUOUS"]
            ptrs[i] = s.ctypes.data_as(ctypes.c_void_p).value
        self._ptrs = ptrs
        cum = np.zeros(len(shards) + 1, np.int64)
        np.cumsum([len(s) for s in shards], out=cum[1:])
        self._cum = np.ascontiguousarray(cum)
        self._n_shards = len(shards)

    def gather(self, indices: np.ndarray, *, threads: int = 1) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.int64)
        out = np.empty((len(idx),) + self.item_shape, np.uint8)
        self._lib.gather_u8(
            self._ptrs,
            self._cum.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._n_shards,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), self.item_bytes,
            out.ctypes.data_as(ctypes.c_void_p), threads)
        return out


def native_shuffle(indices: np.ndarray, seed: int) -> np.ndarray:
    lib = get_lib()
    idx = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        return np.random.default_rng(seed).permutation(idx)
    lib.shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return idx
