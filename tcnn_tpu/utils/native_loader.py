"""ctypes bridge to the native C++ data loader (native/tcnn_loader.cpp).

Host-side training-data pipeline: a C++ thread pool samples random
(uv, rgb) batches from an image while the device trains, and a Python
prefetch thread keeps a queue of ready device arrays ahead of the
training loop — the host-data counterpart of the reference's on-GPU
data generation (mlp_learning_an_image.cu:229-243), reshaped for a
machine where host→device transfer is the boundary.

The shared library builds on demand with g++ (no pybind11 needed;
plain extern "C" ABI).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "tcnn_loader.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libtcnn_loader.so"))

_lib = None
_lib_lock = threading.Lock()


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    """Build (if needed) and load the native loader library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.tcnn_sampler_create.restype = ctypes.c_void_p
        lib.tcnn_sampler_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.tcnn_sampler_destroy.argtypes = [ctypes.c_void_p]
        lib.tcnn_sampler_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.tcnn_sampler_grid.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.tcnn_loader_abi_version.restype = ctypes.c_int
        assert lib.tcnn_loader_abi_version() == 1
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeImageSampler:
    """Threaded host-side image sampler (deterministic per seed)."""

    def __init__(self, image: np.ndarray, n_threads: int = 0):
        self._lib = load_library()
        img = np.ascontiguousarray(image, np.float32)
        self.height, self.width, self.channels = img.shape
        self._handle = self._lib.tcnn_sampler_create(
            _fptr(img), self.height, self.width, self.channels, n_threads)
        if not self._handle:
            raise RuntimeError("native sampler creation failed")

    def sample(self, n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
        xy = np.empty((n, 2), np.float32)
        val = np.empty((n, self.channels), np.float32)
        self._lib.tcnn_sampler_sample(
            self._handle, n, ctypes.c_uint64(seed), _fptr(xy), _fptr(val))
        return xy, val

    def full_grid(self) -> Tuple[np.ndarray, np.ndarray]:
        n = self.height * self.width
        xy = np.empty((n, 2), np.float32)
        val = np.empty((n, self.channels), np.float32)
        self._lib.tcnn_sampler_grid(self._handle, _fptr(xy), _fptr(val))
        return xy, val

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._lib.tcnn_sampler_destroy(handle)
            except Exception:
                pass
            self._handle = None


class PrefetchingSampler:
    """Keeps ``depth`` sampled batches in flight on a background thread
    so the training loop never waits on host-side data generation."""

    def __init__(self, sampler: NativeImageSampler, batch_size: int,
                 seed: int = 0, depth: int = 2, to_device=None):
        self.sampler = sampler
        self.batch_size = batch_size
        self.to_device = to_device or (lambda x: x)
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._seed = seed
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        i = 0
        while not self._stop.is_set():
            xy, val = self.sampler.sample(self.batch_size,
                                          self._seed * 1_000_003 + i)
            item = (self.to_device(xy), self.to_device(val))
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            i += 1

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self):
        return self._queue.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
