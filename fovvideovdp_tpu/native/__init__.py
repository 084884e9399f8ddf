"""ctypes bindings to the native host-I/O runtime (libfvvdp_io).

Builds lazily with the system C++ toolchain on first use; all callers have
pure-Python fallbacks, so a missing compiler only costs performance.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fvvdp_io.cpp")
_LIB_PATH = os.path.join(_HERE, "libfvvdp_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC, "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=240)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        logging.debug("native build failed: %s", res.stderr.decode()[:500])
        return False
    return True


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.fvvdp_yuv_open.restype = ctypes.c_void_p
        lib.fvvdp_yuv_open.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 5
        lib.fvvdp_yuv_frame_count.restype = ctypes.c_long
        lib.fvvdp_yuv_frame_count.argtypes = [ctypes.c_void_p]
        lib.fvvdp_yuv_read_block.restype = ctypes.c_long
        lib.fvvdp_yuv_read_block.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p]
        lib.fvvdp_yuv_read_indices.restype = ctypes.c_long
        lib.fvvdp_yuv_read_indices.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.c_void_p]
        lib.fvvdp_yuv_close.restype = None
        lib.fvvdp_yuv_close.argtypes = [ctypes.c_void_p]
        lib.fvvdp_pipe_open.restype = ctypes.c_void_p
        lib.fvvdp_pipe_open.argtypes = [ctypes.c_int, ctypes.c_long,
                                        ctypes.c_long]
        lib.fvvdp_pipe_read_block.restype = ctypes.c_long
        lib.fvvdp_pipe_read_block.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
        lib.fvvdp_pipe_close.restype = None
        lib.fvvdp_pipe_close.argtypes = [ctypes.c_void_p]
        lib.fvvdp_unpack_yuv_frame.restype = None
        lib.fvvdp_unpack_yuv_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


class NativePipeReader:
    """Prefetching drain for a rawvideo pipe (ffmpeg stdout) backed by
    libfvvdp_io: a background thread reads frames into a ring of host
    buffers so the decoder keeps working ahead of the consumer.

    The caller keeps ownership of the fd and of the producing process, and
    must terminate the producer BEFORE calling :meth:`close` — EOF is what
    unblocks the worker thread if it is mid-read.
    """

    def __init__(self, fd: int, frame_bytes: int, ring_frames: int = 4):
        lib = load()
        if lib is None:
            raise RuntimeError("native I/O library unavailable")
        self._lib = lib
        self.frame_bytes = int(frame_bytes)
        self._h = lib.fvvdp_pipe_open(int(fd), self.frame_bytes,
                                      int(ring_frames))
        if not self._h:
            raise RuntimeError("cannot start native pipe reader")

    def read_block(self, count: int, dtype=None):
        """Read up to ``count`` frames; returns (n, frame_bytes/itemsize)
        array (n < count only at end of stream, n == 0 at EOF)."""
        import numpy as np
        dtype = np.dtype(dtype or np.uint8)
        out = np.empty((count, self.frame_bytes // dtype.itemsize), dtype=dtype)
        n = self._lib.fvvdp_pipe_read_block(
            self._h, count, out.ctypes.data_as(ctypes.c_void_p))
        return out[:n]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.fvvdp_pipe_close(self._h)
            self._h = None

    def __del__(self):
        self.close()


class NativeYuvReader:
    """Prefetching raw-YUV reader backed by libfvvdp_io."""

    def __init__(self, path: str, width: int, height: int, bit_depth: int,
                 chroma_ss: str, ring_size: int = 4):
        lib = load()
        if lib is None:
            raise RuntimeError("native I/O library unavailable")
        self._lib = lib
        self._h = lib.fvvdp_yuv_open(path.encode(), width, height, bit_depth,
                                     int(chroma_ss), ring_size)
        if not self._h:
            raise RuntimeError(f"cannot open {path}")
        self.frame_count = int(lib.fvvdp_yuv_frame_count(self._h))
        import numpy as np
        self._dtype = np.uint16 if bit_depth > 8 else np.uint8
        y = width * height
        uv = y // 4 if chroma_ss == "420" else y
        self.frame_samples = y + 2 * uv

    def read_block(self, start: int, count: int):
        import numpy as np
        out = np.empty((count, self.frame_samples), dtype=self._dtype)
        n = self._lib.fvvdp_yuv_read_block(
            self._h, start, count, out.ctypes.data_as(ctypes.c_void_p))
        if n != count:
            raise RuntimeError(f"short read: {n}/{count} frames at {start}")
        return out

    def read_indices(self, indices):
        import numpy as np
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.frame_samples), dtype=self._dtype)
        n = self._lib.fvvdp_yuv_read_indices(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(idx), out.ctypes.data_as(ctypes.c_void_p))
        if n != len(idx):
            raise RuntimeError(f"short read: {n}/{len(idx)} frames")
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.fvvdp_yuv_close(self._h)
            self._h = None

    def __del__(self):
        self.close()
