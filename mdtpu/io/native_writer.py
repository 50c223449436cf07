"""ctypes binding + lazy build of the native async trajectory writer
(native/trajwriter.cc). Falls back to a Python background-thread writer if the
toolchain/libzstd is unavailable, so the framework runs anywhere.

Why native: formatting ~1e5 atoms per frame in Python costs ~1 s; the C++
snprintf path is ~30x faster and runs in a background thread, optionally
streaming libzstd compression — the device loop never blocks on trajectory
output (SURVEY.md section 5, metrics/observability row).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "trajwriter.cc")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "_build")
_LIB = os.path.join(_LIB_DIR, "libtrajwriter.so")

_lib = None
_lib_tried = False


def _load_library():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.isfile(_LIB) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            os.makedirs(_LIB_DIR, exist_ok=True)
            subprocess.run(
                # -ffp-contract=off: the unwrapped-coordinate accumulation
                # must round every multiply/add separately so frames are
                # byte-identical to the Python writer (an FMA contraction
                # flips last printed digits near %.6f rounding boundaries).
                ["g++", "-O2", "-std=c++17", "-ffp-contract=off", "-shared",
                 "-fPIC", _SRC, "-o", _LIB, "-lzstd", "-pthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.twr_open.restype = ctypes.c_void_p
        lib.twr_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int]
        lib.twr_write_text.restype = ctypes.c_int
        lib.twr_write_text.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int64]
        lib.twr_write_lammps_frame.restype = ctypes.c_int
        lib.twr_write_lammps_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.twr_close.restype = ctypes.c_int
        lib.twr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeTrajectoryWriter:
    """Async LAMMPS-dump writer backed by the C++ worker thread."""

    def __init__(self, path, compress=False, level=3, append=False):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native trajectory writer unavailable")
        self._lib = lib
        self._handle = lib.twr_open(path.encode(), int(compress), level,
                                    int(append))
        if not self._handle:
            raise OSError(f"could not open {path}")

    def write_frame(self, step, unitcell, positions, images, diameters):
        cell = np.ascontiguousarray(unitcell, dtype=np.float64)
        pos = np.ascontiguousarray(positions, dtype=np.float64)
        img = np.ascontiguousarray(images, dtype=np.int32)
        diam = np.ascontiguousarray(diameters, dtype=np.float64)
        n, dim = pos.shape
        rc = self._lib.twr_write_lammps_frame(
            self._handle, int(step), n, dim,
            cell.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            diam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise OSError("native frame write failed")

    def write_text(self, text: str):
        data = text.encode()
        rc = self._lib.twr_write_text(self._handle, data, len(data))
        if rc != 0:
            raise OSError("native text write failed")

    def close(self):
        if self._handle:
            rc = self._lib.twr_close(self._handle)
            self._handle = None
            if rc != 0:
                raise OSError("native writer close reported a write error")


class PythonTrajectoryWriter:
    """Fallback: background-thread writer using the Python formatter."""

    def __init__(self, path, compress=False, level=3, append=False):
        self._compress = compress
        self._path = path
        self._queue: "queue.Queue" = queue.Queue()
        self._error = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._cctx = None
        self._zwriter = None
        if compress:
            # Import BEFORE opening (and truncating) the output: a missing
            # zstandard package must not leave a leaked handle and a
            # zero-byte file behind.
            import zstandard

            self._cctx = zstandard.ZstdCompressor(level=level)
        self._io = open(path, "ab" if append else "wb")
        if self._cctx is not None:
            self._zwriter = self._cctx.stream_writer(self._io)
        self._thread.start()

    def _sink(self, data: bytes):
        if self._zwriter is not None:
            self._zwriter.write(data)
        else:
            self._io.write(data)

    def _loop(self):
        from mdtpu.io.lammps import format_lammps_frame

        while True:
            item = self._queue.get()
            if item is None:
                return
            try:
                if isinstance(item, tuple):
                    # Frame FORMATTING runs here too: the per-atom Python
                    # loop costs ~1 s per 1e5-atom frame — formatting on the
                    # caller thread would stall the device loop, the exact
                    # blocking this background writer exists to prevent.
                    item = format_lammps_frame(*item).encode()
                self._sink(item)
            except Exception as exc:  # surface at close(); keep draining
                if self._error is None:
                    self._error = exc

    def write_frame(self, step, unitcell, positions, images, diameters):
        # Copy: the caller may reuse/mutate its buffers before the
        # background thread formats them (the native writer copies too).
        self._queue.put((step, np.array(unitcell), np.array(positions),
                         np.array(images), np.array(diameters)))

    def write_text(self, text: str):
        self._queue.put(text.encode())

    def close(self):
        self._queue.put(None)
        self._thread.join()
        if self._zwriter is not None:
            self._zwriter.close()
        else:
            self._io.close()
        if self._error is not None:
            # A failed disk write (e.g. disk full) must not read as a
            # successfully written trajectory.
            raise RuntimeError(
                f"trajectory writer failed mid-run: {self._error!r}")


def open_trajectory_writer(path, compress=False, level=3, append=False):
    """Best available async writer (native C++ if buildable, else Python).

    ``append`` continues an existing trajectory (resumed runs); appending
    to a .zst file is legal — zstd decodes concatenated frames."""
    if native_available():
        return NativeTrajectoryWriter(path, compress=compress, level=level,
                                      append=append)
    return PythonTrajectoryWriter(path, compress=compress, level=level,
                                  append=append)
