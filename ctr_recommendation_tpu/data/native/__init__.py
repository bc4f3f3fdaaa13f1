"""ctypes bindings for the native host-pipeline kernels.

Two lazily-built libraries:

* ``pad_seq.cc`` — arrow-buffer sequence padding + row gathers;
* ``submission.cc`` — prediction-CSV formatting (std::to_chars shortest
  round-trip, threaded) + single-entry zip (zlib raw deflate), replacing
  the ~0.5 s pandas to_csv + zipfile stage of the submission pipeline.

Compiled with g++ on first use and cached next to the source; every entry
point has a pure-Python fallback so the framework works without a
toolchain. ``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pad_seq.cc")
_LIB_PATH = os.path.join(_HERE, "_pad_seq.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        # The .so is a local build artifact (never committed — see .gitignore);
        # a wrong-arch cache fails to load and is rebuilt, and a cache OLDER
        # than the source is rebuilt too (otherwise edits to pad_seq.cc would
        # silently keep running the old kernel).
        lib = None
        if os.path.exists(_LIB_PATH):
            try:
                stale = os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            except OSError:
                stale = False
            if not stale:
                try:
                    lib = ctypes.CDLL(_LIB_PATH)
                except OSError:
                    lib = None
        if lib is None:
            if _build() is None:
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
        lib.pad_sequences_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gather_rows_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


_SUB_SRC = os.path.join(_HERE, "submission.cc")
_SUB_LIB_PATH = os.path.join(_HERE, "_submission.so")
_sub_lib = None
_sub_tried = False


def _load_submission():
    global _sub_lib, _sub_tried
    with _lock:
        if _sub_tried:
            return _sub_lib
        _sub_tried = True
        lib = None
        if os.path.exists(_SUB_LIB_PATH):
            try:
                stale = os.path.getmtime(_SUB_LIB_PATH) < os.path.getmtime(_SUB_SRC)
            except OSError:
                stale = False
            if not stale:
                try:
                    lib = ctypes.CDLL(_SUB_LIB_PATH)
                except OSError:
                    lib = None
        if lib is None:
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-o", _SUB_LIB_PATH, _SUB_SRC, "-lz", "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                lib = ctypes.CDLL(_SUB_LIB_PATH)
            except Exception:
                return None
        lib.submission_write_csv.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.submission_write_csv.restype = ctypes.c_int64
        lib.submission_zip_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.submission_zip_file.restype = ctypes.c_int64
        _sub_lib = lib
        return _sub_lib


def submission_available() -> bool:
    return _load_submission() is not None


def write_csv(
    probs: np.ndarray,
    path: str,
    *,
    id_offset: int = 0,
    append: bool = False,
    n_threads: int = 4,
) -> bool:
    """Write/append ``id,prob`` CSV rows (header on fresh files) via the
    native formatter. Returns False if the native library is unavailable
    or the write failed (caller falls back to the Python writer)."""
    lib = _load_submission()
    if lib is None:
        return False
    probs = np.ascontiguousarray(probs, dtype=np.float32).ravel()
    rc = lib.submission_write_csv(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(probs),
        id_offset,
        path.encode(),
        1 if append else 0,
        n_threads,
    )
    return rc >= 0


def zip_file(src_path: str, zip_path: str, arcname: str, level: int = 1) -> bool:
    """Zip one file into a fresh archive. False => caller falls back."""
    lib = _load_submission()
    if lib is None:
        return False
    rc = lib.submission_zip_file(
        src_path.encode(), zip_path.encode(), arcname.encode(), level
    )
    return rc >= 0


def available() -> bool:
    return _load() is not None


def pad_sequences_from_offsets(
    values: np.ndarray, offsets: np.ndarray, max_len: int, pad_id: int = 0
) -> np.ndarray:
    """(arrow list buffers) -> (n_rows, max_len) int32, keeping the LAST
    max_len entries, left-padded."""
    values = np.ascontiguousarray(values, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    out = np.empty((n_rows, max_len), dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.pad_sequences_i64(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_rows,
            max_len,
            pad_id,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    # numpy fallback
    out.fill(pad_id)
    for r in range(n_rows):
        s = values[offsets[r] : offsets[r + 1]]
        if s.size > max_len:
            s = s[-max_len:]
        if s.size:
            out[r, max_len - s.size :] = s
    return out
