"""Build + load the native host kernel library (ctypes).

The C++ sources live in ``syconn_tpu/csrc``; the shared library is built on
first use with g++ (-O3 -fopenmp) and cached next to the sources. No
pybind11 — plain ``extern "C"`` entry points via ctypes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger("syconn_tpu.native")

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_SRC = os.path.join(_CSRC_DIR, "kernels.cpp")
_SRC_TEASAR = os.path.join(_CSRC_DIR, "teasar.cpp")
_LIB = os.path.join(_CSRC_DIR, "libsyconn_kernels.so")

_lib: Optional[ctypes.CDLL] = None
_build_lock = threading.Lock()
_build_failed = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-fopenmp",
        "-march=native",
        _SRC,
        _SRC_TEASAR,
        "-o",
        _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"")
        log.warning("Native kernel build failed (%s): %s", e, err[:2000] if err else "")
        return False


def get_native() -> Optional[ctypes.CDLL]:
    """Return the kernel library, building it if needed; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _build_lock:
        if _lib is not None:
            return _lib
        needs_build = not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < max(
            os.path.getmtime(_SRC), os.path.getmtime(_SRC_TEASAR)
        )
        if needs_build and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.detect_seg_boundaries_u32.argtypes = [u32p, _i64, _i64, _i64, u8p]
        lib.detect_seg_boundaries_u64.argtypes = [u64p, _i64, _i64, _i64, u8p]
        lib.detect_cs_u32.argtypes = [u32p, u8p, _i64, _i64, _i64, _i32, _i32, _i32, u64p]
        lib.detect_contact_partners_u64.argtypes = [
            u64p, u8p, _i64, _i64, _i64, _i32, _i32, _i32, u64p,
        ]
        lib.relabel_u64.argtypes = [u64p, _i64, u64p, u64p, _i64, _i32]
        lib.relabel_u32.argtypes = [u32p, _i64, u32p, u32p, _i64, _i32]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.teasar_grid.argtypes = [
            u8p, _i64, _i64, _i64, f32p, f64p,
            ctypes.c_double, _i32, ctypes.c_double, ctypes.c_double, _i64,
            i32p, _i64, i32p, _i64, f32p, i64p, i64p,
        ]
        lib.teasar_grid.restype = _i32
        for fn in (
            lib.detect_seg_boundaries_u32,
            lib.detect_seg_boundaries_u64,
            lib.detect_cs_u32,
            lib.detect_contact_partners_u64,
            lib.relabel_u64,
            lib.relabel_u32,
        ):
            fn.restype = None
        _lib = lib
        return _lib
