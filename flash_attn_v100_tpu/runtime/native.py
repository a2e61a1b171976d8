"""ctypes loader for the native runtime core (csrc/fa_runtime.cpp).

Builds lazily with the csrc Makefile on first use (analog of the reference's
pip-time CUDAExtension build, reference: setup.py:81-98) and caches the .so.
If no toolchain is available the callers fall back to the pure-Python
implementations in allocator.py / scheduler.py — same semantics, slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "build", "libfa_runtime.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    sigs = {
        "fa_alloc_create": ([ctypes.c_int32, ctypes.c_int32], ctypes.c_void_p),
        "fa_alloc_create_sharded": ([ctypes.c_int32] * 4, ctypes.c_void_p),
        "fa_alloc_can_extend": ([ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int32], ctypes.c_int32),
        "fa_alloc_destroy": ([ctypes.c_void_p], None),
        "fa_alloc_num_free": ([ctypes.c_void_p], ctypes.c_int32),
        "fa_alloc_extend": ([ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                             i32p], ctypes.c_int32),
        "fa_alloc_pages_of": ([ctypes.c_void_p, ctypes.c_int64, i32p,
                               ctypes.c_int32], ctypes.c_int32),
        "fa_alloc_release": ([ctypes.c_void_p, ctypes.c_int64], None),
        "fa_sched_create": ([ctypes.c_int32, ctypes.c_int32, ctypes.c_int32],
                            ctypes.c_void_p),
        "fa_sched_create_sharded": ([ctypes.c_int32] * 5, ctypes.c_void_p),
        "fa_sched_destroy": ([ctypes.c_void_p], None),
        "fa_sched_add": ([ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                          ctypes.c_int32], ctypes.c_int32),
        "fa_sched_step": ([ctypes.c_void_p, i64p, i8p, ctypes.c_int32],
                          ctypes.c_int32),
        "fa_sched_advance": ([ctypes.c_void_p, ctypes.c_int64], ctypes.c_int32),
        "fa_sched_finish": ([ctypes.c_void_p, ctypes.c_int64], ctypes.c_int32),
        "fa_sched_pages_of": ([ctypes.c_void_p, ctypes.c_int64, i32p,
                               ctypes.c_int32], ctypes.c_int32),
        "fa_sched_num_free_pages": ([ctypes.c_void_p], ctypes.c_int32),
        "fa_sched_num_waiting": ([ctypes.c_void_p], ctypes.c_int32),
        "fa_sched_num_running": ([ctypes.c_void_p], ctypes.c_int32),
        "fa_sched_num_preemptions": ([ctypes.c_void_p], ctypes.c_int64),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Return the native library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("FA_TPU_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        _lib = _declare(ctypes.CDLL(_SO))
    except (OSError, subprocess.SubprocessError, AttributeError):
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None
