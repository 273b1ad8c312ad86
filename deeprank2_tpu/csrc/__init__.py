"""Native (C++) kernels with ctypes bindings and automatic build-on-first-use.

Python fallbacks exist for every native kernel, so the package works without a
compiler; with one, ``libdeeprank2.so`` is built once and cached next to the
sources.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

_log = logging.getLogger(__name__)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_SRC_DIR, "libdeeprank2.so")
# per-source extra flags: grid_kernels trades exact IEEE math for libmvec's
# vectorized exp (-ffast-math must be a command-line flag to trigger it);
# the SASA/PDB kernels stay bit-exact vs their numpy fallbacks
_SOURCES = {"sasa.cpp": [], "pdb_parser.cpp": [], "grid_kernels.cpp": ["-ffast-math"]}

_lib: ctypes.CDLL | None | bool = None  # None = untried, False = unavailable


def _build() -> bool:
    base = ["g++", "-O3", "-march=native", "-fPIC"]
    objects = []
    try:
        for src, extra in _SOURCES.items():
            obj = os.path.join(_SRC_DIR, src[:-4] + ".o")
            subprocess.run([*base, *extra, "-c", os.path.join(_SRC_DIR, src), "-o", obj], check=True, capture_output=True, timeout=120)
            objects.append(obj)
        subprocess.run(["g++", "-shared", "-o", _LIB_PATH, *objects], check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        _log.warning(f"Could not build native kernels ({e}); falling back to numpy implementations.")
        return False
    finally:
        for obj in objects:
            if os.path.exists(obj):
                os.remove(obj)
    return True


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _lib
    if _lib is None:
        newest_src = max(os.path.getmtime(os.path.join(_SRC_DIR, s)) for s in (*_SOURCES, "__init__.py"))
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sasa_compute.restype = None
            lib.pdb_parse.restype = ctypes.c_int64
            lib.gaussian_kernel_grid.restype = None
            _lib = lib
        except OSError as e:
            _log.warning(f"Could not load native kernels ({e}); falling back to numpy implementations.")
            _lib = False
    return _lib if _lib is not False else None
