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
    import shutil
    import tempfile

    base = ["g++", "-O3", "-march=native", "-fPIC"]
    # build in a per-process temp dir and publish the .so atomically: forked
    # featurization workers may race into a cold build, and fixed-path .o
    # intermediates (or a torn .so) would clobber each other
    try:
        with tempfile.TemporaryDirectory(dir=_SRC_DIR) as tmp:
            objects = []
            for src, extra in _SOURCES.items():
                obj = os.path.join(tmp, src[:-4] + ".o")
                subprocess.run([*base, *extra, "-c", os.path.join(_SRC_DIR, src), "-o", obj], check=True, capture_output=True, timeout=120)
                objects.append(obj)
            tmp_lib = os.path.join(tmp, "lib.so")
            subprocess.run(["g++", "-shared", "-o", tmp_lib, *objects], check=True, capture_output=True, timeout=120)
            shutil.move(tmp_lib, _LIB_PATH + f".{os.getpid()}")
            os.replace(_LIB_PATH + f".{os.getpid()}", _LIB_PATH)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError, OSError) as e:
        _log.warning(f"Could not build native kernels ({e}); falling back to numpy implementations.")
        return False
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
