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
_SOURCES = ["sasa.cpp", "pdb_parser.cpp"]

_lib: ctypes.CDLL | None | bool = None  # None = untried, False = unavailable


def _build() -> bool:
    sources = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB_PATH, *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        _log.warning(f"Could not build native kernels ({e}); falling back to numpy implementations.")
        return False
    return True


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _lib
    if _lib is None:
        newest_src = max(os.path.getmtime(os.path.join(_SRC_DIR, s)) for s in _SOURCES)
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sasa_compute.restype = None
            lib.pdb_parse.restype = ctypes.c_int64
            _lib = lib
        except OSError as e:
            _log.warning(f"Could not load native kernels ({e}); falling back to numpy implementations.")
            _lib = False
    return _lib if _lib is not False else None
