"""Build + load the native host-side components (C++ → .so via g++, ctypes).

Compiled lazily on first use and cached next to the sources keyed by a source
hash, so a fresh checkout builds once and stays warm.  Every native entry
point has a pure-NumPy fallback in its Python caller — the framework degrades
gracefully if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_LOCK = threading.Lock()
_CACHE = {}

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
            "-march=native", "-Wall"]
# per-component extra link/compile flags
EXTRA_FLAGS = {"jpegpipe": ["-ljpeg"]}


def _source_hash(src_path: str) -> str:
    with open(src_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def load(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen native/<name>.cpp. None on failure."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        if not os.path.exists(src):
            _CACHE[name] = None
            return None
        tag = _source_hash(src)
        so_path = os.path.join(_BUILD, f"lib{name}-{tag}.so")
        if not os.path.exists(so_path):
            os.makedirs(_BUILD, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            cmd = [CXX, *CXXFLAGS, "-o", tmp, src, *EXTRA_FLAGS.get(name, [])]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=180)
                os.replace(tmp, so_path)
            except (subprocess.SubprocessError, OSError):
                _CACHE[name] = None
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            lib = None
        _CACHE[name] = lib
        return lib
