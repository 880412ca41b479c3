"""Build-on-first-import of the C++ rANS shared library (SURVEY.md C13).

Compiles tpucdc/entropy/cpp/rans.cc with g++ into a per-version cached .so;
concurrent builders serialize on an exclusive lock file. If no compiler is
available the caller falls back to the pure-Python coder (rans_py.py).
"""

from __future__ import annotations

import fcntl
import os
import pathlib
import subprocess

_CPP_DIR = pathlib.Path(__file__).parent / "cpp"
_SRC = _CPP_DIR / "rans.cc"
_SO = _CPP_DIR / "librans_tpucdc.so"


def build_library(force: bool = False) -> pathlib.Path | None:
    """Return the path to the built .so, or None if building is impossible."""
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    lock_path = _CPP_DIR / ".build.lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if _SO.exists() and not force and \
                    _SO.stat().st_mtime >= _SRC.stat().st_mtime:
                return _SO
            cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                   "-march=native", "-o", str(_SO), str(_SRC)]
            subprocess.run(cmd, check=True, capture_output=True, cwd=_CPP_DIR)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", b"")
            print(f"[tpucdc.entropy] C++ coder build failed "
                  f"({type(e).__name__}: {msg!r}); using Python fallback.")
            return None
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
