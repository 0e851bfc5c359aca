"""Build helper for the native C++ host library (ctypes-loaded).

Compiles ``native/src/ircl_native.cpp`` into ``native/libircl_native.so`` with
g++ if the shared object is missing or stale. Build is best-effort: every
caller has a pure-Python fallback, so failure here degrades performance only.
"""

from __future__ import annotations

import os
import subprocess


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_native(force: bool = False) -> str | None:
    root = repo_root()
    src = os.path.join(root, "native", "src", "ircl_native.cpp")
    out = os.path.join(root, "native", "libircl_native.so")
    if not os.path.exists(src):
        return None
    if not force and os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        out,
        src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return out if os.path.exists(out) else None


if __name__ == "__main__":
    path = build_native(force=True)
    print(path or "native build failed")
