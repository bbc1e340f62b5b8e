"""Build the native library (g++ -O3 -shared)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "lamsa_native.cpp")
SO = os.path.join(_DIR, "_lamsa_native.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns the .so path or None on failure."""
    if not force and os.path.exists(SO) and (
            os.path.getmtime(SO) >= os.path.getmtime(SRC)):
        return SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", SO]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            import sys
            print(f"[lamsa_tpu.native] build failed:\n{r.stderr}",
                  file=sys.stderr)
            return None
        return SO
    except (OSError, subprocess.TimeoutExpired):
        return None


if __name__ == "__main__":
    path = build(force=True)
    print(path or "BUILD FAILED")
