"""Build the native symbolic planner shared library.

Usage: python -m spfx.cpp.build
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(quiet: bool = False) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "planner.cpp")
    out = os.path.join(here, "libspfxplanner.so")
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        if not quiet:
            sys.stderr.write(res.stderr)
        raise RuntimeError(f"planner build failed: {res.stderr[:500]}")
    return out


if __name__ == "__main__":
    print(build())
