"""Build the native terrain library: `python -m dwbc_tpu.native.build`."""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = False) -> str:
    src = os.path.join(_DIR, "src", "terrain.cpp")
    out_dir = os.path.join(_DIR, "lib")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libdwbc_terrain.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without OpenMP / -march (minimal toolchains)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src]
        subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built {path}", file=sys.stderr)
