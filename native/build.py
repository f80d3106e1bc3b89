#!/usr/bin/env python
"""Build the native host library (libmuscato_native.so).

Usage: python native/build.py
The engine falls back to pure Python when the library is absent.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "muscato_native.cpp")
OUT = os.path.join(HERE, "libmuscato_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", OUT, SRC,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
