"""Build the native runtime libraries (g++ -O3 -shared).

Compile-on-demand with content hashing: the .so is rebuilt only when the
source changes. No external deps — plain C++17."""

from __future__ import annotations

import hashlib
import os
import subprocess

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
BUILD_DIR = os.path.join(NATIVE_DIR, "build")

LIBS = {
    "corr_graph": ["corr_graph.cc"],
    "table_io": ["table_io.cc"],
}


def _hash_sources(srcs) -> str:
    h = hashlib.sha256()
    for s in srcs:
        with open(os.path.join(NATIVE_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build(name: str) -> str:
    """Return path to the built .so, compiling if needed."""
    srcs = LIBS[name]
    os.makedirs(BUILD_DIR, exist_ok=True)
    tag = _hash_sources(srcs)
    out = os.path.join(BUILD_DIR, f"lib{name}-{tag}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", out] + [os.path.join(NATIVE_DIR, s) for s in srcs]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    # clean stale builds of the same lib
    for f in os.listdir(BUILD_DIR):
        if f.startswith(f"lib{name}-") and not f.endswith(f"{tag}.so"):
            try:
                os.remove(os.path.join(BUILD_DIR, f))
            except OSError:
                pass
    return out


if __name__ == "__main__":
    import sys

    for name in sys.argv[1:] or list(LIBS):
        if any(os.path.exists(os.path.join(NATIVE_DIR, s)) for s in LIBS[name]):
            print(name, "->", build(name))
