"""Build the native host library (g++ → libspmm_native.so).

Lazy build-on-first-use with a lockless best-effort scheme: the compile is
fast (<2 s) and idempotent; concurrent builders write to a temp file and
rename atomically.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = [os.path.join(_HERE, "mtxparse.cpp"), os.path.join(_HERE, "preprocess.cpp")]
LIB = os.path.join(_HERE, "libspmm_native.so")


def build(force: bool = False) -> str:
    if os.path.exists(LIB) and not force:
        srcs_mtime = max(os.path.getmtime(s) for s in SOURCES)
        if os.path.getmtime(LIB) >= srcs_mtime:
            return LIB
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-march=native",
        *SOURCES,
        "-o",
        tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, LIB)
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return LIB


if __name__ == "__main__":
    print(build(force=True))
