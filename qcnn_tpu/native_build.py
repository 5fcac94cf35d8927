"""Single source of truth for native-library build flags.

Three places compile the C++ runtime (the Makefile for explicit builds,
and the two ctypes bindings' auto-build-on-first-import); divergent flag
copies meant a Makefile flag change silently never reached the
import-built .so. The bindings read these; the Makefile mirrors them
(CXX ?= g++ / CXXFLAGS := -O3 -std=c++17 -shared -fPIC) — change both
together.
"""

from __future__ import annotations

import os

CXX = os.environ.get("CXX", "g++")
BASE_FLAGS = ("-O3", "-std=c++17", "-shared", "-fPIC")


def build_cmd(src: str, out: str, *extra: str) -> list[str]:
    return [CXX, *BASE_FLAGS, *extra, "-o", out, src]
