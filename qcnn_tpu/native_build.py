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


class NativeLib:
    """Shared build-on-first-use ctypes loader (round-5 review: the two
    binding modules carried verbatim copies of this scaffold whose
    exception breadth had already drifted — one crashed serving on a
    stale .so instead of falling back).

    Contract: `get()` returns bind(CDLL) — built if the .so is missing
    or older than the source — or None on ANY build/load/bind failure
    (stale symbols, no compiler, ...), after which it never retries.
    QCNN_DISABLE_NATIVE forces None (the C++ parses untrusted input)."""

    def __init__(self, src: str, so: str, bind, extra_flags=()):
        import threading

        self._src, self._so = src, so
        self._bind = bind
        self._extra = tuple(extra_flags)
        self._lock = threading.Lock()
        self._lib = None
        self._failed = False

    def get(self):
        import ctypes
        import subprocess

        if os.environ.get("QCNN_DISABLE_NATIVE"):
            return None
        if self._lib is not None:
            return self._lib
        if self._failed:
            return None
        with self._lock:
            if self._lib is not None or self._failed:
                return self._lib
            try:
                if not os.path.exists(self._so) or (
                    os.path.getmtime(self._so)
                    < os.path.getmtime(self._src)
                ):
                    subprocess.run(
                        build_cmd(self._src, self._so, *self._extra),
                        check=True, capture_output=True,
                    )
                self._lib = self._bind(ctypes.CDLL(self._so))
            except Exception:  # noqa: BLE001 - any failure = no native
                self._failed = True
        return self._lib
