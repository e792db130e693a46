"""Python binding for the native indexed tar reader (native/tario.cc).

Builds libtario.so on first use with g++ (cached next to the source);
falls back transparently to Python tarfile when no toolchain is available.
Used by the dataset base classes for tar-archive member reads — one index
scan, then lock-free positioned reads that don't serialize against the
prefetch thread (Python tarfile holds a global lock per archive object).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtario.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "tario.cc")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
            ):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.tario_open.restype = ctypes.c_void_p
            lib.tario_open.argtypes = [ctypes.c_char_p]
            lib.tario_count.restype = ctypes.c_long
            lib.tario_count.argtypes = [ctypes.c_void_p]
            lib.tario_member_size.restype = ctypes.c_long
            lib.tario_member_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.tario_read.restype = ctypes.c_long
            lib.tario_read.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ]
            lib.tario_names.restype = ctypes.c_long
            lib.tario_names.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long
            ]
            lib.tario_close.restype = None
            lib.tario_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # no toolchain / build error -> fallback
            logger.info(f"tario native build unavailable ({e}); using tarfile")
            _build_failed = True
    return _lib


class TarIndex:
    """Indexed tar reader. read(name) -> bytes. Thread-safe."""

    def __init__(self, path: str):
        self.path = path
        self._handle = None
        self._pytar = None
        self._pytar_lock = threading.Lock()
        lib = _load_lib()
        if lib is not None:
            h = lib.tario_open(path.encode())
            if h:
                self._handle = ctypes.c_void_p(h)
            else:
                logger.warning(f"tario_open failed for {path}; using tarfile")
        if self._handle is None:
            import tarfile

            self._pytar = tarfile.open(path)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self):
        if self.native:
            return int(_lib.tario_count(self._handle))
        return len(self._pytar.getmembers())

    def names(self):
        if self.native:
            cap = 1 << 20
            while True:
                buf = ctypes.create_string_buffer(cap)
                n = _lib.tario_names(self._handle, buf, cap)
                if n >= 0:
                    return buf.raw[:n].decode().splitlines()
                cap = -n + 1
        return [m.name for m in self._pytar.getmembers()]

    def read(self, name: str) -> bytes:
        if self.native:
            size = _lib.tario_member_size(self._handle, name.encode())
            if size < 0:
                raise KeyError(f"{name} not in {self.path}")
            buf = (ctypes.c_ubyte * size)()
            n = _lib.tario_read(self._handle, name.encode(), buf, size)
            if n != size:
                raise IOError(f"tario_read({name}) -> {n}")
            return bytes(buf)
        with self._pytar_lock:
            member = None
            for candidate in (name, "./" + name.lstrip("./"), name.lstrip("./")):
                try:
                    member = self._pytar.extractfile(candidate)
                    if member is not None:
                        break
                except KeyError:
                    continue
            if member is None:
                raise KeyError(name)
            return member.read()

    def close(self):
        if self._handle is not None:
            _lib.tario_close(self._handle)
            self._handle = None
        if self._pytar is not None:
            self._pytar.close()
            self._pytar = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
