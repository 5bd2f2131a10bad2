import ctypes
import functools
import os
import subprocess

_LIB_NAME = "libtpufluid_native.so"


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), _LIB_NAME)


@functools.cache
def load():
    """Load the native library, building it on first use if a toolchain is
    available. Returns None when unavailable."""
    path = _lib_path()
    if not os.path.exists(path):
        src = os.path.join(os.path.dirname(__file__), "..", "..", "native")
        if os.path.isdir(src):
            try:
                subprocess.run(["make", "-C", src], capture_output=True,
                               timeout=120, check=True)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def available() -> bool:
    return load() is not None
