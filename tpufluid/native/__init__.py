"""ctypes bindings for the native runtime library (see /native).

Build with ``make -C native`` at the repo root. Every entry point has a
pure-Python fallback elsewhere, so the framework works without the build;
the native paths are used when present (distance-transform oracle, PNG
export).
"""

from . import distfield, pngio  # noqa: F401
from .lib import available, load  # noqa: F401
