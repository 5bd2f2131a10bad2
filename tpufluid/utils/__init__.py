from . import debugging, io, profiling  # noqa: F401
