from . import sph  # noqa: F401
