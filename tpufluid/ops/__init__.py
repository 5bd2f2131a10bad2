from . import grid, kernels, pairs, prng  # noqa: F401
