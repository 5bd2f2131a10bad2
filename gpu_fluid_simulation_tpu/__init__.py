"""Alias package: ``gpu_fluid_simulation_tpu`` re-exports :mod:`tpufluid`.

The framework lives in ``tpufluid``; this name mirrors the reference repo
(rookieCookies/gpu-fluid-simulation) for discoverability.
"""

from tpufluid import *  # noqa: F401,F403
from tpufluid import __version__  # noqa: F401
