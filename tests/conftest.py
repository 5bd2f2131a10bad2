"""Test config: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization instead (SURVEY.md section 4, point 4).

Env vars are too late here (the jaxtyping pytest plugin imports jax before
conftest loads), but jax.config updates stick until a backend is actually
initialized, which no plugin does at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
