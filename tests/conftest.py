"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-device tests exercise the shard_map / pjit DP path without a TPU slice
(the fake-backend capability the reference never had, SURVEY.md section 4).
Env vars must be set before the first jax import, hence this file's top.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pre-register an accelerator PJRT plugin via
# sitecustomize and pin jax_platforms programmatically; override it back to
# CPU before the first backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
