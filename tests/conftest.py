"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX approach to validating multi-chip sharding without
hardware (SURVEY.md §4): the host platform is split into 8 fake devices so
`jax.sharding.Mesh` / pjit paths compile and execute exactly as they would on
a TPU slice.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone does not override an externally-registered TPU plugin
# (this sandbox pre-sets JAX_PLATFORMS=axon); the config update does.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(321)
