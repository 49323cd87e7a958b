"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (SURVEY.md §4 item 4: the standard
JAX trick for testing shard_map / psum logic without a TPU slice).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The image's sitecustomize registers the axon (TPU-tunnel) PJRT plugin at
# interpreter start and re-exports JAX_PLATFORMS=axon; the config flag wins
# over the env var at (lazy) backend-init time, so set it here too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(317)
