"""Test configuration: hermetic CPU run with a virtual 8-device mesh.

Pallas kernels run in interpret mode on CPU (see flash_attn_v100_tpu.config);
sharding tests use the 8 virtual CPU devices.  Must set env vars before jax
imports anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# this image's sitecustomize registers a TPU PJRT plugin at interpreter start
# and pre-sets JAX_PLATFORMS; force the CPU backend for hermetic tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(421)  # the reference's fixed seed (test.py:151)
