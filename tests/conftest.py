"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU
# (JAX_PLATFORMS=axon): tests need f32 determinism + 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# backend at interpreter startup and pins the platform through jax.config,
# which wins over the env var set above — override it at the same level.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against f32 torch; JAX's default matmul/conv
# precision (bf16-ish even on CPU) costs ~1e-3 absolute error.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(9420)


@pytest.fixture(scope="session")
def config():
    from styler_tpu.core.config import default_config

    return default_config()
