"""Test harness: run everything on CPU with 8 virtual devices so the same
Mesh/shard_map code paths used on TPU pods are exercised without hardware
(SURVEY.md section 4, test strategy item 3).

Opt-in real-hardware gates (``pytest -m tpu`` with ``RTFS_TPU_TESTS=1``)
keep the TPU backend instead: the gradient bar must hold on the chip's
actual arithmetic (fast_recip on), not only in the interpreter.

Note: the JAX_PLATFORMS env var alone is not honoured once the axon TPU
plugin is present; jax.config.update('jax_platforms', ...) is authoritative.
"""
import os

TPU_TESTS = os.environ.get("RTFS_TPU_TESTS") == "1"

if not TPU_TESTS:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.RandomState(0)
