"""Test configuration: deterministic CPU execution + virtual 8-device mesh.

This environment pre-imports jax via sitecustomize (the TPU plugin), so
JAX_PLATFORMS cannot switch the default backend. Instead the CPU backend is
selected per-computation: ``jax_default_device`` routes eager/jit work to
CPU, and sharding tests build meshes from ``jax.devices("cpu")`` (8 virtual
devices via --xla_force_host_platform_device_count).

Set RMVD_TPU_TEST_BACKEND=tpu to run the numeric tests on real hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

from robustmvd_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

if os.environ.get("RMVD_TPU_TEST_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
