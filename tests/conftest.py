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


@pytest.fixture(scope="session", autouse=True)
def _protect_bundled_sample_lists():
    """Fail the session loudly if any bundled manifest is overwritten.

    A round-4 test monkeypatched only the *read* path of the DTU sample-list
    resolution and silently replaced the bundled 27097-sample training
    manifest with a 21-sample fixture. Guard the whole directory by hash.
    """
    import glob
    import hashlib

    list_dir = os.path.join(
        os.path.dirname(os.path.realpath(__file__)),
        "..", "robustmvd_tpu", "data", "sample_lists",
    )
    paths = sorted(glob.glob(os.path.join(list_dir, "*.pickle")))

    def digest():
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest() for p in paths
        }

    before = digest()
    yield
    after = digest()
    changed = [p for p in before if after.get(p) != before[p]]
    new = [p for p in after if p not in before]
    assert not changed and not new, (
        f"tests modified bundled sample lists: changed={changed} new={new}; "
        "restore them from git and fix the offending test's path patching"
    )


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
