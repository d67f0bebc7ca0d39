"""Test harness: force JAX onto a virtual 8-device CPU backend.

This is the standard JAX fake-backend trick (SURVEY.md §4c): collectives,
shardings, and pjit paths are exercised without TPU hardware. Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; pin the default device to host CPU so unit tests run
# locally (the virtual 8-device CPU mesh is still available via
# jax.devices("cpu")).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

# Persistent compilation cache: some test programs (conv3d fit fwd+bwd,
# full train steps) take minutes to compile on CPU; cache them across
# suite runs like bench.py already does.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SDTPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/sdtpu_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def jax_key():
    import jax
    return jax.random.PRNGKey(0)

os.environ.setdefault("SDTPU_FLASH", "0")  # flash kernels are TPU-only
