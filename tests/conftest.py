"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
8 virtual CPU devices, which exercises the same pjit/shard_map partitioning
logic XLA uses on a real ICI mesh.
"""

import os

# Force CPU (the session environment may point JAX_PLATFORMS at a real TPU;
# tests need the deterministic virtual 8-device CPU backend).  The TPU-pool
# sitecustomize imports jax at interpreter start and sets jax_platforms
# programmatically, so env vars alone are not enough — update the live
# config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compile cache: most of the suite's wall time is repeated
# XLA:CPU compiles of the same programs, so warm local reruns drop sharply
# (cold-vs-warm numbers in PERF.md round 5).  The env var is set before
# any subprocess spawns so spawned servers (serve_main/fleet_main in the
# e2e tests) inherit it at interpreter start; the jax.config.update below
# covers THIS process, whose jax import already happened in sitecustomize.
# Opt out with LYRA_TPU_TEST_COMPILE_CACHE=0 (or point it at another dir).
# Note: XLA:CPU's AOT loader logs a benign feature-mismatch error on every
# cache load (`+prefer-no-scatter` is a compile-time tuning pseudo-feature
# that host detection never reports); pytest capture keeps it out of
# passing-test output.
_cache = os.environ.get("LYRA_TPU_TEST_COMPILE_CACHE", "/tmp/lyra_tpu_test_cache")
if _cache and _cache != "0":
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)

import pytest  # noqa: E402

from lyra_tpu.utils import native  # noqa: E402

# Rebuild the native library up front if sources changed — load() itself
# deliberately never recompiles a stale .so (no mid-serving rebuilds).
native.build()

REFERENCE_ROOT = "/root/reference/lyra"
MODEL_COEFFS = os.path.join(REFERENCE_ROOT, "model_coeffs")
TESTDATA = os.path.join(REFERENCE_ROOT, "testdata")


@pytest.fixture(scope="session")
def model_path():
    if not os.path.isdir(MODEL_COEFFS):
        pytest.skip("reference model weights not available")
    return MODEL_COEFFS


@pytest.fixture(scope="session")
def testdata_path():
    if not os.path.isdir(TESTDATA):
        pytest.skip("reference testdata not available")
    return TESTDATA
