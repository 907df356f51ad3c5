"""Test configuration: force CPU (the real TPU is reserved for benches),
expose an 8-device virtual mesh for sharding tests, and trade XLA optimization
for compile speed (graphs here are huge unrolled big-int dataflows; we test
semantics, not speed)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"          # current spelling
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # legacy spelling
# Persistent compile cache OFF for tests: the cache writer segfaults
# deterministically while serializing the largest executables (the fused
# verify jit) on this jax build — put_executable_and_time ->
# executable.serialize() — and stale entries compiled on a different host
# microarch are a SIGILL risk after sandbox migration. Stability over
# warm-start speed here; override by exporting KZG_TPU_JAX_CACHE.
os.environ.setdefault("KZG_TPU_JAX_CACHE", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Env vars alone are NOT enough: some environments preload jax via a .pth
# startup hook, and jax binds JAX_PLATFORMS at import. The config update
# works as long as no backend has been initialized yet, and guarantees the
# suite really runs on the virtual-CPU mesh (a silently-TPU test run both
# steals the bench chip and hides CPU/TPU numeric divergence).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; a backend was already initialized before "
    "conftest could force the platform")

jax.config.update("jax_disable_most_optimizations", True)

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    random.seed(1234)
