"""Test configuration: force CPU with a virtual 8-device mesh and enable
float64 (prognostic state is double precision, matching the reference).

Multi-chip sharding tests run against the virtual CPU mesh; the real-TPU
path is exercised by bench.py / __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU-tunnel platform and
# overrides JAX_PLATFORMS from the environment, so the platform must be
# pinned via jax.config *after* import (env vars alone do not stick).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite's cost is dominated by XLA compiles
# of the full coupled step (and its JVP); cache them across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/elmtpu_jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import pathlib

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    Every XLA:CPU executable JIT-maps thousands of anonymous code
    segments (one r--/rw-/r-x triple per fused kernel); the in-process
    pjit cache keeps every variant alive, so a full-suite process
    accumulates ~65k mappings and dies on vm.max_map_count (observed:
    SIGABRT inside XLA compile / cache serialize at ~75% of the suite).
    Clearing between modules caps the concurrent map count; the
    persistent on-disk cache makes later reloads cheap.
    """
    yield
    jax.clear_caches()


REPO = pathlib.Path(__file__).resolve().parent.parent
REF_DATA = pathlib.Path("/root/reference/test/data")
TEST_DATA = REPO / "tests" / "data"


@pytest.fixture(scope="session")
def ref_data_dir():
    return REF_DATA


@pytest.fixture(scope="session")
def fixture_dir():
    return TEST_DATA


# Both golden datasets shipped by the reference: test/data (48-step blocks)
# and test/new_data (96-step blocks, from a newer instrumented ELM run).
# Fixtures under tests/data[/newdata] are generated from the reference's own
# kernels over each dataset's *_IN.txt (tools/goldengen/Makefile).
@pytest.fixture(scope="session", params=["data", "newdata"])
def golden_dirs(request):
    if request.param == "data":
        return REF_DATA, TEST_DATA
    return REF_DATA.parent / "new_data", TEST_DATA / "newdata"
