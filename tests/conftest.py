"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU (deterministic, no TPU required) with 8 virtual devices so
sharding/mesh code paths are exercised exactly as the driver's multi-chip
dry-run does.  Must run before jax is imported anywhere.
"""

import os

# Force CPU: the axon TPU plugin registers itself via sitecustomize and can
# override JAX_PLATFORMS; clearing PALLAS_AXON_POOL_IPS prevents registration
# in subprocesses, and setting JAX_PLATFORMS forcibly keeps this process on
# the host CPU backend (the TPU is single-tenant; tests must not claim it).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

# The axon sitecustomize pre-imports jax at interpreter startup, so the env
# vars above can be too late for platform selection in THIS process (they
# still protect subprocesses).  Force the platform through the live config:
# this takes effect as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: importing fluidgym_tpu configures a
# machine-keyed cache dir (stale XLA:CPU AOT entries from another host are
# SIGILL risks); no explicit override here.

assert jax.default_backend() == "cpu", (
    "tests must run on the host CPU backend (the TPU is single-tenant and "
    "reserved for benchmarks/validation)"
)
assert len(jax.devices()) >= 8, (
    "xla_force_host_platform_device_count=8 did not take effect"
)


def pytest_collection_modifyitems(config, items):
    """Deselect @pytest.mark.slow tests by default (the full physics marches
    push the suite to ~50 min on one CPU core).  They still run under
    ``pytest -m slow`` (or any explicit ``-m`` expression) and when
    ``FLUIDGYM_TEST_SLOW=1`` is set."""
    if config.option.markexpr or os.environ.get("FLUIDGYM_TEST_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow: run with -m slow or FLUIDGYM_TEST_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _isolated_data_path(tmp_path, monkeypatch):
    """Point the data path at a temp dir so tests never touch user caches."""
    from fluidgym_tpu.config import config

    monkeypatch.setattr(config, "_data_path", tmp_path / "data")
    yield
