"""Test env: force an 8-device virtual CPU mesh BEFORE jax is imported.

Multi-chip sharding is validated here without TPU hardware, per the project's
test strategy (SURVEY.md §4). Bench runs (bench.py) use the real chip instead.
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize may have initialized a TPU backend at
# interpreter startup; re-point JAX at the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

# Persist compiled executables across test runs (first run pays the XLA
# compile cost; subsequent runs are fast).
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def tiny_text() -> bytes:
    return (DATA / "test.txt").read_bytes()


@pytest.fixture(scope="session")
def macbeth() -> bytes:
    return (DATA / "nice.shakespeare.txt").read_bytes()


@pytest.fixture(scope="session")
def midsummer() -> bytes:
    return (DATA / "a_midsummer_nights_dream.txt").read_bytes()
