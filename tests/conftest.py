"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (the TPU analog of multi-node-without-a-cluster,
see SURVEY.md §4). Must run before jax is imported anywhere."""

import os

# Force CPU even when the axon TPU plugin env (JAX_PLATFORMS=axon) is
# present — tests must be deterministic and must not occupy the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# in jax config (which wins over the env var) — undo it for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Two-tier suite: these modules are dominated by multi-minute e2e runs
# (the 12-way benchmark-protocol matrix, 2-process CLI training, serving
# daemons, full-pipeline compiles). `pytest -m "not slow"` is the <5 min
# inner-loop tier; the full suite stays the pre-commit gate.
SLOW_MODULES = {
    "test_benchmark_protocol",
    "test_multiprocess",
    "test_cli",
    "test_pipelines_e2e",
    "test_closest_e2e",
    "test_pipeline_oracle",
    "test_compile_cache",
    "test_parity_gate",
    "test_trainer",
    "test_trainer_modalities",
    # measured on the 1-core bench host (round 4): these three pushed the
    # "not slow" tier past its 5-min budget
    "test_mesh",          # 8-device mesh compiles, ~7 min alone
    "test_manifest",      # module-scoped full tiny-checkpoint build
    "test_tower_parity",  # torch oracle tower assembly
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
