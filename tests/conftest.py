"""Test configuration.

Runs the whole suite on CPU with float64 enabled (matching the reference's
all-double numerics) and 8 virtual devices so sharding tests exercise a real
multi-device mesh without TPU hardware — the strategy SURVEY.md §4 prescribes
for multi-backend-without-hardware testing.

Must run before any jax import, hence the env mutation at module import time.
"""

import os

# Force CPU: the driver environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel), which tests must not grab — and x64 is CPU-only anyway.  The env
# var alone does not win against the axon plugin, so clear it and use the
# config API after import.
os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# x64 on by default (matching the reference's all-double numerics);
# CFD_TPU_TEST_X64=0 runs the f32-default configuration (the production
# TPU setting) — CI scopes that leg to the dtype-explicit kernel tiers.
jax.config.update("jax_enable_x64",
                  os.environ.get("CFD_TPU_TEST_X64", "1") != "0")

# Sanitizer-analog CI leg (the reference gates releases on ASan/UBSan/TSan,
# CMakeLists.txt:32-49; the TPU build's equivalent hazard class is silent
# numeric corruption): CFD_TPU_DEBUG_NANS=1 makes every op that produces a
# NaN/Inf raise at the op, instead of the value flowing into a result.
# Tests that inject NaNs on purpose carry @pytest.mark.nan_injection and
# are excluded from that leg.
if os.environ.get("CFD_TPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_addoption(parser):
    parser.addoption(
        "--full-validation", action="store_true", default=False,
        help="Run the full-tier physics validation (the reference's "
             "CAVITY_FULL_VALIDATION mode; much slower).")
    parser.addoption(
        "--heavy", action="store_true", default=False,
        help="Include the heavyweight interpret-mode Pallas tests "
             "(skipped by default to keep the fast tier fast; "
             "--full-validation implies --heavy).")


@pytest.fixture
def full_validation(request):
    return request.config.getoption("--full-validation")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: slow interpret-mode Pallas test; runs under --heavy or "
        "--full-validation (each has a lighter default-tier sibling)")
    config.addinivalue_line(
        "markers",
        "nan_injection: intentionally injects NaN/Inf to exercise "
        "divergence detection; excluded from the CFD_TPU_DEBUG_NANS "
        "(jax_debug_nans) sanitizer-analog CI leg")
    config.addinivalue_line(
        "markers",
        "nan_shell: exercises raw fused-CG kernels whose Dirichlet-0 "
        "work-vector shells are never written BY DESIGN (CLAUDE.md "
        "semantics) — interpret mode initializes those don't-care shells "
        "to NaN, a false positive for the debug-nans leg; also excluded "
        "from it")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--heavy") or config.getoption("--full-validation"):
        return
    skip = pytest.mark.skip(reason="heavy tier (--heavy/--full-validation)")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
