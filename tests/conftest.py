"""Test configuration (must run BEFORE jax import).

Forces a virtual 8-device CPU platform so sharding tests run without TPUs (the
driver separately dry-runs the multichip path via __graft_entry__).

Note: some images inject a TPU-relay PJRT plugin via a PYTHONPATH sitecustomize;
its one-time client init (triggered on first backend query, even under
JAX_PLATFORMS=cpu) costs a few seconds and serializes across processes — so
avoid running many jax test processes in parallel.  Setting PYTHONPATH="" skips
the plugin entirely for pure-CPU work.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    A full single-process suite run compiles hundreds of large CPU programs
    (8 virtual devices, wavefront loops); holding them all live has produced
    LLVM aborts/segfaults in `backend_compile_and_load` late in the run.
    Dropping the caches per module keeps the peak bounded (tests re-compile
    what they need)."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    return REFERENCE_ROOT


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow (full-resolution render) tests",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
