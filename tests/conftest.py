"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: this environment's sitecustomize registers the axon TPU backend in
every python process and programmatically sets jax_platforms="axon,cpu",
which OVERRIDES the JAX_PLATFORMS env var. The only reliable way to force
CPU is a config update after importing jax (before any backend use).
XLA_FLAGS must still be set before the first backend initialization.
"""

import os
import sys

# smaller regeneration chunks: much faster XLA:CPU compiles, same results
os.environ.setdefault("FREDHOLM_REGEN_CHUNK", "4")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the regen/fused pipelines are expensive XLA:CPU
# compiles (minutes on this 1-core box); cache them across test runs
_cache = os.path.expanduser("~/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# file-level slow tier (pyproject addopts excludes it by default; run
# `pytest -m slow` for these four multi-minute suites)
_SLOW_FILES = {
    "test_golden.py",
    "test_textured.py",
    "test_regen.py",
    "test_denoiser_unet.py",
    # quarantined-experiment suite; ~11 min of interpret-mode kernels
    "test_resident.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
