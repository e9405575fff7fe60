"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: this environment's sitecustomize registers the axon TPU backend in
every python process and programmatically sets jax_platforms="axon,cpu",
which OVERRIDES the JAX_PLATFORMS env var. The only reliable way to force
CPU is a config update after importing jax (before any backend use).
XLA_FLAGS must still be set before the first backend initialization.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
