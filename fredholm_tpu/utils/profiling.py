"""Device profiling and numerical-debug hooks.

SURVEY.md section 5 analogs:
- tracing/profiling: the reference only has host-side stage timers
  (rtcamp8.cpp:19-45) and relies on external Nsight for the GPU; here
  `device_trace` wraps `jax.profiler` so a render can be captured for
  TensorBoard/XProf, and `path_vertex_rate` reports the BASELINE metric.
- race detection/sanitizers: the reference enables OptiX validation mode in
  debug builds (optwl.h:46-57); the JAX analogs are `debug_nans` and a
  checkify pass, exposed here as `numerical_checks`.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("fredholm_tpu")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile for TensorBoard: with device_trace("/tmp/tb"):
    renderer.render(...)"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("device trace written to %s", log_dir)


@contextlib.contextmanager
def numerical_checks(enabled: bool = True):
    """OptiX-validation-mode analog: fail loudly on NaN/Inf production
    instead of scrubbing. Wrap render calls during debugging."""
    import jax

    if not enabled:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def path_vertex_rate(renderer, n_samples: int = 8, max_depth: int = 5):
    """Measure Mpath-vertices/s on the current device (BASELINE metric)."""
    import numpy as np

    renderer.render(n_samples=1, max_depth=max_depth)  # warm
    v0 = float(np.asarray(renderer.layers["n_path_vertices"]))
    t0 = time.time()
    renderer.render(n_samples=n_samples, max_depth=max_depth)
    v1 = float(np.asarray(renderer.layers["n_path_vertices"]))  # syncs
    dt = time.time() - t0
    return (v1 - v0) / dt / 1e6
