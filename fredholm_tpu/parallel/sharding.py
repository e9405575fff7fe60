"""Multi-chip rendering: shard the pixel grid over a device mesh.

TPU-native scaling model (SURVEY.md section 2 "parallelism strategies"):
path tracing is data-parallel over pixels, so we `shard_map` horizontal
image bands across the mesh's devices — each chip runs the full wavefront
integrator on its band with zero inter-chip traffic during tracing (the
scene SoA is replicated; AOV layers stay sharded). The only collective in
the whole pipeline is the final `psum` of the path-vertex perf counter
(and, for spp-sharded accumulation, a weighted mean of layer buffers).

This replaces the reference's single-GPU launch (renderer.h:730-733) with
`jax.sharding.Mesh` + `shard_map` over ICI.

The spp loop runs on the HOST over a cached 1-spp jitted shard_map step:
the axon TPU backend crashes when a lax.scan wraps the traversal
while_loop (CLAUDE.md), and the reference's progressive loop is host-side
anyway (controller.cpp:205-230).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..integrator.pt import STATIC_DEV_KEYS, render_progressive

from jax import shard_map  # jax >= 0.8


def make_mesh(n_devices=None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"JAX device(s) are visible; for a virtual CPU mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} BEFORE the first backend use"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _split_static_dev(dev: Dict):
    """Split the dev dict into (traced arrays, python branch values) on
    exactly pt.STATIC_DEV_KEYS — the integrator raises on a tracer bool in
    `if dev[...]`, so the static half must bypass the jit boundary."""
    static_dev = {k: dev[k] for k in STATIC_DEV_KEYS if k in dev}
    traced = {k: v for k, v in dev.items() if k not in STATIC_DEV_KEYS}
    return traced, static_dev


def render_progressive_sharded(
    mesh: Mesh,
    dev: Dict,
    static_params: Dict,
    dynamic_params: Dict,
    layers: Dict,
    sample_count,
    n_samples: int,
    axis: str = "tiles",
    spp_chunk: int = 4,
):
    """Sharded analog of render_progressive.

    static_params: python values (width, height, max_depth, sky_mode,
    has_directional_light, use_ibl_is) baked into the program —
    renderer.static_params_from_config builds it; dynamic_params: traced
    arrays (camera, seed, colors, sky state). layers/sample_count are
    sharded along the pixel dimension (row bands); dev and dynamic_params
    are replicated. Returns (layers, sample_count), same shardings.
    """
    n_dev = mesh.shape[axis]
    height = static_params["height"]
    assert height % n_dev == 0, (
        f"height {height} must divide the {n_dev}-device mesh axis"
    )
    tile_h = height // n_dev

    dev, static_dev = _split_static_dev(dev)

    layer_ndims = tuple(
        sorted((k, getattr(v, "ndim", 0)) for k, v in layers.items())
    )

    def make_step(chunk):
        return _build_sharded_step(
            mesh,
            axis,
            tile_h,
            tuple(sorted(static_dev.items())),
            tuple(sorted(static_params.items())),
            layer_ndims,
            chunk,
        )

    # chunk several spp into ONE dispatch (statically unrolled inside the
    # jitted shard_map step — NOT lax.scan, which crashes the axon backend
    # around the traversal while_loop): per-dispatch overhead on sharded
    # executables is large on the tunneled chip, and the spp loop is the
    # hot dispatch site
    done = 0
    chunk = max(1, min(spp_chunk, n_samples))
    step = make_step(chunk)
    while done + chunk <= n_samples:
        layers, sample_count = step(layers, sample_count, dev, dynamic_params)
        done += chunk
    if done < n_samples:
        tail = make_step(n_samples - done)
        layers, sample_count = tail(layers, sample_count, dev, dynamic_params)
    return layers, sample_count


@functools.lru_cache(maxsize=32)
def _build_sharded_step(
    mesh: Mesh,
    axis: str,
    tile_h: int,
    static_dev_t: Tuple,
    static_params_t: Tuple,
    layer_ndims: Tuple,
    n_spp: int = 1,
):
    """Build + cache ONE jitted n_spp-chunk shard_map step per static
    signature — the host spp loop (and repeated calls, e.g. a progressive
    viewer or bench) must reuse the compiled executable, not retrace per
    call."""
    static_dev = dict(static_dev_t)
    static_params = dict(static_params_t)

    def tile_fn(layers_t, count_t, dev_r, dyn_r):
        idx = jax.lax.axis_index(axis)
        dev_r = {**dev_r, **static_dev}
        p = dict(dyn_r)
        p.update(static_params)
        p["tile_height"] = tile_h
        p["y0"] = idx * tile_h
        new_layers, new_count = render_progressive(
            dev_r, p, layers_t, count_t, n_spp
        )
        # per-shard perf counters join into the global count. psum the
        # DELTA only: the incoming counter is already a (replicated)
        # global total from the previous step — psumming the full value
        # would multiply it by n_dev every step
        for counter in ("n_path_vertices", "n_lane_slots"):
            new_layers[counter] = layers_t[counter] + jax.lax.psum(
                new_layers[counter] - layers_t[counter], axis
            )
        return new_layers, new_count

    layer_specs = {
        k: P(axis) if ndim > 0 else P() for k, ndim in layer_ndims
    }

    return jax.jit(
        shard_map(
            tile_fn,
            mesh=mesh,
            in_specs=(layer_specs, P(axis), P(), P()),
            out_specs=(layer_specs, P(axis)),
            check_vma=False,
        )
    )


def render_spp_sharded(
    mesh: Mesh,
    dev: Dict,
    static_params: Dict,
    dynamic_params: Dict,
    n_per_device: int,
    axis: str = "tiles",
):
    """Sample-parallel rendering: every device renders the FULL frame but a
    disjoint slice of the progressive sample stream (device i takes samples
    [i*n, (i+1)*n) — the per-pixel sample_count seeds the samplers, so the
    union equals a single-device run of D*n samples). One weighted `psum`
    merges the accumulators (SURVEY.md section 2: "spp-parallel
    accumulation... psum of radiance across devices").

    n_per_device is unrolled at trace time (no scan — see module note);
    keep it small and call repeatedly for long renders.

    Returns (layers, sample_count) for D * n_per_device samples, replicated.
    """
    from ..integrator.pt import make_layers

    n_dev = mesh.shape[axis]
    width = static_params["width"]
    height = static_params["height"]

    dev, static_dev = _split_static_dev(dev)

    def shard_fn(dev_r, dyn_r):
        idx = jax.lax.axis_index(axis)
        dev_r = {**dev_r, **static_dev}
        p = dict(dyn_r)
        p.update(static_params)
        layers = make_layers(width * height)
        count = jnp.full(
            (width * height,), idx * n_per_device, jnp.uint32
        )
        layers, count = render_progressive(
            dev_r, p, layers, count, n_per_device
        )
        # the streaming average ran with an initial count of idx*n (for
        # sampler decorrelation) over zero-initialized layers, so each
        # device holds sum(samples) / (idx*n + n); rescale to the sample
        # sum, psum, and divide by the global total
        scale = (idx * n_per_device + n_per_device).astype(jnp.float32)
        total_n = float(n_dev * n_per_device)
        counters = ("n_path_vertices", "n_lane_slots")
        merged = {
            k: jax.lax.psum(v * scale, axis) / total_n
            for k, v in layers.items()
            if k not in counters
        }
        for counter in counters:
            merged[counter] = jax.lax.psum(layers[counter], axis)
        total = jnp.full(
            (width * height,), n_dev * n_per_device, jnp.uint32
        )
        return merged, total

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(dev, dynamic_params)
