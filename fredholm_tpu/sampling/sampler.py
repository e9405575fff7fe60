"""Unified wavefront sampler state.

TPU-native equivalent of the reference's SamplerState dispatch
(/root/reference/fredholm/modules/sampling.cu:19-45 and shared.h:66-96):
1D draws come from Owen-scrambled Sobol, 2D/3D/4D draws from CMJ. The state
is a flat dict-of-arrays pytree so it threads through `lax.scan` over path
depth; per-lane fields have shape [N], sequence counters are scalars
(uniform across the wavefront, exactly like the reference where every thread
consumes draws in the same order per bounce).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.rng import xxhash32
from .cmj import cmj_2d
from .sobol import sobol_owen_float

State = Dict[str, jnp.ndarray]


def init_sampler_state(image_idx, n_spp, n_pixels: int, seed) -> State:
    """Mirror of init_sampler_state (pt.cu:378-399).

    image_idx: [N] uint32 flat pixel index; n_spp: [N] uint32 per-pixel
    accumulated sample count; n_pixels: python int (width*height); seed:
    scalar uint32 frame seed.
    """
    image_idx = jnp.asarray(image_idx).astype(jnp.uint32)
    n_spp = jnp.asarray(n_spp).astype(jnp.uint32)
    seed_hash = xxhash32(jnp.asarray(seed).astype(jnp.uint32))
    sample_idx = image_idx + n_spp * np.uint32(n_pixels % (1 << 32))
    return {
        "sobol_index": sample_idx,
        "sobol_dim": jnp.uint32(1),
        "sobol_seed": seed_hash,
        "cmj_n_spp": n_spp,
        "cmj_image_idx": image_idx,
        "cmj_depth": jnp.uint32(0),
        "cmj_scramble": seed_hash,
    }


def sample_1d(state: State) -> Tuple[jnp.ndarray, State]:
    """Owen-Sobol 1D draw (sampling.cu:19-22)."""
    u = sobol_owen_float(state["sobol_index"], state["sobol_dim"], state["sobol_seed"])
    new = dict(state)
    new["sobol_dim"] = state["sobol_dim"] + jnp.uint32(1)
    return u, new


def sample_2d(state: State) -> Tuple[jnp.ndarray, State]:
    """CMJ 2D draw (sampling.cu:24-29); returns [..., 2]."""
    u = cmj_2d(
        state["cmj_n_spp"],
        state["cmj_image_idx"],
        state["cmj_depth"],
        state["cmj_scramble"],
    )
    new = dict(state)
    new["cmj_depth"] = state["cmj_depth"] + jnp.uint32(1)
    return u, new


def sample_3d(state: State) -> Tuple[jnp.ndarray, State]:
    """CMJ 3D draw (sampling.cu:31-37)."""
    u2, state = sample_2d(state)
    u1a, state = sample_2d(state)
    return jnp.concatenate([u2, u1a[..., :1]], axis=-1), state


def sample_4d(state: State) -> Tuple[jnp.ndarray, State]:
    """CMJ 4D draw (sampling.cu:39-45)."""
    a, state = sample_2d(state)
    b, state = sample_2d(state)
    return jnp.concatenate([a, b], axis=-1), state
