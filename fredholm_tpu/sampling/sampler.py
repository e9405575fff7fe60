"""Unified wavefront sampler state.

TPU-native equivalent of the reference's SamplerState dispatch
(/root/reference/fredholm/modules/sampling.cu:19-45 and shared.h:66-96):
1D draws come from Owen-scrambled Sobol, 2D/3D/4D draws from CMJ. The state
is a flat dict-of-arrays pytree so it threads through `lax.scan` over path
depth; per-lane fields have shape [N], sequence counters are scalars
(uniform across the wavefront, exactly like the reference where every thread
consumes draws in the same order per bounce).

A second mode, "bluenoise", makes every draw a screen-space blue-noise
dithered Owen-Sobol point (sampling/bluenoise.py; the sampler the reference
ships in blue-noise.cu but only wires into a commented-out light-sampling
path, pt.cu:866-868 — here it is a real selectable mode). Mode selection is
structural: blue-noise state carries an extra `bn_shift` key, and pytree
dict keys are static under jit, so the branch costs nothing at trace time.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.rng import xxhash32
from .bluenoise import blue_noise_1d, blue_noise_2d, bn_shift
from .cmj import cmj_2d
from .sobol import sobol_owen_float

State = Dict[str, jnp.ndarray]

MODE_DEFAULT = "sobol_cmj"
MODE_BLUENOISE = "bluenoise"

# 2D blue-noise draws use a dimension band disjoint from the 1D counter
# (the per-(pixel, dimension) seed hash decorrelates them regardless; the
# offset just keeps the two counters from ever colliding numerically)
_BN_2D_DIM_BASE = np.uint32(1 << 10)


def init_sampler_state(
    image_idx, n_spp, n_pixels: int, seed,
    mode: str = MODE_DEFAULT, width: int = 0,
) -> State:
    """Mirror of init_sampler_state (pt.cu:378-399).

    image_idx: [N] uint32 flat pixel index; n_spp: [N] uint32 per-pixel
    accumulated sample count; n_pixels: python int (width*height); seed:
    scalar uint32 frame seed. mode: MODE_DEFAULT or MODE_BLUENOISE (the
    latter needs `width` to recover pixel coords from image_idx).
    """
    image_idx = jnp.asarray(image_idx).astype(jnp.uint32)
    n_spp = jnp.asarray(n_spp).astype(jnp.uint32)
    seed_hash = xxhash32(jnp.asarray(seed).astype(jnp.uint32))
    sample_idx = image_idx + n_spp * np.uint32(n_pixels % (1 << 32))
    state = {
        "sobol_index": sample_idx,
        "sobol_dim": jnp.uint32(1),
        "sobol_seed": seed_hash,
        "cmj_n_spp": n_spp,
        "cmj_image_idx": image_idx,
        "cmj_depth": jnp.uint32(0),
        "cmj_scramble": seed_hash,
    }
    if mode == MODE_BLUENOISE:
        assert width > 0, "bluenoise mode needs the image width"
        # ONE ranking-tile gather per sample; every draw then rotates by
        # this value (per-lane gathers are the costliest op on this TPU)
        state["bn_shift"] = bn_shift(
            image_idx % np.uint32(width), image_idx // np.uint32(width)
        )
    elif mode != MODE_DEFAULT:
        raise ValueError(f"unknown sampler mode {mode!r}")
    return state


def sample_1d(state: State) -> Tuple[jnp.ndarray, State]:
    """Owen-Sobol 1D draw (sampling.cu:19-22); blue-noise dithered when the
    state was initialized in bluenoise mode."""
    if "bn_shift" in state:
        u = blue_noise_1d(
            state["bn_shift"], state["cmj_n_spp"], state["sobol_dim"],
            frame_seed=state["sobol_seed"],
        )
    else:
        u = sobol_owen_float(
            state["sobol_index"], state["sobol_dim"], state["sobol_seed"]
        )
    new = dict(state)
    new["sobol_dim"] = state["sobol_dim"] + jnp.uint32(1)
    return u, new


def sample_2d(state: State) -> Tuple[jnp.ndarray, State]:
    """CMJ 2D draw (sampling.cu:24-29); returns [..., 2]. Blue-noise
    dithered pair in bluenoise mode."""
    if "bn_shift" in state:
        u = blue_noise_2d(
            state["bn_shift"], state["cmj_n_spp"],
            _BN_2D_DIM_BASE + jnp.uint32(2) * state["cmj_depth"],
            frame_seed=state["cmj_scramble"],
        )
    else:
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
