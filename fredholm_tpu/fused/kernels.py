"""Tiled Pallas execution of the fused pipeline bodies.

The shade/NEE/sampler math of one bounce (fused/pt_fused.py `mega_body`,
~600 elementwise ops over [N] planes) costs XLA dozens of fused-kernel
launches and an HBM round-trip per materialized intermediate. Running the
SAME body inside one `pallas_call` — rays tiled [SUBLANES, 128] in VMEM,
scene scalars in SMEM — reduces that to exactly inputs-once + outputs-once
of HBM traffic and ONE launch. This is the TPU analog of the reference's
megakernel (/root/reference/fredholm/modules/pt.cu:418-501): where CUDA
fuses by putting everything in one __global__, we fuse by putting the
pipeline stage in one Mosaic kernel.

`tiled_map` is the generic wrapper: it flattens an arbitrary pytree of [N]
arrays into plane refs, runs a body on [SUBLANES, 128] tiles, and
re-assembles the output pytree. Bool leaves travel as float32 0/1 (bool
VMEM carries are fragile in Mosaic — see CLAUDE.md); integer leaves keep
their dtype. Scalar/table arguments (sv, usv, light_table) ride in SMEM and
are consumed by the bodies through plain indexing, which works identically
on arrays (jnp path) and refs (Pallas path).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 32


def _encode(leaf):
    """bool -> f32 plane (everything else passes through)."""
    if leaf.dtype == jnp.bool_:
        return leaf.astype(jnp.float32), True
    return leaf, False


def _decode(tile, was_bool: bool):
    return (tile != 0.0) if was_bool else tile


def tiled_map(
    body: Callable,
    inputs,
    scalars: Sequence,
    out_template=None,
    interpret: bool | None = None,
):
    """Run `body(inputs_pytree_of_tiles, *scalar_refs)` over [N] plane
    pytrees in ONE pallas_call.

    inputs: pytree of [N] arrays (all the same N, N % 128 == 0).
    scalars: small arrays placed in SMEM, passed to body as refs.
    Returns body's output pytree with [N] leaves.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    leaves, tdef = jax.tree.flatten(inputs)
    n = leaves[0].shape[0]
    assert n % LANES == 0, n
    rows = n // LANES
    sub = SUBLANES
    while rows % sub:
        sub //= 2
    grid = (rows // sub,)

    enc = [_encode(jnp.asarray(l)) for l in leaves]
    planes = [e[0].reshape(rows, LANES) for e in enc]
    was_bool = [e[1] for e in enc]

    # output structure from an abstract evaluation on tile-shaped dummies
    def body_on_tiles(tiles, scalar_vals):
        tree = jax.tree.unflatten(tdef, tiles)
        return body(tree, *scalar_vals)

    dummies = [
        jax.ShapeDtypeStruct((sub, LANES), p.dtype) for p in planes
    ]
    out_shape_tree = jax.eval_shape(
        lambda ts, sc: body_on_tiles(
            [_decode(t, b) for t, b in zip(ts, was_bool)], sc
        ),
        dummies,
        list(scalars),
    )
    out_leaves_shape, out_tdef = jax.tree.flatten(out_shape_tree)
    out_was_bool = [s.dtype == jnp.bool_ for s in out_leaves_shape]
    out_shapes = [
        jax.ShapeDtypeStruct(
            (rows, LANES),
            jnp.float32 if b else s.dtype,
        )
        for s, b in zip(out_leaves_shape, out_was_bool)
    ]

    n_in = len(planes)
    n_sc = len(scalars)

    def kernel(*refs):
        in_refs = refs[:n_in]
        sc_refs = refs[n_in : n_in + n_sc]
        out_refs = refs[n_in + n_sc :]
        tiles = [
            _decode(r[:], b) for r, b in zip(in_refs, was_bool)
        ]
        out = body_on_tiles(tiles, list(sc_refs))
        for r, v, b in zip(out_refs, jax.tree.leaves(out), out_was_bool):
            r[:] = v.astype(jnp.float32) if b else v

    plane_spec = pl.BlockSpec(
        (sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_planes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane_spec] * n_in + [smem_spec] * n_sc,
        out_specs=[plane_spec] * len(out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(*planes, *scalars)
    if len(out_shapes) == 1:
        out_planes = (out_planes,)

    out_leaves = [
        _decode(p.reshape(n), b).astype(s.dtype)
        for p, b, s in zip(out_planes, out_was_bool, out_leaves_shape)
    ]
    return jax.tree.unflatten(out_tdef, out_leaves)
