"""Gather strategies for TPU.

Irregular per-lane gathers from HBM are the slowest primitive on TPU (the
vector unit has no scatter/gather datapath; XLA lowers them to slow
element-wise transfers). For SMALL tables, a one-hot matmul on the MXU is
dramatically faster: build [N, K] one-hot from a comparison against iota and
contract with the [K, C] table at HIGHEST precision (f32-accurate bf16
multi-passing). This turns attribute fetch into dense systolic work.

Used for face/material/light attribute fetch in small scenes (the same
regime where dense intersection replaces BVH traversal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# above this table size the one-hot matrix costs more HBM traffic than the
# gather it replaces
ONEHOT_MAX_ROWS = 2048


def onehot_gather(table, idx):
    """table: [K, C] float32; idx: [N] int -> [N, C] == table[idx].

    Exact for f32 tables (HIGHEST precision = 6-pass bf16 emulation).
    """
    k = table.shape[0]
    oh = (idx[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :]).astype(
        jnp.float32
    )
    return jnp.dot(
        oh, table, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def gather_rows(table, idx, use_onehot: bool):
    """Pick one-hot matmul or native gather statically."""
    if use_onehot and table.shape[0] <= ONEHOT_MAX_ROWS:
        shape = table.shape
        flat = table.reshape(shape[0], -1).astype(jnp.float32)
        out = onehot_gather(flat, idx)
        out = out.reshape(idx.shape + shape[1:])
        if jnp.issubdtype(table.dtype, jnp.integer):
            # exact for |values| < 2^24 (texture/material ids)
            out = jnp.round(out).astype(table.dtype)
        return out
    return table[idx]
