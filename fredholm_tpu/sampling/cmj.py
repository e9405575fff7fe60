"""Correlated multi-jittered sampling (Kensler 2013), vectorized in uint32.

TPU-native re-implementation of /root/reference/fredholm/modules/cmj.cu.
4x4 strata; each (pixel, bounce-slot, spp-block) pair gets a decorrelated
pattern via an xxhash32 scramble key (cmj.cu:60-80).

Because CMJ_M * CMJ_N = 16 is a power of two, Kensler's rejection loop in
`cmj_permute` always terminates after a single pass (the final `i &= w`
guarantees i < l), so the permutation is branch-free here — ideal for the
VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.rng import xxhash32_4

CMJ_M = 4
CMJ_N = 4

_U = np.uint32


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def cmj_permute_pow2(i, l: int, p):
    """Kensler permute for power-of-two l (single pass; cmj.cu:12-43)."""
    assert l & (l - 1) == 0
    w = _U(l - 1)
    i = _u32(i)
    p = _u32(p)
    i ^= p
    i *= _U(0xE170893D)
    i ^= p >> _U(16)
    i ^= (i & w) >> _U(4)
    i ^= p >> _U(8)
    i *= _U(0x0929EB3F)
    i ^= p >> _U(23)
    i ^= (i & w) >> _U(1)
    i *= _U(1) | (p >> _U(27))
    i *= _U(0x6935FA69)
    i ^= (i & w) >> _U(11)
    i *= _U(0x74DCB303)
    i ^= (i & w) >> _U(2)
    i *= _U(0x9E501CC3)
    i ^= (i & w) >> _U(2)
    i *= _U(0xC860A3DF)
    i &= w
    i ^= i >> _U(5)
    return (i + p) % _U(l)


def cmj_randfloat(i, p):
    """Hash-based jitter float in [0,1) (cmj.cu:45-58)."""
    i = _u32(i)
    p = _u32(p)
    i ^= p
    i ^= i >> _U(17)
    i ^= i >> _U(10)
    i *= _U(0xB36534E5)
    i ^= i >> _U(12)
    i ^= i >> _U(21)
    i *= _U(0x93FC4795)
    i ^= _U(0xDF6E307F)
    i ^= i >> _U(17)
    i *= _U(1) | (p >> _U(18))
    # top-24-bit mapping (see core/rng.uint_to_unit_float for why this
    # replaces the reference's /4294967808.0 full-width form, cmj.cu:55)
    return (
        (i >> _U(8)).astype(jnp.int32).astype(jnp.float32)
        * np.float32(1.0 / 16777216.0)
    )


def cmj(index, scramble):
    """One CMJ 2D point for sample `index` in a 4x4 pattern keyed by
    `scramble` (cmj.cu:60-71). Returns [..., 2] float32 in [0,1)."""
    index = cmj_permute_pow2(index, CMJ_M * CMJ_N, _u32(scramble) * _U(0x51633E2D))
    sx = cmj_permute_pow2(index % _U(CMJ_M), CMJ_M, _u32(scramble) * _U(0xA511E9B3))
    sy = cmj_permute_pow2(index // _U(CMJ_M), CMJ_N, _u32(scramble) * _U(0x63D83595))
    jx = cmj_randfloat(index, _u32(scramble) * _U(0xA399D265))
    jy = cmj_randfloat(index, _u32(scramble) * _U(0x711AD6A5))
    fx = ((index % _U(CMJ_M)).astype(jnp.int32).astype(jnp.float32) + (sy.astype(jnp.int32).astype(jnp.float32) + jx) / CMJ_N) / CMJ_M
    fy = ((index // _U(CMJ_M)).astype(jnp.int32).astype(jnp.float32) + (sx.astype(jnp.int32).astype(jnp.float32) + jy) / CMJ_M) / CMJ_N
    return jnp.stack([fx, fy], axis=-1)


def cmj_2d(n_spp, image_idx, depth, scramble):
    """Draw the CMJ 2D point for (sample-in-flight, pixel, dimension-slot).

    Mirrors cmj_2d(CMJState&) (cmj.cu:73-82): index = n_spp mod 16, pattern
    key = xxhash32(n_spp/16, image_idx, depth, scramble). The caller advances
    `depth` by one per draw.
    """
    n_spp = _u32(n_spp)
    index = n_spp % _U(CMJ_M * CMJ_N)
    key = xxhash32_4(n_spp // _U(CMJ_M * CMJ_N), image_idx, depth, scramble)
    return cmj(index, key)
