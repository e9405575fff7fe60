"""Integer hashing / RNG primitives in jnp.uint32.

TPU-native equivalents of the reference's hash utilities
(/root/reference/fredholm/include/fredholm/shared.h:268-319). All functions
operate elementwise on uint32 arrays, so the whole wavefront hashes in one
VPU pass. Unsigned 32-bit wrap-around arithmetic is the semantics of
jnp.uint32, matching CUDA `uint`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_P2 = np.uint32(2246822519)
_P3 = np.uint32(3266489917)
_P4 = np.uint32(668265263)
_P5 = np.uint32(374761393)


def _u32(x):
    return jnp.asarray(x).astype(U32)


def _rotl(x, r: int):
    x = _u32(x)
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def xxhash32(p):
    """xxhash32 of a single uint32 (shared.h:282-291)."""
    h = _u32(p) + _P5
    h = _P4 * _rotl(h, 17)
    h = _P2 * (h ^ (h >> np.uint32(15)))
    h = _P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def xxhash32_3(x, y, z):
    """xxhash32 of a uint3 (shared.h:293-304)."""
    h = _u32(z) + _P5 + _u32(x) * _P3
    h = _P4 * _rotl(h, 17)
    h = h + _u32(y) * _P3
    h = _P4 * _rotl(h, 17)
    h = _P2 * (h ^ (h >> np.uint32(15)))
    h = _P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def xxhash32_4(x, y, z, w):
    """xxhash32 of a uint4 (shared.h:306-319)."""
    h = _u32(w) + _P5 + _u32(x) * _P3
    h = _P4 * _rotl(h, 17)
    h = h + _u32(y) * _P3
    h = _P4 * _rotl(h, 17)
    h = h + _u32(z) * _P3
    h = _P4 * _rotl(h, 17)
    h = _P2 * (h ^ (h >> np.uint32(15)))
    h = _P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def uint_to_unit_float(u):
    """uint32 -> float32 in [0, 1), from the TOP 24 bits.

    Deliberate deviation from the reference's `* (1.0f / (1ULL << 32))`
    (sampling.cu:16): that form rounds u >= 0xFFFFFF80 up to exactly 1.0f
    (an out-of-range draw), and a direct uint32->float32 vector cast does
    not exist on the TPU VPU (Mosaic). Truncating to the float's own 24-bit
    mantissa is exact, guarantees [0, 1), and lowers everywhere.
    """
    return (
        (_u32(u) >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * np.float32(1.0 / 16777216.0)
    )


def reverse_bits(x):
    """Bit reversal of uint32 (sobol.cu:10697-10704)."""
    x = _u32(x)
    x = ((x & np.uint32(0xAAAAAAAA)) >> np.uint32(1)) | (
        (x & np.uint32(0x55555555)) << np.uint32(1)
    )
    x = ((x & np.uint32(0xCCCCCCCC)) >> np.uint32(2)) | (
        (x & np.uint32(0x33333333)) << np.uint32(2)
    )
    x = ((x & np.uint32(0xF0F0F0F0)) >> np.uint32(4)) | (
        (x & np.uint32(0x0F0F0F0F)) << np.uint32(4)
    )
    x = ((x & np.uint32(0xFF00FF00)) >> np.uint32(8)) | (
        (x & np.uint32(0x00FF00FF)) << np.uint32(8)
    )
    return (x >> np.uint32(16)) | (x << np.uint32(16))


def laine_karras_permutation(x, seed):
    """Hash-based Owen scrambling permutation (sobol.cu:10706-10715)."""
    x = _u32(x) + _u32(seed)
    x = x ^ (x * np.uint32(0x6C50B47C))
    x = x ^ (x * np.uint32(0xB82F1E52))
    x = x ^ (x * np.uint32(0xC7AFE638))
    x = x ^ (x * np.uint32(0x8D22F6E6))
    return x


def hash_combine(seed, v):
    """boost-style hash combine (sobol.cu:10717-10721)."""
    seed = _u32(seed)
    v = _u32(v)
    return seed ^ (v + (seed << np.uint32(6)) + (seed >> np.uint32(2)))


def nested_uniform_scramble_base2(x, seed):
    """Owen scrambling of a base-2 radical-inverse point
    (Laine & Karras; sobol.cu:10724-10731)."""
    return reverse_bits(laine_karras_permutation(reverse_bits(x), seed))


# ---------------------------------------------------------------------------
# PCG32 (shared.h:268-279). The render path never draws from PCG (the unified
# sampler routes 1D draws to Owen-Sobol and 2D+ to CMJ, sampling.cu:19-45);
# it is provided for API completeness. The 64-bit LCG state is emulated with
# two uint32 halves so it works without jax_enable_x64.


def pcg32_init(state, inc):
    """Build a PCG state pytree from uint64-like python ints or arrays."""
    state = np.uint64(state)
    inc = np.uint64(inc) | np.uint64(1)
    return {
        "state_hi": jnp.asarray(np.uint32(state >> np.uint64(32))),
        "state_lo": jnp.asarray(np.uint32(state & np.uint64(0xFFFFFFFF))),
        "inc_hi": jnp.asarray(np.uint32(inc >> np.uint64(32))),
        "inc_lo": jnp.asarray(np.uint32(inc & np.uint64(0xFFFFFFFF))),
    }


_PCG_MULT_HI = np.uint32(0x5851F42D)
_PCG_MULT_LO = np.uint32(0x4C957F2D)


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """64-bit multiply on uint32 halves, returning (hi, lo)."""
    a0 = a_lo & np.uint32(0xFFFF)
    a1 = a_lo >> np.uint32(16)
    b0 = b_lo & np.uint32(0xFFFF)
    b1 = b_lo >> np.uint32(16)

    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1

    mid = (p00 >> np.uint32(16)) + (p01 & np.uint32(0xFFFF)) + (
        p10 & np.uint32(0xFFFF)
    )
    lo = (p00 & np.uint32(0xFFFF)) | (mid << np.uint32(16))
    carry = (mid >> np.uint32(16)) + (p01 >> np.uint32(16)) + (
        p10 >> np.uint32(16)
    ) + p11
    hi = carry + a_lo * b_hi + a_hi * b_lo
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(U32)
    hi = a_hi + b_hi + carry
    return hi, lo


def pcg32_random(state):
    """Advance PCG32; returns (uint32 sample, new state)."""
    old_hi, old_lo = state["state_hi"], state["state_lo"]
    hi, lo = _mul64(old_hi, old_lo, _PCG_MULT_HI, _PCG_MULT_LO)
    hi, lo = _add64(hi, lo, state["inc_hi"], state["inc_lo"])
    new_state = dict(state)
    new_state["state_hi"], new_state["state_lo"] = hi, lo

    # ((old >> 18) ^ old) >> 27, on 32-bit halves
    x_hi = old_hi ^ (old_hi >> np.uint32(18))
    x_lo = (old_lo >> np.uint32(18)) | (old_hi << np.uint32(14))
    x_lo = x_lo ^ old_lo
    # shift the 64-bit (x_hi, x_lo) right by 27 and truncate to 32 bits
    xorshifted = (x_lo >> np.uint32(27)) | (x_hi << np.uint32(5))
    rot = old_hi >> np.uint32(27)  # (old >> 59) on the high word
    out = (xorshifted >> rot) | (
        xorshifted << ((np.uint32(32) - rot) & np.uint32(31))
    )
    return out, new_state
