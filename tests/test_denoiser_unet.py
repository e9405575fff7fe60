"""Learned denoiser (denoise/unet.py): quality vs A-Trous on HELD-OUT
scenes + API fallbacks.

The eval asset (tests/data/denoiser_eval.npz) holds 16-spp noisy /
~1024-spp converged pairs for camera views and material sweeps that are
NOT in the training set (tools/train_denoiser.py), so this measures
generalization — the phase-2 "done" bar from VERDICT round 1: SSIM beats
A-Trous on >= 3 scenes.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.denoise.atrous import Denoiser, atrous_denoise
from fredholm_tpu.denoise.unet import (
    denoise_image,
    init_params,
    load_params,
)
from fredholm_tpu.utils.ssim import ssim

_EVAL = os.path.join(os.path.dirname(__file__), "data", "denoiser_eval.npz")


def _tm(x):
    x = np.asarray(x)
    return np.clip(x / (1.0 + x), 0.0, 1.0)


class TestUNetQuality:
    def test_beats_atrous_on_held_out_scenes(self):
        params = load_params()
        assert params is not None, "denoiser_unet.npz asset missing"
        data = dict(np.load(_EVAL))
        names = sorted({k.split(".")[0] for k in data})
        assert len(names) >= 3
        wins = 0
        for n in names:
            noisy = jnp.asarray(data[f"{n}.noisy"])
            ref = data[f"{n}.ref"]
            alb = jnp.asarray(data[f"{n}.albedo"])
            nrm = jnp.asarray(data[f"{n}.normal"])
            at = atrous_denoise(noisy, nrm, alb, None)
            un = denoise_image(params, noisy, alb, nrm)
            s_at = ssim(_tm(at), _tm(ref))
            s_un = ssim(_tm(un), _tm(ref))
            s_raw = ssim(_tm(noisy), _tm(ref))
            assert s_un > s_raw, f"{n}: unet {s_un} worse than input {s_raw}"
            wins += s_un > s_at
        assert wins >= 3, f"unet beat atrous on only {wins}/{len(names)}"


class TestUNetAPI:
    def test_denoiser_auto_uses_unet(self):
        d = Denoiser(width=32, height=32, mode="auto")
        assert d._unet_params is not None
        rng = np.random.default_rng(0)
        beauty = jnp.asarray(rng.uniform(0, 2, (32 * 32, 3)).astype(np.float32))
        alb = jnp.asarray(rng.uniform(0, 1, (32 * 32, 3)).astype(np.float32))
        nrm = jnp.asarray(rng.normal(size=(32 * 32, 3)).astype(np.float32))
        out = d.denoise(beauty, normal=nrm, albedo=alb)
        assert out.shape == (32 * 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_denoiser_falls_back_without_guides(self):
        # no albedo/normal -> atrous path, still works
        d = Denoiser(width=16, height=16, mode="auto")
        beauty = jnp.ones((256, 3), jnp.float32)
        out = d.denoise(beauty)
        assert out.shape == (256, 3)

    def test_arbitrary_resolution_padding(self):
        # H, W not multiples of 4 are padded internally
        params = init_params(__import__("jax").random.PRNGKey(0))
        img = jnp.ones((33, 47, 3), jnp.float32)
        out = denoise_image(params, img, img, img)
        assert out.shape == (33, 47, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_upscale_mode_with_unet(self):
        d = Denoiser(width=16, height=16, upscale=True, mode="auto")
        rng = np.random.default_rng(1)
        beauty = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
        alb = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
        nrm = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
        out = d.denoise(beauty, normal=nrm, albedo=alb)
        assert out.shape == (32 * 32, 3)
