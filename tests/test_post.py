import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.denoise.atrous import Denoiser, atrous_denoise
from fredholm_tpu.post.post_process import (
    PostProcessParams,
    aces_tone_mapping,
    bloom,
    chromatic_aberration,
    compute_ev100,
    convert_ev100_to_exposure,
    linear_to_srgb,
    post_process,
    uchimura,
)


class TestToneMapping:
    def test_srgb_endpoints(self):
        np.testing.assert_allclose(float(linear_to_srgb(jnp.asarray(0.0))), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(linear_to_srgb(jnp.asarray(1.0))), 1.0, atol=1e-3)

    def test_srgb_monotonic(self):
        x = jnp.linspace(0.0, 1.0, 64)
        y = np.asarray(linear_to_srgb(x))
        assert (np.diff(y) > 0).all()

    def test_aces_range(self):
        x = jnp.asarray([0.0, 0.5, 1.0, 10.0, 1000.0])
        y = np.asarray(aces_tone_mapping(x))
        assert (y >= 0).all() and (y <= 1.0).all()
        assert y[-1] > 0.99  # asymptote to white

    def test_uchimura_linear_section(self):
        # m=0.22, linear section starts there with slope a=1
        y1 = float(uchimura(jnp.asarray(0.3)))
        y2 = float(uchimura(jnp.asarray(0.4)))
        np.testing.assert_allclose(y2 - y1, 0.1, atol=1e-3)

    def test_ev100(self):
        # ISO 100, f/1, 1s -> EV100 = 0
        assert compute_ev100(1.0, 1.0, 100.0) == pytest.approx(0.0)
        assert convert_ev100_to_exposure(0.0) == pytest.approx(1.0 / 1.2)


class TestBloom:
    def test_bloom_spreads_highlight(self):
        img = np.zeros((33, 33, 3), np.float32)
        img[16, 16] = 50.0
        out = np.asarray(bloom(jnp.asarray(img), threshold=1.0, sigma=4.0))
        assert out[16, 12, 0] > img[16, 12, 0]  # energy spread to neighbor
        assert out[16, 16, 0] > 50.0  # original + blurred addition

    def test_bloom_below_threshold_noop_spread(self):
        img = np.full((17, 17, 3), 0.5, np.float32)
        out = np.asarray(bloom(jnp.asarray(img), threshold=1.0, sigma=2.0))
        np.testing.assert_allclose(out, img, atol=1e-5)


class TestChromaticAberration:
    def test_zero_strength_identity(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        out = np.asarray(chromatic_aberration(jnp.asarray(img), 0.0))
        np.testing.assert_allclose(out, img, atol=1e-6)


class TestFullChain:
    def test_output_in_unit_range(self):
        rng = np.random.default_rng(1)
        img = (rng.uniform(size=(32, 32, 3)) * 5.0).astype(np.float32)
        out = np.asarray(
            post_process(
                jnp.asarray(img),
                PostProcessParams(use_bloom=True, bloom_threshold=1.0),
            )
        )
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.isfinite(out).all()


class TestDenoiser:
    def test_reduces_noise_preserves_edges(self):
        rng = np.random.default_rng(2)
        clean = np.zeros((64, 64, 3), np.float32)
        clean[:, 32:] = 1.0  # vertical edge
        noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
        normal = np.zeros_like(clean)
        normal[:, :32, 0] = 1.0
        normal[:, 32:, 1] = 1.0
        out = np.asarray(
            atrous_denoise(jnp.asarray(noisy), normal=jnp.asarray(normal))
        )
        # noise reduced on flat regions
        assert out[:, :24].std() < noisy[:, :24].std() * 0.6
        # edge preserved
        assert abs(out[:, 40:].mean() - 1.0) < 0.1
        assert abs(out[:, :24].mean()) < 0.1

    def test_denoiser_class_roundtrip(self):
        d = Denoiser(16, 16)
        rng = np.random.default_rng(3)
        beauty = rng.uniform(size=(256, 3)).astype(np.float32)
        out = np.asarray(d.denoise(jnp.asarray(beauty)))
        assert out.shape == (256, 3)
        assert np.isfinite(out).all()


class TestDenoiserUpscale:
    def test_upscale_doubles_resolution(self):
        rng = np.random.default_rng(5)
        d = Denoiser(8, 8, upscale=True)
        beauty = rng.uniform(size=(64, 3)).astype(np.float32)
        out = np.asarray(d.denoise(jnp.asarray(beauty)))
        assert out.shape == (16 * 16, 3)
        assert np.isfinite(out).all()
