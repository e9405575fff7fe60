import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.core import rng as frng
from fredholm_tpu.sampling import cmj, mappings, sampler, sobol


class TestHashes:
    def test_xxhash32_reference_value(self):
        # independently computed with a C implementation of the same shader
        # hash (shadertoy XlGcRh variant used by the reference)
        def ref_xxhash32(p):
            P2, P3, P4, P5 = 2246822519, 3266489917, 668265263, 374761393
            M = 0xFFFFFFFF
            h = (p + P5) & M
            h = (P4 * (((h << 17) | (h >> 15)) & M)) & M
            h = (P2 * (h ^ (h >> 15))) & M
            h = (P3 * (h ^ (h >> 13))) & M
            return h ^ (h >> 16)

        for v in [0, 1, 42, 123456789, 0xFFFFFFFF]:
            got = int(frng.xxhash32(jnp.uint32(v)))
            assert got == ref_xxhash32(v), hex(v)

    def test_reverse_bits(self):
        assert int(frng.reverse_bits(jnp.uint32(1))) == 0x80000000
        assert int(frng.reverse_bits(jnp.uint32(0x80000000))) == 1
        x = jnp.uint32(0xDEADBEEF)
        assert int(frng.reverse_bits(frng.reverse_bits(x))) == 0xDEADBEEF

    def test_pcg32_matches_reference_stream(self):
        # reference stream computed with the canonical minimal PCG32
        def ref_pcg(state, inc, n):
            M = (1 << 64) - 1
            out = []
            for _ in range(n):
                old = state
                state = (old * 6364136223846793005 + (inc | 1)) & M
                xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
                rot = old >> 59
                out.append(
                    ((xorshifted >> rot) | (xorshifted << ((-rot) & 31)))
                    & 0xFFFFFFFF
                )
            return out

        st = frng.pcg32_init(0x853C49E6748FEA9B, 0xDA3E39CB94B95BDB)
        expected = ref_pcg(0x853C49E6748FEA9B, 0xDA3E39CB94B95BDB, 8)
        for e in expected:
            got, st = frng.pcg32_random(st)
            assert int(got) == e


class TestSobol:
    def test_first_dim_is_van_der_corput(self):
        # sobol dim 0 at index i is the bit-reversal of i scaled to [0,1)
        for i in [1, 2, 3, 4, 5, 255]:
            u = float(sobol.sobol_float(jnp.uint32(i), 0))
            # van der Corput radical inverse base 2
            ref, f, k = 0.0, 0.5, i
            while k:
                ref += f * (k & 1)
                k >>= 1
                f *= 0.5
            np.testing.assert_allclose(u, ref, atol=1e-7)

    def test_stratification_2d(self):
        # first 16 points of (dim0, dim1) must be stratified in 4x4 grid
        idx = jnp.arange(16, dtype=jnp.uint32)
        x = np.asarray(sobol.sobol_float(idx, 0))
        y = np.asarray(sobol.sobol_float(idx, 1))
        cells = set(zip((x * 4).astype(int), (y * 4).astype(int)))
        assert len(cells) == 16

    def test_owen_range_and_mean(self):
        idx = jnp.arange(4096, dtype=jnp.uint32)
        u = np.asarray(sobol.sobol_owen_float(idx, 3, jnp.uint32(1234)))
        assert u.min() >= 0.0 and u.max() < 1.0
        np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)

    def test_owen_preserves_stratification(self):
        idx = jnp.arange(256, dtype=jnp.uint32)
        u = np.asarray(sobol.sobol_owen_float(idx, 2, jnp.uint32(99)))
        # owen scrambling preserves (0, m, 1)-net property in 1D: each of the
        # 256 cells of width 1/256 contains exactly one point
        cells = np.floor(u * 256).astype(int)
        assert len(set(cells.tolist())) == 256

    def test_different_seeds_decorrelate(self):
        idx = jnp.arange(64, dtype=jnp.uint32)
        a = np.asarray(sobol.sobol_owen_float(idx, 2, jnp.uint32(1)))
        b = np.asarray(sobol.sobol_owen_float(idx, 2, jnp.uint32(2)))
        assert not np.allclose(a, b)


class TestCMJ:
    def test_range(self):
        idx = jnp.arange(16, dtype=jnp.uint32)
        pts = np.asarray(cmj.cmj(idx, jnp.uint32(777)))
        assert pts.min() >= 0.0 and pts.max() < 1.0

    def test_stratification_4x4(self):
        # one full CMJ pattern is stratified on the 4x4 grid
        idx = jnp.arange(16, dtype=jnp.uint32)
        pts = np.asarray(cmj.cmj(idx, jnp.uint32(31337)))
        cells = set(
            zip((pts[:, 0] * 4).astype(int), (pts[:, 1] * 4).astype(int))
        )
        assert len(cells) == 16

    def test_n_rooks(self):
        # CMJ is also stratified on the 16x1 and 1x16 grids (N-rooks)
        idx = jnp.arange(16, dtype=jnp.uint32)
        pts = np.asarray(cmj.cmj(idx, jnp.uint32(4242)))
        assert len(set((pts[:, 0] * 16).astype(int).tolist())) == 16
        assert len(set((pts[:, 1] * 16).astype(int).tolist())) == 16

    def test_scramble_decorrelates(self):
        idx = jnp.arange(16, dtype=jnp.uint32)
        a = np.asarray(cmj.cmj(idx, jnp.uint32(1)))
        b = np.asarray(cmj.cmj(idx, jnp.uint32(2)))
        assert not np.allclose(a, b)


class TestSamplerState:
    def test_draw_sequence_advances_counters(self):
        st = sampler.init_sampler_state(
            jnp.arange(8, dtype=jnp.uint32), jnp.zeros(8, jnp.uint32), 64, 42
        )
        u1, st = sampler.sample_1d(st)
        assert u1.shape == (8,)
        assert int(st["sobol_dim"]) == 2
        u2, st = sampler.sample_2d(st)
        assert u2.shape == (8, 2)
        assert int(st["cmj_depth"]) == 1
        u3, st = sampler.sample_3d(st)
        assert u3.shape == (8, 3)
        u4, st = sampler.sample_4d(st)
        assert u4.shape == (8, 4)

    def test_pixels_decorrelated(self):
        st = sampler.init_sampler_state(
            jnp.arange(64, dtype=jnp.uint32), jnp.zeros(64, jnp.uint32), 64, 42
        )
        u, _ = sampler.sample_2d(st)
        u = np.asarray(u)
        assert np.unique(np.round(u[:, 0], 6)).size > 32

    def test_spp_progression_covers_square(self):
        # accumulate 64 spp for one pixel; 2d draws should cover [0,1)^2 well
        pts = []
        for s in range(64):
            st = sampler.init_sampler_state(
                jnp.zeros(1, jnp.uint32),
                jnp.full((1,), s, jnp.uint32),
                1024,
                7,
            )
            u, _ = sampler.sample_2d(st)
            pts.append(np.asarray(u)[0])
        pts = np.stack(pts)
        # each quadrant should hold roughly a quarter of the samples
        qx = (pts[:, 0] > 0.5).astype(int)
        qy = (pts[:, 1] > 0.5).astype(int)
        counts = np.bincount(qx * 2 + qy, minlength=4)
        assert counts.min() >= 8, counts


class TestMappings:
    def test_concentric_disk_in_unit_disk(self):
        rngs = np.random.default_rng(0).uniform(size=(1024, 2)).astype(np.float32)
        p = np.asarray(mappings.sample_concentric_disk(jnp.asarray(rngs)))
        r = np.hypot(p[:, 0], p[:, 1])
        assert r.max() <= 1.0 + 1e-6

    def test_cosine_hemisphere_distribution(self):
        rngs = np.random.default_rng(1).uniform(size=(8192, 2)).astype(np.float32)
        w = np.asarray(mappings.sample_cosine_weighted_hemisphere(jnp.asarray(rngs)))
        assert (w[:, 1] >= 0.0).all()
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
        # E[cos theta] = 2/3 for pdf = cos/pi
        np.testing.assert_allclose(w[:, 1].mean(), 2.0 / 3.0, atol=0.01)

    def test_triangle_barycentric_valid(self):
        rngs = np.random.default_rng(2).uniform(size=(4096, 2)).astype(np.float32)
        b = np.asarray(mappings.sample_triangle(jnp.asarray(rngs)))
        assert (b >= 0.0).all()
        assert (b.sum(-1) <= 1.0 + 1e-6).all()

    def test_vndf_upper_hemisphere_unit(self):
        rng = np.random.default_rng(3)
        u = rng.uniform(size=(2048, 2)).astype(np.float32)
        wo = np.stack(
            [
                rng.normal(size=2048),
                rng.uniform(0.05, 1.0, size=2048),
                rng.normal(size=2048),
            ],
            -1,
        ).astype(np.float32)
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        alpha = np.full((2048, 2), 0.3, np.float32)
        wh = np.asarray(
            mappings.sample_vndf(jnp.asarray(wo), jnp.asarray(alpha), jnp.asarray(u))
        )
        np.testing.assert_allclose(np.linalg.norm(wh, axis=-1), 1.0, atol=1e-4)
        assert (wh[:, 1] >= 0.0).all()
        # sampled half vectors must be visible from wo
        assert (np.sum(wh * wo, -1) > 0.0).mean() > 0.999

    def test_discrete_sample_cdf(self):
        w = jnp.asarray([[1.0, 0.0, 3.0]])
        us = jnp.linspace(0.0, 0.999, 1000)[:, None]
        idx, pmf = mappings.discrete_sample_cdf(
            jnp.broadcast_to(w, (1000, 3)), us[:, 0]
        )
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=3) / 1000.0
        np.testing.assert_allclose(counts, [0.25, 0.0, 0.75], atol=0.01)
        pmf = np.asarray(pmf)
        assert set(np.round(np.unique(pmf), 3).tolist()) <= {0.25, 0.75}

    def test_discrete_sample_zero_weights(self):
        w = jnp.zeros((4, 5))
        idx, pmf = mappings.discrete_sample_cdf(w, jnp.full((4,), 0.3))
        assert (np.asarray(idx) == 4).all()


class TestBlueNoiseMode:
    """Blue-noise dithered sampler mode (blue-noise.cu made selectable)."""

    def _state(self, n=64, width=8, spp=0, seed=42):
        idx = jnp.arange(n, dtype=jnp.uint32)
        return sampler.init_sampler_state(
            idx, jnp.full((n,), spp, jnp.uint32), n, seed,
            mode=sampler.MODE_BLUENOISE, width=width,
        )

    def test_mode_adds_shift_key(self):
        st = self._state()
        assert "bn_shift" in st
        s = np.asarray(st["bn_shift"])
        assert s.min() >= 0.0 and s.max() < 1.0
        u, st2 = sampler.sample_1d(st)
        assert u.shape == (64,)
        assert int(st2["sobol_dim"]) == 2

    def test_per_pixel_stratification_preserved(self):
        # toroidal CP rotation keeps each pixel's spp-sequence equidistributed:
        # 16 successive samples of one pixel land in 16 distinct 1/16 cells
        us = []
        for s in range(16):
            st = self._state(n=4, width=2, spp=s)
            u, _ = sampler.sample_1d(st)
            us.append(np.asarray(u)[3])
        cells = np.floor(np.asarray(us) * 16).astype(int)
        assert len(set(cells.tolist())) == 16, cells

    def test_screen_space_error_is_blue(self):
        # Monte-Carlo error of a smooth integrand at 1 spp must have
        # strongly suppressed low frequencies across the screen (the
        # dithered-QMC estimator is periodic in the CP rotation, so the
        # error field inherits the ranking tile's blue spectrum)
        n = 128 * 128
        st = self._state(n=n, width=128)
        u, _ = sampler.sample_1d(st)
        err = np.sin(2 * np.pi * np.asarray(u)).reshape(128, 128)
        f = np.fft.fftshift(np.abs(np.fft.fft2(err - err.mean())))
        yy, xx = np.mgrid[:128, :128]
        rad = np.hypot(yy - 64, xx - 64)
        low = f[(rad > 0) & (rad < 8)].mean()
        high = f[(rad > 32) & (rad < 60)].mean()
        assert low < 0.1 * high, (low, high)

    def test_white_noise_seeding_would_fail_blueness(self):
        # control for the test above: a white-noise error field of the same
        # magnitude has flat spectrum (ratio ~1), so the 0.1 bound is real
        rng = np.random.default_rng(5)
        err = np.sin(2 * np.pi * rng.uniform(size=(128, 128)))
        f = np.fft.fftshift(np.abs(np.fft.fft2(err - err.mean())))
        yy, xx = np.mgrid[:128, :128]
        rad = np.hypot(yy - 64, xx - 64)
        low = f[(rad > 0) & (rad < 8)].mean()
        high = f[(rad > 32) & (rad < 60)].mean()
        assert low > 0.5 * high, (low, high)

    def test_render_matches_default_sampler_mean(self):
        # both sampler modes must converge to the same image
        from fredholm_tpu.renderer import Renderer
        from fredholm_tpu.scene.procedural import cornell_box

        means = {}
        for mode in ("sobol_cmj", "bluenoise"):
            r = Renderer(width=32, height=32)
            r.use_pallas = False
            r.sampler_mode = mode
            r.set_scene(cornell_box())
            r.render(n_samples=48, max_depth=4)
            means[mode] = np.asarray(r.layers["beauty"]).mean(0)
        np.testing.assert_allclose(
            means["bluenoise"], means["sobol_cmj"], rtol=0.08, atol=5e-3
        )
