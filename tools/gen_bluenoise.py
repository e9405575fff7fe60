"""Generate a 128x128 blue-noise ranking tile via void-and-cluster.

The reference ships precomputed Heitz/Belcour blue-noise scrambling/ranking
tiles as embedded arrays (/root/reference/fredholm/modules/blue-noise.cu).
We generate our own tile with Ulichney's void-and-cluster method instead of
copying the data. The tile stores, per pixel, its rank in [0, 128*128) of a
blue-noise dither order; the sampler uses it to decorrelate per-pixel sample
sequences with blue-noise-distributed error.

Run:  python tools/gen_bluenoise.py   (takes ~10 s)
"""

import os

import numpy as np

SIZE = 128
SIGMA = 1.9


def _wrapped_gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    g1 = np.exp(-(d * d) / (2.0 * sigma * sigma))
    return np.outer(g1, g1)


def generate_rank_tile(size: int = SIZE, sigma: float = SIGMA, seed: int = 7):
    rng = np.random.default_rng(seed)
    n = size * size
    kernel = _wrapped_gaussian_kernel(size, sigma)
    kernel_fft = np.fft.rfft2(kernel)

    # initial pattern: 10% ones, relaxed to a stable blue-noise arrangement
    pattern = np.zeros((size, size), dtype=bool)
    ones = rng.choice(n, size=n // 10, replace=False)
    pattern.flat[ones] = True

    def energy(p):
        return np.fft.irfft2(np.fft.rfft2(p.astype(np.float64)) * kernel_fft, s=(size, size))

    e = energy(pattern)
    for _ in range(n):  # relaxation
        idx_cluster = np.argmax(np.where(pattern, e, -np.inf))
        pattern.flat[idx_cluster] = False
        e = energy(pattern)
        idx_void = np.argmin(np.where(pattern, np.inf, e))
        pattern.flat[idx_void] = True
        e = energy(pattern)
        if idx_void == idx_cluster:
            break

    rank = np.full((size, size), -1, dtype=np.int32)

    # phase 1: rank initial points by removing tightest clusters
    p1 = pattern.copy()
    e = energy(p1)
    count = int(p1.sum())
    for r in range(count - 1, -1, -1):
        idx = np.argmax(np.where(p1, e, -np.inf))
        p1.flat[idx] = False
        rank.flat[idx] = r
        e = energy(p1)

    # phase 2: fill remaining ranks by inserting into largest voids
    p2 = pattern.copy()
    e = energy(p2)
    for r in range(count, n):
        idx = np.argmin(np.where(p2, np.inf, e))
        p2.flat[idx] = True
        rank.flat[idx] = r
        e = energy(p2)

    assert (rank >= 0).all()
    return rank


def main() -> None:
    rank = generate_rank_tile()
    out = os.path.join(
        os.path.dirname(__file__), "..", "fredholm_tpu", "assets",
        "bluenoise_rank_128.npy",
    )
    np.save(out, rank.astype(np.uint32))
    print(f"wrote {out}: {rank.shape}")


if __name__ == "__main__":
    main()
