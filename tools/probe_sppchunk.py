"""A/B the spp-chunk dispatch batching on the chip.

probe_cornell measured ~26 ms per-dispatch fixed cost vs ~15 ms marginal
per spp on cornell 512^2 (render time nearly flat in depth), so batching
k statically-unrolled samples per jit dispatch should approach 2x on the
headline. Sweep chunk on cornell 512^2 @16spp and the banded 1080p point.

Run: python tools/probe_sppchunk.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import numpy as np


def bench_one(width, height, chunk, spp, reps):
    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box

    r = Renderer(width=width, height=height)
    r.spp_chunk = chunk
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()

    # two same-chunk warmups (first post-compile dispatch carries ~10x
    # overhead on the axon tunnel)
    r.render(n_samples=chunk, max_depth=5)
    r.render(n_samples=chunk, max_depth=5)
    float(np.asarray(r.layers["n_path_vertices"]))
    best = 0.0
    for _ in range(reps):
        v0 = float(np.asarray(r.layers["n_path_vertices"]))
        t0 = time.time()
        r.render(n_samples=spp, max_depth=5)
        v1 = float(np.asarray(r.layers["n_path_vertices"]))
        dt = time.time() - t0
        best = max(best, (v1 - v0) / dt / 1e6)
    assert np.isfinite(np.asarray(r.layers["beauty"])).all()
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for chunk in (1, 2, 4, 8, 16):
        mpvs = bench_one(512, 512, chunk, 16, reps)
        print(f"cornell 512^2 @16spp chunk={chunk:2d}: {mpvs:6.2f} Mpv/s",
              flush=True)
    for chunk in (1, 4, 8):
        mpvs = bench_one(1920, 1080, chunk, 16, max(1, reps - 1))
        print(f"cornell 1080p @16spp chunk={chunk:2d}: {mpvs:6.2f} Mpv/s",
              flush=True)


if __name__ == "__main__":
    main()
