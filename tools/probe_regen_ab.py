"""A/B the sample-slot regeneration wavefront vs the plain fused chunk
on the real chip (cornell 512x512 @16spp depth5, bench methodology)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402

from fredholm_tpu.renderer import Renderer  # noqa: E402
from fredholm_tpu.scene.procedural import cornell_box  # noqa: E402


def timed(r, spp, depth):
    r.render(n_samples=2, max_depth=depth)
    r.render(n_samples=2, max_depth=depth)
    v0 = float(np.asarray(r.layers["n_path_vertices"]))
    t0 = time.time()
    r.render(n_samples=spp, max_depth=depth)
    v1 = float(np.asarray(r.layers["n_path_vertices"]))
    dt = time.time() - t0
    return (v1 - v0) / dt / 1e6, dt


for use_regen in (True, False):
    r = Renderer(width=512, height=512)
    r.use_regen = use_regen
    r.set_scene(cornell_box())
    mpvs, dt = timed(r, 16, 5)
    print(f"regen={use_regen}: {mpvs:.2f} Mpv/s ({dt:.3f} s)", flush=True)
