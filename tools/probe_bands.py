"""Probe: does band-splitting the 1080p frame recover the 512^2 rate?

VERDICT round-2 weak #9: cornell 1080p runs at ~22 Mpv/s vs ~36 at 512^2 —
hypothesis is the fused pipeline's [N]-plane intermediates stop fitting in
on-chip storage once N grows 7.9x. The fused path already takes
tile_height/y0 with GLOBAL pixel indexing (the shard_map path depends on
it), so rendering the frame as a host loop over row bands produces the
exact same per-pixel sample streams; only the working-set size changes.

Run on the real chip:  python tools/probe_bands.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

cache = os.path.expanduser("~/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)

from fredholm_tpu.renderer import Renderer  # noqa: E402
from fredholm_tpu.scene.procedural import cornell_box  # noqa: E402

W, H, SPP, DEPTH = 1920, 1080, 8, 5


def make_renderer():
    r = Renderer(width=W, height=H)
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    return r


def run(n_bands: int) -> float:
    os.environ["FREDHOLM_BAND_H"] = str(H // n_bands if n_bands > 1 else 0)
    r = make_renderer()
    r.render(n_samples=2, max_depth=DEPTH)  # compile + warm
    r.render(n_samples=1, max_depth=DEPTH)
    v0 = float(np.asarray(r.layers["n_path_vertices"]))
    t0 = time.time()
    r.render(n_samples=SPP, max_depth=DEPTH)
    v1 = float(np.asarray(r.layers["n_path_vertices"]))
    dt = time.time() - t0
    mpvs = (v1 - v0) / dt / 1e6
    print(f"bands={n_bands:2d} band_h={H // n_bands if n_bands > 1 else H}"
          f"  {mpvs:7.2f} Mpv/s  ({dt * 1e3 / SPP:.1f} ms/spp)", flush=True)
    return mpvs


if __name__ == "__main__":
    # band heights stay 8-divisible (swizzle contract): 1080 = 2*540 =
    # 3*360 = 5*216 = 9*120
    for nb in (1, 2, 3, 5, 9):
        run(nb)
