"""A/B probe: wavefront compaction (fused/compact.py) on the real chip.

Runs a scene with FREDHOLM_COMPACT=0 vs 1 and reports ms/sample
(min over reps — first post-compile dispatch carries ~10x overhead on
the axon tunnel, PERF.md round-3 methodology note).

  python tools/probe_compact.py [terrain|sweep|cornell|cornell1080] [spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import numpy as np


def build(which):
    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box, terrain

    if which == "terrain":
        r = Renderer(width=512, height=288)
        r.set_scene(terrain())
        r.camera.origin = np.asarray([0.0, 4.5, 11.0], np.float32)
        r.camera.look_around(0.0, -0.25)
    elif which == "sweep":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import _sweep_scene

        r = Renderer(width=512, height=288)
        r.set_scene(_sweep_scene())
        r.camera.origin = np.asarray([0.0, 2.0, 8.0], np.float32)
        r.camera.look_around(0.0, 0.0)
    elif which == "cornell1080":
        r = Renderer(width=1920, height=1080)
        r.set_scene(cornell_box())
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    else:
        r = Renderer(width=512, height=512)
        r.set_scene(cornell_box())
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    if which in ("terrain", "sweep"):
        r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3],
                                angle=0.5)
        r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    return r


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "terrain"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(os.environ.get("REPS", "3"))
    out = {}
    for mode in ("0", "1"):
        os.environ["FREDHOLM_COMPACT"] = mode
        r = build(which)
        r.render(n_samples=1, max_depth=5)
        r.render(n_samples=1, max_depth=5)
        float(np.asarray(r.layers["n_path_vertices"]))
        best = 1e30
        for _ in range(reps):
            v0 = float(np.asarray(r.layers["n_path_vertices"]))
            t0 = time.time()
            r.render(n_samples=spp, max_depth=5)
            v1 = float(np.asarray(r.layers["n_path_vertices"]))
            dt = time.time() - t0
            best = min(best, dt)
            mpvs = (v1 - v0) / dt / 1e6
        out[mode] = (best, mpvs)
        print(f"{which} compact={mode}: best {best*1e3:.1f} ms "
              f"/ {spp} spp, {mpvs:.3f} Mpv/s", flush=True)
    speedup = out["0"][0] / out["1"][0]
    print(f"{which}: compaction speedup x{speedup:.2f}", flush=True)


if __name__ == "__main__":
    main()
