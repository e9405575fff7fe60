"""Benchmark: Cornell-box progressive path trace on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpath-vertices/s", "vs_baseline": N}

The metric counts shaded path vertices (surface interactions) per second,
matching BASELINE.json's north-star unit (>= 100 Mpath-vertices/s/chip).
`--smoke` runs a tiny config for CI-style validation.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPVS = 100.0  # north star from BASELINE.json (v5p-8 per chip)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    if args.smoke:
        args.width = args.height = 64
        args.spp = 2
        args.max_depth = 3

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box

    r = Renderer(width=args.width, height=args.height)
    r.set_scene(cornell_box())
    # the effective eye sits f~1 behind the origin (camera.cu:14-16), so
    # origin z=0.6 puts the eye just inside the opening cone: every primary
    # ray hits geometry
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()

    # warmup / compile
    r.render(n_samples=1, max_depth=args.max_depth)
    v0 = float(np.asarray(r.layers["n_path_vertices"]))

    t0 = time.time()
    r.render(n_samples=args.spp, max_depth=args.max_depth)
    v1 = float(np.asarray(r.layers["n_path_vertices"]))  # forces sync
    dt = time.time() - t0

    beauty = np.asarray(r.layers["beauty"])
    assert np.isfinite(beauty).all(), "non-finite radiance"

    mpvs = (v1 - v0) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": (
                    f"cornell-box {args.width}x{args.height} @{args.spp}spp "
                    f"depth{args.max_depth} single-chip path tracing"
                ),
                "value": round(mpvs, 3),
                "unit": "Mpath-vertices/s",
                "vs_baseline": round(mpvs / BASELINE_MPVS, 4),
            }
        )
    )

    if args.out:
        from fredholm_tpu.utils.image import write_png

        write_png(args.out, np.clip(r.get_layer("beauty"), 0, 1) ** (1 / 2.2))


if __name__ == "__main__":
    main()
