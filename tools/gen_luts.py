"""Precompute directional-albedo LUT assets (see fredholm_tpu/bsdf/lut.py).

Run:  JAX_PLATFORMS=cpu python tools/gen_luts.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    from fredholm_tpu.bsdf import lut

    r = lut.compute_reflection_lut()
    np.save(lut._REFLECTION_PATH, r)
    print(f"reflection lut {r.shape}: corner(F0=1,smooth)={r[-1, 0, 0]:.4f}")

    s = lut.compute_sheen_lut()
    np.save(lut._SHEEN_PATH, s)
    print(f"sheen lut {s.shape}: max={s.max():.4f}")

    i1 = lut.compute_reflection_ior1_lut()
    np.save(lut._REFLECTION_IOR1_PATH, i1)
    print(f"reflection-ior1 lut {i1.shape}: mean={i1.mean():.4f}")


if __name__ == "__main__":
    main()
