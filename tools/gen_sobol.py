"""Generate Sobol direction-number matrices asset.

The reference embeds 1024-dim x 52-bit Sobol matrices as a 10k-line CUDA
array (/root/reference/fredholm/modules/sobol.cu:4-10659). We instead derive
the standard Joe-Kuo direction numbers from scipy's QMC module (same public
dataset) and ship them as a compact .npy. 128 dimensions x 32 bits is ample:
the integrator consumes ~4 one-dimensional draws per bounce with max_depth
<= 32 (sampling.cu:19-22, pt.cu:455-932).

Run:  python tools/gen_sobol.py
"""

import os

import numpy as np
import scipy.stats._sobol as sb

DIMS = 128
BITS = 32


def main() -> None:
    v = np.zeros((DIMS, BITS), dtype=np.uint64)
    sb._initialize_v(v, dim=DIMS, bits=BITS)
    v32 = v.astype(np.uint32)
    # sanity: first dimension is the van der Corput sequence
    assert v32[0, 0] == 0x80000000 and v32[0, 1] == 0x40000000
    out = os.path.join(
        os.path.dirname(__file__), "..", "fredholm_tpu", "assets",
        "sobol_matrices.npy",
    )
    np.save(out, v32)
    print(f"wrote {out}: {v32.shape} uint32")


if __name__ == "__main__":
    main()
