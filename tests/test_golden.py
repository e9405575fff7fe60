"""Golden-image SSIM regression suite.

Numerical version of the reference's visual scene validation (SURVEY.md
section 4): each scene renders deterministically (fixed seeds/sampler
streams) and must match its committed golden at SSIM >= 0.98. Regenerate
goldens with tools/gen_goldens.py after INTENTIONAL image changes only.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from gen_goldens import OUT_DIR, golden_scenes, render_golden  # noqa: E402

from fredholm_tpu.utils.ssim import ssim  # noqa: E402

SCENES = sorted(golden_scenes().keys())


@pytest.mark.parametrize("name", SCENES)
def test_golden(name):
    path = os.path.join(OUT_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run tools/gen_goldens.py ({name})")
    golden = np.load(path)["image"].astype(np.float32)
    img = render_golden(name)
    # compare in a display-ish range so HDR outliers don't dominate
    a = np.clip(golden, 0.0, 1.0)
    b = np.clip(np.asarray(img), 0.0, 1.0)
    score = ssim(a, b)
    assert score >= 0.98, f"{name}: SSIM {score:.4f}"


def test_furnace_golden_is_exact():
    """The committed furnace golden must show perfect energy conservation."""
    path = os.path.join(OUT_DIR, "furnace.npz")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    golden = np.load(path)["image"].astype(np.float32)
    np.testing.assert_allclose(golden.mean(), 0.5, rtol=0.01)
