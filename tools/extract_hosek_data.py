"""Extract the Hosek-Wilkie RGB sky dataset into a compact .npz asset.

The dataset is the published coefficient tables from the authors' public
BSD-3-licensed sample implementation of:
  Hosek & Wilkie, "An Analytic Model for Full Spectral Sky-Dome Radiance",
  SIGGRAPH 2012 (http://cgg.mff.cuni.cz/projects/SkylightModelling/).
It is scientific DATA (model coefficients), not program code; we parse the
numbers out of the header the reference vendors and store them as binary
arrays with this provenance note. Layout per channel:
  datasetRGB:    [2 albedos x 10 turbidities x 6 elevation-ctrl x 9 coeffs]
  datasetRGBRad: [2 albedos x 10 turbidities x 6 elevation-ctrl]

Run:  python tools/extract_hosek_data.py
"""

import os
import re

import numpy as np

SRC = "/root/reference/fredholm/include/fredholm/arhosek_rgb_data.h"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "fredholm_tpu", "assets", "hosek_rgb.npz"
)


def parse_arrays(text: str):
    arrays = {}
    for m in re.finditer(
        r"inline float (dataset\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S
    ):
        name = m.group(1)
        body = re.sub(r"//[^\n]*", "", m.group(2))  # strip line comments
        nums = re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", body)
        arrays[name] = np.asarray([float(x) for x in nums], dtype=np.float32)
    return arrays


def main() -> None:
    with open(SRC) as f:
        arrays = parse_arrays(f.read())
    cfg = np.stack(
        [arrays["datasetRGB1"], arrays["datasetRGB2"], arrays["datasetRGB3"]]
    )  # [3, 1080]
    rad = np.stack(
        [
            arrays["datasetRGBRad1"],
            arrays["datasetRGBRad2"],
            arrays["datasetRGBRad3"],
        ]
    )  # [3, 120]
    assert cfg.shape == (3, 2 * 10 * 6 * 9), cfg.shape
    assert rad.shape == (3, 2 * 10 * 6), rad.shape
    np.savez_compressed(OUT, config=cfg, radiance=rad)
    print(f"wrote {OUT}: config {cfg.shape}, radiance {rad.shape}")


if __name__ == "__main__":
    main()
