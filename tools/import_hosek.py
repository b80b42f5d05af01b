"""One-time importer: bake the Hosek-Wilkie 2012 RGB sky coefficient tables
into mitsuba_path_guiding_tpu/data/hosek_rgb.npz.

The tables are published numeric DATA (3-clause BSD, (c) 2012 Lukas Hosek &
Alexander Wilkie, "An Analytic Model for Full Spectral Sky-Dome Radiance",
SIGGRAPH 2012) shipped by the reference in
/root/reference/src/emitters/sunsky/skymodeldata.h (datasetRGB1..3 and
datasetRGBRad1..3).  This script parses the numbers out of the header and
stores them in model layout:

  rgb      (3, 2, 10, 6, 9)  channel x albedo x turbidity x elev-ctrl x param
  rgb_rad  (3, 2, 10, 6)

Run from the repo root:  python tools/import_hosek.py [path-to-skymodeldata.h]
"""
import re
import sys

import numpy as np

SRC = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/reference/src/emitters/sunsky/skymodeldata.h"
)
OUT = "mitsuba_path_guiding_tpu/data/hosek_rgb.npz"


def extract(text: str, name: str) -> np.ndarray:
    m = re.search(rf"double {name}\[\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S)
    if not m:
        raise SystemExit(f"table {name} not found in {SRC}")
    body = re.sub(r"//.*?$|/\*.*?\*/", "", m.group(1), flags=re.S | re.M)
    vals = [
        float(x)
        for x in re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?", body)
    ]
    return np.asarray(vals, dtype=np.float64)


def main():
    text = open(SRC).read()
    rgb = np.stack(
        [extract(text, f"datasetRGB{c}").reshape(2, 10, 6, 9) for c in (1, 2, 3)]
    )
    rgb_rad = np.stack(
        [extract(text, f"datasetRGBRad{c}").reshape(2, 10, 6) for c in (1, 2, 3)]
    )
    np.savez_compressed(OUT, rgb=rgb.astype(np.float32), rgb_rad=rgb_rad.astype(np.float32))
    print(f"wrote {OUT}: rgb {rgb.shape}, rgb_rad {rgb_rad.shape}")


if __name__ == "__main__":
    main()
