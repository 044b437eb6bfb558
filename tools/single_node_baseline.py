"""Single-node, single-thread numpy baseline — what the reference's
eager in-memory path costs for the same zonal-statistics job the engine
runs distributed (the reference publishes no numbers, BASELINE.md, so
this measures its execution model: whole-array numpy kernels, one
process, one core).

Job (same semantics as the bench zonal): the BENCH grid (4320x2160 =
9,331,200 cells) held fully in memory, center-PIP zonal stats for the
3 convex zones + the continent-sized skew zone. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"

import numpy as np  # noqa: E402

from georasters_spark.functions import geometry as geom  # noqa: E402
from georasters_spark.sources import synth  # noqa: E402


def main():
    spec = synth.BENCH
    zones = synth.ZONES_T1 + [z for z in synth.ZONES_EXTRA if z.name == "skew_half_world"]

    t0 = time.time()
    full = synth.stitched_array(spec).astype(np.float64)
    gen_s = time.time() - t0

    t0 = time.time()
    valid = full != spec.ndv
    rows, cols = np.nonzero(valid)
    vals = full[valid]
    xc = spec.x0 + (cols + 0.5) * spec.cellx
    yc = spec.y0 + (rows + 0.5) * spec.celly
    out = {}
    for z in zones:
        bx0, by0, bx1, by1 = geom.rings_bbox(z.rings)
        cand = (xc >= bx0) & (xc <= bx1) & (yc >= by0) & (yc <= by1)
        hit = geom.points_in_rings(xc[cand], yc[cand], z.rings)
        v = vals[cand][hit]
        out[z.zone_id] = {
            "count": int(v.size), "sum": int(v.sum()),
            "mean": round(float(v.mean()), 6) if v.size else None,
        }
    zonal_s = time.time() - t0
    npx = spec.width * spec.height
    print(json.dumps({
        "metric": "single_node_numpy_zonal",
        "pixels": npx,
        "zones": len(zones),
        "generate_sec": round(gen_s, 3),
        "zonal_sec": round(zonal_s, 3),
        "pixels_per_sec": round(npx / zonal_s),
        "results": out,
    }))


if __name__ == "__main__":
    main()
