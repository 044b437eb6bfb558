"""Marching-squares contour extraction: numpy case-index parity and
geometric invariants."""

import numpy as np
import pandas as pd

from georasters_spark.operators import contour as CT
from georasters_spark.sources import synth


def test_contour_invariants_and_numpy_parity(spark):
    h = w = 48
    rr = np.arange(h)[:, None]
    cc = np.arange(w)[None, :]
    full = synth.field_value(rr, cc, 42).astype(np.float64)
    dem = spark.createDataFrame(
        pd.DataFrame([(r, c, full[r, c]) for r in range(h) for c in range(w)],
                     columns=["row", "col", "value"]),
        "row long, col long, value double",
    )
    level = 1000.0
    got = CT.contour_segments(dem, levels=[level]).toPandas()

    # numpy: same case table applied directly to the corner bits
    tl = full[:-1, :-1] >= level
    tr = full[:-1, 1:] >= level
    br = full[1:, 1:] >= level
    bl = full[1:, :-1] >= level
    idx = tl * 8 + tr * 4 + br * 2 + bl * 1
    exp_counts = np.vectorize(lambda i: len(CT.MS_CASES[int(i)]))(idx)
    assert len(got) == int(exp_counts.sum())
    cnt = got.groupby(["brow", "bcol"]).size()
    for (r, c), n in cnt.items():
        assert n == exp_counts[r, c]

    # geometric invariants: every endpoint lies ON a block edge, inside
    # the block, and interpolation recovers the level
    for t in got.itertuples(index=False):
        for (x, y) in ((t.x1, t.y1), (t.x2, t.y2)):
            u, v = x - t.bcol, y - t.brow
            assert -1e-9 <= u <= 1 + 1e-9 and -1e-9 <= v <= 1 + 1e-9
            on_edge = min(abs(u), abs(1 - u), abs(v), abs(1 - v)) < 1e-9
            assert on_edge, (u, v)
            # bilinear interpolation of the corner values along the edge
            z = (full[t.brow, t.bcol] * (1 - u) * (1 - v)
                 + full[t.brow, t.bcol + 1] * u * (1 - v)
                 + full[t.brow + 1, t.bcol] * (1 - u) * v
                 + full[t.brow + 1, t.bcol + 1] * u * v)
            assert abs(z - level) < 1e-2, (t, z)  # endpoints 6dp-rounded
        # level == a corner value (integer DEM, integer level) emits a
        # degenerate zero-length segment — deterministic on both engines
        assert t.seg_len >= 0
