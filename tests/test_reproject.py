"""Reproject differential test vs an independent numpy warp
(mirrors reference tests/test_georasters.py:315-397: same shape,
identical masks, values within tolerance)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georasters_spark.operators import pixels as PX
from georasters_spark.operators import reproject as RP
from georasters_spark.sources import synth


def test_wgs84_to_cea_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (180, 360)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid(
        px,
        src_origin=(spec.x0, spec.y0),
        src_cellsize=(spec.cellx, spec.celly),
        src_shape=(spec.height, spec.width),
        out_shape=out_shape,
    ).toPandas()
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()

    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.warp_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
    )
    # masked-source cells land as NULL -> ndv in grid; oracle writes the
    # source value (incl. ndv) — harmonize: oracle ndv stays ndv.
    mismatch = (grid != exp).sum()
    # JVM vs libm trig may differ 1 ulp → floor flips on a measure-zero
    # set of boundary cells; reference itself compares with atol=1.0.
    assert mismatch / grid.size < 0.005, mismatch
    # shape + roundtrip sanity: equator-adjacent rows keep values
    assert grid.shape == out_shape
    assert (grid != spec.ndv).sum() > 0.5 * (exp != spec.ndv).sum()


def test_wgs84_to_webmercator_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (128, 128)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_webmercator_grid(
        px,
        src_origin=(spec.x0, spec.y0),
        src_cellsize=(spec.cellx, spec.celly),
        src_shape=(spec.height, spec.width),
        out_shape=out_shape,
    ).toPandas()
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.webmercator_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
    )
    mismatch = (grid != exp).sum()
    assert mismatch / grid.size < 0.005, mismatch


def test_cea_bilinear_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (90, 180)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_bilinear(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    exp, cnt = RP.cea_bilinear_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    # weight renormalization: cells fed by <4 valid neighbors exist
    assert (vals.n_contrib < 4).any() and (vals.n_contrib == 4).any()


def test_cea_average_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (45, 90)  # strong downsample: many sources per target
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_average(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    s, n = RP.cea_average_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    assert len(got) == int((n > 0).sum())
    for t in got.itertuples(index=False):
        assert t.n_contrib == n[t.trow, t.tcol]
        assert abs(t.value - round(float(s[t.trow, t.tcol] / n[t.trow, t.tcol]), 6)) < 1e-6
    assert got.n_contrib.max() > 10  # really aggregating many cells


def test_cea_cubic_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (60, 120)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_cubic(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    exp, cnt = RP.cea_cubic_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    # ~25% nodata: a fully-valid 4x4 window is rare at this sampling —
    # assert the support is genuinely wide instead
    assert vals.n_contrib.max() >= 14
    # cubic can legitimately overshoot the input range (negative lobes,
    # partial weight mass under nodata) but the 0.05 weight-mass guard
    # bounds the blow-up
    assert vals.value.min() > -6000 and vals.value.max() < 8000


def test_reproject_dispatcher_and_agg_modes(spark, images_t1):
    """API-surface parity: EPSG ints / strings / proj4 prefixes accepted;
    mode/min/max/sum/count aggregate resampling agree with numpy."""
    import pytest

    spec = synth.T1
    out_shape = (45, 90)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    kw = dict(src_origin=(spec.x0, spec.y0), src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=out_shape)
    # dispatcher equivalences
    a = RP.reproject(px, 4326, "EPSG:6933", resampling="nearest", **kw).toPandas()
    b = RP.wgs84_to_cea_grid(px, kw["src_origin"], kw["src_cellsize"],
                             kw["src_shape"], out_shape).toPandas()
    assert len(a) == len(b)
    m = RP.reproject(px, "+proj=longlat +datum=WGS84", "+proj=merc", **kw)
    assert m.count() == out_shape[0] * out_shape[1]
    with pytest.raises(NotImplementedError):
        # UTM IS supported now (Krüger series) — but a GLOBAL-extent
        # source must window to the zone via bbox_lonlat, else refuse
        RP.reproject(px, 4326, "EPSG:32633", **kw)
    with pytest.raises(NotImplementedError):
        RP.reproject(px, 4326, 6933, resampling="nope", **kw)

    # aggregate modes vs numpy forward-bucketing
    s, n = RP.cea_average_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        kw["src_origin"], kw["src_cellsize"], out_shape,
    )
    cnt = RP.reproject(px, 4326, 6933, resampling="count", **kw).toPandas()
    for t in cnt.itertuples(index=False):
        assert t.value == n[t.trow, t.tcol]
    sm = RP.reproject(px, 4326, 6933, resampling="sum", **kw).toPandas()
    for t in sm.itertuples(index=False):
        assert t.value == s[t.trow, t.tcol]
    # mode: deterministic most-common with smallest-value tie-break
    md = RP.reproject(px, 4326, 6933, resampling="mode", **kw).toPandas()
    full = synth.stitched_array(spec).astype(np.float64)
    import collections
    # recompute buckets in numpy for 5 sample cells
    h, w = full.shape
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    valid = full != spec.ndv
    X0, Y1, X1, Y0 = RP.cea_bounds(spec.x0, spec.y0 + h * spec.celly,
                                   spec.x0 + w * spec.cellx, spec.y0)
    tcx, tcy = (X1 - X0) / out_shape[1], (Y1 - Y0) / out_shape[0]
    X = (RP.R * 1.0) * np.radians(spec.x0 + (cc + 0.5) * spec.cellx)
    Y = (RP.R / 1.0) * np.sin(np.radians(spec.y0 + (rr + 0.5) * spec.celly))
    trow = np.floor(np.round((Y - Y0) / tcy, 4)).astype(np.int64)
    tcol = np.floor(np.round((X - X0) / tcx, 4)).astype(np.int64)
    sample = md.sample(n=5, random_state=0)
    for t in sample.itertuples(index=False):
        sel = valid & (trow == t.trow) & (tcol == t.tcol)
        c = collections.Counter(full[sel].tolist())
        best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
        assert t.value == best[0]


def test_webmercator_inverse_roundtrip():
    import math

    for lat in [0.0, 45.5, -60.2, 80.0]:
        Y = RP.R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
        back = math.degrees(2 * math.atan(math.exp(Y / RP.R)) - math.pi / 2)
        assert abs(lat - back) < 1e-10


def test_cea_bounds_monotone():
    x0, y0, x1, y1 = RP.cea_bounds(-180, -90, 180, 90)
    assert x0 < x1 and y0 < y1
    assert abs(x1 - RP.R * np.pi) < 1e-6


def test_cea_inverse_roundtrip():
    """forward(inverse(X, Y)) == (X, Y) numerically."""
    import math

    k = 1.0
    for lon, lat in [(12.3, 45.6), (-170.0, -80.0), (0.0, 0.0)]:
        X = RP.R * math.radians(lon) * k
        Y = RP.R * math.sin(math.radians(lat)) / k
        lon2 = math.degrees(X / (RP.R * k))
        lat2 = math.degrees(math.asin(Y * k / RP.R))
        assert abs(lon - lon2) < 1e-12 and abs(lat - lat2) < 1e-12


def test_cea_lanczos_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (45, 90)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_lanczos(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    exp, cnt = RP.cea_lanczos_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    assert vals.n_contrib.max() >= 30  # wide 6x6 support really engaged
    # dispatcher route
    d = RP.reproject(px, 4326, 6933, resampling="lanczos",
                     src_origin=(spec.x0, spec.y0),
                     src_cellsize=(spec.cellx, spec.celly),
                     src_shape=(spec.height, spec.width), out_shape=out_shape)
    assert d.count() == out_shape[0] * out_shape[1]


def test_webmercator_bilinear_matches_numpy(spark, images_t1):
    """reproject(..., 'EPSG:3857', resampling='bilinear') through the
    dispatcher == the independent numpy Mercator bilinear warp (ref
    modes dict georasters.py:592-606); exercises the CRS-agnostic
    kernel with the Mercator inverse."""
    spec = synth.T1
    out_shape = (96, 192)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.reproject(
        px, "EPSG:4326", "EPSG:3857",
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
        resampling="bilinear",
    ).toPandas()
    exp, cnt = RP.webmercator_bilinear_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    assert (vals.n_contrib < 4).any() and (vals.n_contrib == 4).any()


def test_tm_series_three_independent_oracles():
    """The Krüger-series transverse Mercator is validated three
    independent ways (no GDAL/pyproj in-sandbox):
      1. inverse∘forward == identity to <1e-10 deg across a zone
         (alpha vs beta/delta series are independent derivations — a
         transcribed coefficient error breaks closure),
      2. on the central meridian, N == k0 · the ellipsoidal meridian
         arc integrated numerically (Simpson, 2M points) to <1e-4 m —
         validates A, the conformal latitude and the alpha series,
      3. the f→0 limit equals the closed-form SPHERICAL transverse
         Mercator exactly — validates the series structure."""
    import math

    rng = np.random.default_rng(3)
    lon0 = RP.utm_lon0(31)
    lon = lon0 + rng.uniform(-3.5, 3.5, 5000)
    lat = rng.uniform(-80, 84, 5000)
    E, N = RP.tm_forward_np(lon, lat, lon0)
    lon2, lat2 = RP.tm_inverse_np(E, N, lon0)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10

    a, f = RP._WGS84_A, RP._WGS84_F
    e2 = f * (2 - f)
    for latd in (10.0, 45.0, 70.0, -33.0):
        phi = math.radians(latd)
        m = 2_000_001
        t = np.linspace(0.0, phi, m)
        integrand = a * (1 - e2) / np.power(1 - e2 * np.sin(t) ** 2, 1.5)
        h = phi / (m - 1)
        arc = (integrand[0] + integrand[-1] + 4 * integrand[1:-1:2].sum()
               + 2 * integrand[2:-1:2].sum()) * h / 3
        E, N = RP.tm_forward_np(np.array([lon0]), np.array([latd]), lon0)
        assert abs(E[0] - 500000.0) < 1e-6
        assert abs(N[0] - 0.9996 * arc) < 1e-4, latd

    lonr = np.radians(lon - lon0)
    latr = np.radians(lat)
    xs = 500000 + 0.9996 * a * np.arctanh(np.cos(latr) * np.sin(lonr))
    ys = 0.9996 * a * np.arctan2(np.tan(latr), np.cos(lonr))
    E0, N0 = RP.tm_forward_np(lon, lat, lon0, f=1e-300)
    assert np.abs(E0 - xs).max() < 1e-6
    assert np.abs(N0 - ys).max() < 1e-6


def test_utm_warp_matches_numpy(spark, images_t1):
    """Spark UTM nearest warp (JVM Column series inverse) == the numpy
    differential oracle cell-for-cell (quantized gather), zone window
    over lon [0,6] x lat [36,54]; bilinear variant within quantization
    wiggle. South-hemisphere false northing checked via zone 31S."""
    spec = synth.T1
    out_shape = (64, 32)
    bbox = (0.0, 36.0, 6.0, 54.0)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.reproject(
        px, 4326, 32631,
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
        resampling="nearest", bbox_lonlat=bbox,
    ).toPandas()
    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.utm_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        out_shape, zone=31, bbox_lonlat=bbox,
    )
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
    assert (grid != exp).sum() == 0

    # south: zone 56S around Sydney-ish lon/lat (false northing path)
    bbox_s = (150.0, -40.0, 156.0, -30.0)
    got_s = RP.reproject(
        px, "EPSG:4326", "+proj=utm +zone=56 +south",
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), (32, 32),
        resampling="nearest", bbox_lonlat=bbox_s,
    ).toPandas()
    exp_s = RP.utm_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (32, 32), zone=56, south=True, bbox_lonlat=bbox_s,
    )
    grid_s = np.full((32, 32), spec.ndv)
    vs = got_s.dropna(subset=["value"])
    grid_s[vs.trow.to_numpy(), vs.tcol.to_numpy()] = vs.value.to_numpy()
    assert (grid_s != exp_s).sum() == 0
    assert (got_s["nm"] > 4_000_000).all()  # false northing applied

    # bilinear through the dispatcher runs and covers the window
    bl = RP.reproject(
        px, 4326, 32631,
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
        resampling="bilinear", bbox_lonlat=bbox,
    ).toPandas()
    assert len(bl) == out_shape[0] * out_shape[1]
    assert bl["value"].notna().sum() > 0.8 * len(bl)
    # and a global-extent UTM warp refuses loudly instead of diverging
    import pytest
    with pytest.raises(NotImplementedError, match="central meridian"):
        RP.reproject(px, 4326, 32631, (spec.x0, spec.y0),
                     (spec.cellx, spec.celly), (spec.height, spec.width),
                     out_shape).toPandas()


def test_sinusoidal_matches_numpy(spark, images_t1):
    """Sinusoidal (MODIS-grid) nearest warp through the dispatcher ==
    the independent numpy oracle cell-for-cell; bilinear runs via the
    CRS-agnostic kernel; proj4/ESRI aliases parse."""
    spec = synth.T1
    out_shape = (72, 144)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.reproject(
        px, 4326, "+proj=sinu",
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
        resampling="nearest",
    ).toPandas()
    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.sinusoidal_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
    )
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
    assert (grid != exp).sum() == 0
    assert RP.parse_crs("ESRI:54008") == "sinu"

    bl = RP.reproject(
        px, 4326, "sinusoidal",
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), (45, 90),
        resampling="bilinear",
    ).toPandas()
    assert len(bl) == 45 * 90
    assert bl["value"].notna().sum() > 0.4 * len(bl)  # globe in a sinusoid


def test_cea_cubicspline_matches_numpy(spark, images_t1):
    """resampling='cubicspline' (GDAL's APPROXIMATING cubic B-spline —
    a local all-positive partition-of-unity 4x4 kernel, no global
    prefilter in GDAL's mode either) == the independent numpy oracle;
    B-spline weights never overshoot the local value range."""
    spec = synth.T1
    out_shape = (60, 120)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.reproject(
        px, 4326, 6933,
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
        resampling="cubicspline",
    ).toPandas()
    exp, cnt = RP.cea_cubic_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
        kernel="bspline",
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    # all-positive kernel: a convex combination -> inside the data range
    assert vals.value.min() >= 0.0 and vals.value.max() <= 1996.0
    # and it genuinely differs from the interpolating Catmull-Rom
    exp_cm, _ = RP.cea_cubic_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    both = np.isfinite(exp) & np.isfinite(exp_cm)
    assert np.abs(exp[both] - exp_cm[both]).max() > 1.0


def test_conic_formulary_invariants():
    """Snyder-formulary invariants, independent of any warp: projection
    center maps to (FE, FN); inverse∘forward is identity; scale factor
    is 1 on both standard parallels; AEA is equal-area (k·h = 1) and
    LCC is conformal (k = h) at an arbitrary off-axis point."""
    import math

    for token, lat0, parallels in (
        ("aea:5070", 23.0, (29.5, 45.5)),
        ("aea:3310", 0.0, (34.0, 40.5)),
        ("lcc:2154", 46.5, (49.0, 44.0)),
        ("lcc:3978", 49.0, (49.0, 77.0)),
    ):
        P = RP.conic_params_of(token)
        x, y = RP.conic_forward_np(P["lon0"], lat0, P)
        assert abs(float(x) - P["fe"]) < 1e-6
        assert abs(float(y) - P["fn"]) < 1e-6

        lons = np.linspace(P["lon0"] - 20, P["lon0"] + 20, 21)
        lats = np.linspace(lat0 - 10, lat0 + 15, 19)
        LO, LA = np.meshgrid(lons, lats)
        X, Y = RP.conic_forward_np(LO, LA, P)
        lo2, la2 = RP.conic_inverse_np(X, Y, P)
        assert np.abs(lo2 - LO).max() < 1e-7
        assert np.abs(la2 - LA).max() < 1e-7

        a, e2 = P["a"], P["e2"]
        d = 1e-6
        for latp in parallels:
            x1, y1 = RP.conic_forward_np(P["lon0"] + 10, latp, P)
            x2, y2 = RP.conic_forward_np(P["lon0"] + 10 + d, latp, P)
            m = math.cos(math.radians(latp)) / math.sqrt(
                1 - e2 * math.sin(math.radians(latp)) ** 2)
            k = math.hypot(float(x2 - x1), float(y2 - y1)) / (math.radians(d) * a * m)
            assert abs(k - 1.0) < 1e-7, (token, latp)

        lon_t, lat_t = P["lon0"] + 7.3, lat0 + 5.7
        x0, y0 = RP.conic_forward_np(lon_t, lat_t, P)
        xl, yl = RP.conic_forward_np(lon_t + d, lat_t, P)
        xp, yp = RP.conic_forward_np(lon_t, lat_t + d, P)
        m = math.cos(math.radians(lat_t)) / math.sqrt(
            1 - e2 * math.sin(math.radians(lat_t)) ** 2)
        Mrad = a * (1 - e2) / (1 - e2 * math.sin(math.radians(lat_t)) ** 2) ** 1.5
        k_par = math.hypot(float(xl - x0), float(yl - y0)) / (math.radians(d) * a * m)
        h_mer = math.hypot(float(xp - x0), float(yp - y0)) / (math.radians(d) * Mrad)
        if token.startswith("aea"):
            assert abs(k_par * h_mer - 1.0) < 1e-6   # equal-area
        else:
            assert abs(k_par / h_mer - 1.0) < 1e-6   # conformal


def test_conic_warp_matches_numpy(spark, images_t1):
    """Spark Albers/LCC nearest warps (pure-Column series inverse) ==
    the independent numpy oracle cell-for-cell; proj4 forms parse;
    bilinear runs through the CRS-agnostic kernel; antimeridian-
    spanning sources refuse loudly."""
    import pytest

    spec = synth.T1
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    full = synth.stitched_array(spec).astype(np.float64)

    cases = [
        (5070, "aea:5070", (-120.0, 25.0, -75.0, 50.0), (48, 96)),
        ("EPSG:2154", "lcc:2154", (-5.0, 41.0, 10.0, 51.5), (48, 72)),
        ("+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 +y_0=-4000000",
         "aea:3310", (-125.0, 32.0, -114.0, 42.0), (40, 40)),
    ]
    for crs, token, bbox, out_shape in cases:
        assert RP.parse_crs(crs) == token or token.startswith(RP.parse_crs(crs)[:4])
        P = RP.conic_params_of(RP.parse_crs(crs))
        got = RP.reproject(
            px, 4326, crs,
            (spec.x0, spec.y0), (spec.cellx, spec.celly),
            (spec.height, spec.width), out_shape,
            resampling="nearest", bbox_lonlat=bbox,
        ).toPandas()
        exp = RP.conic_numpy_oracle(
            full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly),
            out_shape, P, bbox_lonlat=bbox,
        )
        grid = np.full(out_shape, spec.ndv)
        vals = got.dropna(subset=["value"])
        grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
        assert (grid != exp).sum() == 0, crs

    # proj4 1SP form (lat_2 defaults to lat_1) parses and runs
    tok = RP.parse_crs("+proj=lcc +lat_1=60 +lon_0=-100")
    assert tok.startswith("lcc:custom:60.0:60.0:")
    # bilinear through the dispatcher
    bl = RP.reproject(
        px, 4326, 5070,
        (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), (32, 64),
        resampling="bilinear", bbox_lonlat=(-120.0, 25.0, -75.0, 50.0),
    ).toPandas()
    assert len(bl) == 32 * 64 and bl["value"].notna().sum() > 0.8 * len(bl)
    with pytest.raises(NotImplementedError, match="antimeridian"):
        RP.reproject(px, 4326, 5070, (spec.x0, spec.y0),
                     (spec.cellx, spec.celly), (spec.height, spec.width),
                     (32, 64)).toPandas()
    # since r5, cubic reaches conic targets via the composed warp
    # (mode-matrix completion); only UNKNOWN modes refuse
    cb = RP.reproject(px, 4326, 5070, (spec.x0, spec.y0),
                      (spec.cellx, spec.celly), (spec.height, spec.width),
                      (32, 64), resampling="cubic",
                      bbox_lonlat=(-120.0, 25.0, -75.0, 50.0)).toPandas()
    assert len(cb) == 32 * 64 and cb["value"].notna().sum() > 0.8 * len(cb)
    with pytest.raises(NotImplementedError):
        RP.reproject(px, 4326, 5070, (spec.x0, spec.y0),
                     (spec.cellx, spec.celly), (spec.height, spec.width),
                     (32, 64), resampling="nope",
                     bbox_lonlat=(-120.0, 25.0, -75.0, 50.0))


def test_reproject_any_matches_numpy(spark, images_t1):
    """General any-CRS→any-CRS warp (inverse(dst)∘forward(src) as pure
    Columns) == the independent numpy oracle cell-for-cell, across
    projected sources and cross-projected combos."""
    spec = synth.T1
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    full = synth.stitched_array(spec).astype(np.float64)

    cases = [
        # (src_crs, src_origin, src_cellsize, dst_crs, out, bbox)
        ("EPSG:6933", (-2.0e7, 6.3e6), (4.0e7 / 540, -1.26e7 / 270),
         4326, (48, 96), None),
        (3857, (-2.0e7, 1.9e7), (4.0e7 / 540, -3.8e7 / 270),
         "EPSG:4326", (40, 80), None),
        ("+proj=cea", (-2.0e7, 6.3e6), (4.0e7 / 540, -1.26e7 / 270),
         "EPSG:3857", (32, 64), (-120.0, -60.0, 120.0, 60.0)),
        (32633, (200000.0, 6.5e6), (600000.0 / 540, -1.26e6 / 270),
         4326, (36, 48), None),
        ("+proj=sinu", (-1.0e7, 6.4e6), (2.0e7 / 540, -1.0e7 / 270),
         "EPSG:2154", (32, 48), (-4.0, 41.0, 9.0, 51.0)),
    ]
    for src_crs, so, sc, dst_crs, out_shape, bbox in cases:
        got = RP.reproject(
            px, src_crs, dst_crs, so, sc,
            (spec.height, spec.width), out_shape,
            resampling="nearest", bbox_lonlat=bbox,
        ).toPandas()
        exp = RP.reproject_any_numpy_oracle(
            full, spec.ndv, src_crs, dst_crs, so, sc, out_shape, bbox_lonlat=bbox,
        )
        grid = np.full(out_shape, spec.ndv)
        vals = got.dropna(subset=["value"])
        grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
        assert (grid != exp).sum() == 0, (src_crs, dst_crs)
        assert (grid != spec.ndv).sum() > 0.3 * grid.size, (src_crs, dst_crs)

    # bilinear leg runs and covers
    bl = RP.reproject(
        px, "EPSG:6933", 4326, (-2.0e7, 6.3e6), (4.0e7 / 540, -1.26e7 / 270),
        (spec.height, spec.width), (32, 64), resampling="bilinear",
    ).toPandas()
    assert len(bl) == 32 * 64 and bl["value"].notna().sum() > 0.5 * len(bl)


def test_forward_cols_match_numpy(spark):
    """Every family's Column FORWARD == its numpy forward at 1e-6 m,
    evaluated through a real Spark plan (the composition contract of
    reproject_any)."""
    import pandas as pd

    pts = pd.DataFrame({
        "lon": np.linspace(-20, 25, 13) + 3.0,
        "lat": np.linspace(28, 62, 13),
    })
    sdf = spark.createDataFrame(pts)
    from pyspark.sql import functions as F

    for token in ("cea", "webmerc", "sinu", "utm:33n", "aea:5070", "lcc:2154"):
        fns = RP.crs_funcs(token)
        xc, yc = fns["fwd_cols"](F.col("lon"), F.col("lat"))
        got = sdf.select(xc.alias("x"), yc.alias("y")).toPandas()
        ex, ey = fns["fwd_np"](pts.lon.to_numpy(), pts.lat.to_numpy())
        assert np.abs(got.x.to_numpy() - ex).max() < 1e-6, token
        assert np.abs(got.y.to_numpy() - ey).max() < 1e-6, token


class TestDatumAndWkt:
    def test_datum_epsg_tokens(self):
        for code in (4267, 4277, 4269, 4258, 4230):
            tok = RP.parse_crs(code)
            assert tok.startswith("geog:"), code
            RP.datum_params(tok)  # parses

    def test_proj4_longlat_forms(self):
        assert RP.parse_crs("+proj=longlat +datum=WGS84") == "wgs84"
        assert RP.parse_crs("+proj=longlat +ellps=WGS84") == "wgs84"
        t = RP.parse_crs("+proj=longlat +ellps=clrk66 +towgs84=-8,160,176")
        assert t.startswith("geog:6378206.4:")
        t2 = RP.parse_crs("+proj=longlat +a=6378249.145 +b=6356514.870 "
                          "+towgs84=-143,-90,-294")
        P = RP.datum_params(t2)
        assert abs(P["a"] - 6378249.145) < 1e-6 and P["dx"] == -143.0
        with pytest.raises(NotImplementedError):
            RP.parse_crs("+proj=longlat +ellps=unknown_ellipsoid")

    def test_nad27_shift_magnitude_and_roundtrip(self):
        P = RP.datum_params(RP.parse_crs(4267))
        lon = np.array([-98.0, -75.0, -120.0])
        lat = np.array([39.0, 41.0, 35.0])
        lo, la = RP.datum_to_wgs84_np(lon, lat, P)
        dm = np.hypot((lo - lon) * 111320 * np.cos(np.radians(lat)),
                      (la - lat) * 110540)
        assert (dm > 5).all() and (dm < 300).all()  # CONUS NAD27 shifts
        lo2, la2 = RP.wgs84_to_datum_np(lo, la, P)
        assert np.abs(lo2 - lon).max() < 1e-7
        assert np.abs(la2 - lat).max() < 1e-7

    def test_osgb36_seven_param_roundtrip(self):
        P = RP.datum_params(RP.parse_crs(4277))
        lo, la = RP.wgs84_to_datum_np(np.array([-2.0]), np.array([53.0]), P)
        # known ~100 m class OSGB36<->WGS84 offset near Manchester
        assert 0.0005 < abs(lo[0] + 2.0) < 0.01
        lo2, la2 = RP.datum_to_wgs84_np(lo, la, P)
        assert abs(lo2[0] + 2.0) < 1e-6 and abs(la2[0] - 53.0) < 1e-6

    def test_cols_match_numpy(self, spark):
        P = RP.datum_params(RP.parse_crs(4267))
        import pandas as pd
        pdf = pd.DataFrame({"lon": [-98.0, -70.5, -112.25],
                            "lat": [39.0, 44.5, 33.125]})
        df = spark.createDataFrame(pdf)
        lo_c, la_c = RP.datum_to_wgs84_cols(F.col("lon"), F.col("lat"), P)
        got = df.select(lo_c.alias("lo"), la_c.alias("la")).toPandas()
        lo_n, la_n = RP.datum_to_wgs84_np(pdf.lon.to_numpy(), pdf.lat.to_numpy(), P)
        assert np.abs(got.lo.to_numpy() - lo_n).max() < 1e-12
        assert np.abs(got.la.to_numpy() - la_n).max() < 1e-12

    def test_wkt_geogcs_and_projcs(self):
        wkt_geo = ('GEOGCS["NAD27",DATUM["North_American_Datum_1927",'
                   'SPHEROID["Clarke 1866",6378206.4,294.9786982139006],'
                   'TOWGS84[-8,160,176,0,0,0,0]],PRIMEM["Greenwich",0],'
                   'UNIT["degree",0.0174532925199433]]')
        assert RP.parse_crs(wkt_geo).startswith("geog:6378206.4:")
        wkt_auth = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                    '6378137,298.257223563]],PRIMEM["Greenwich",0],'
                    'UNIT["degree",0.0174532925199433],'
                    'AUTHORITY["EPSG","4326"]]')
        assert RP.parse_crs(wkt_auth) == "wgs84"
        wkt_utm = ('PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",'
                   'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
                   '298.257223563]],PRIMEM["Greenwich",0],'
                   'UNIT["degree",0.0174532925199433]],'
                   'PROJECTION["Transverse_Mercator"],'
                   'PARAMETER["latitude_of_origin",0],'
                   'PARAMETER["central_meridian",15],'
                   'PARAMETER["scale_factor",0.9996],'
                   'PARAMETER["false_easting",500000],'
                   'PARAMETER["false_northing",0],UNIT["metre",1]]')
        assert RP.parse_crs(wkt_utm) == "utm:33n"
        wkt_lcc = ('PROJCS["LCC",GEOGCS["WGS 84",DATUM["WGS_1984",'
                   'SPHEROID["WGS 84",6378137,298.257223563]],'
                   'PRIMEM["Greenwich",0],UNIT["degree",0.017453292519943]],'
                   'PROJECTION["Lambert_Conformal_Conic_2SP"],'
                   'PARAMETER["standard_parallel_1",33],'
                   'PARAMETER["standard_parallel_2",45],'
                   'PARAMETER["latitude_of_origin",39],'
                   'PARAMETER["central_meridian",-96],UNIT["metre",1]]')
        assert RP.parse_crs(wkt_lcc) == "lcc:custom:33.0:45.0:39.0:-96.0:0.0:0.0"

    def test_wkt_axis_bare_keywords(self):
        # Standard GDAL ExportToWkt() output carries AXIS["Latitude",NORTH]
        # nodes whose second argument is a bare (unquoted) enum keyword —
        # the parser must treat NORTH/EAST as string atoms, not nested
        # nodes (advisor finding r4).
        wkt4326 = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                   '6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
                   'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,'
                   'AUTHORITY["EPSG","8901"]],UNIT["degree",'
                   '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
                   'AXIS["Latitude",NORTH],AXIS["Longitude",EAST],'
                   'AUTHORITY["EPSG","4326"]]')
        assert RP.parse_crs(wkt4326) == "wgs84"
        wkt_utm = ('PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",'
                   'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
                   '298.257223563]],PRIMEM["Greenwich",0],'
                   'UNIT["degree",0.0174532925199433]],'
                   'PROJECTION["Transverse_Mercator"],'
                   'PARAMETER["latitude_of_origin",0],'
                   'PARAMETER["central_meridian",15],'
                   'PARAMETER["scale_factor",0.9996],'
                   'PARAMETER["false_easting",500000],'
                   'PARAMETER["false_northing",0],'
                   'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
                   'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
                   'AUTHORITY["EPSG","32633"]]')
        assert RP.parse_crs(wkt_utm) == "utm:33n"

    def test_wkt_refusals(self):
        # projected on a non-WGS84 datum is supported ONLY for
        # Transverse_Mercator; other projections still refuse
        wkt = ('PROJCS["x",GEOGCS["OSGB36",DATUM["D",SPHEROID["Airy 1830",'
               '6377563.396,299.3249646],TOWGS84[446.448,-125.157,542.06,'
               '0.15,0.247,0.842,-20.489]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Mercator_1SP"],'
               'PARAMETER["central_meridian",-2],UNIT["metre",1]]')
        with pytest.raises(NotImplementedError, match="non-WGS84"):
            RP.parse_crs(wkt)
        with pytest.raises(NotImplementedError):
            RP.parse_crs('PROJCS["x",GEOGCS["WGS 84",DATUM["WGS_1984",'
                         'SPHEROID["WGS 84",6378137,298.257223563]],'
                         'PRIMEM["Greenwich",0],UNIT["degree",0.0174]],'
                         'PROJECTION["Robinson"],UNIT["metre",1]]')

    def test_reproject_any_datum_vs_numpy(self, spark):
        h, w = 30, 44
        full = ((np.arange(h)[:, None] * 7919 + np.arange(w)[None, :]
                 * 104729) % 1997).astype(np.int64)
        px = spark.createDataFrame(
            [(r, c, int(full[r, c])) for r in range(h) for c in range(w)],
            "row long, col long, value long")
        org, cell = (-100.0, 40.0), (0.05, -0.05)
        out = (RP.reproject_any(px, 4326, 4267, org, cell, (h, w), (24, 36))
               .toPandas().sort_values(["trow", "tcol"]))
        exp = RP.reproject_any_numpy_oracle(full, -1, 4326, 4267, org, cell,
                                            (24, 36))
        got = out.value.fillna(-1).to_numpy().reshape(24, 36)
        np.testing.assert_array_equal(got, exp)


class TestProjectedOnDatum:
    def test_bng_tm_matches_os_worked_example(self):
        """The Ordnance Survey's published worked example (Airy 1830,
        BNG parameters): OSGB36 52°39'27.2531"N 1°43'4.5177"E ->
        E 651409.903, N 313177.270 — sub-mm from the Krüger series
        with the lat0=49 origin folded into fn_eff."""
        T = RP.tmd_params(RP.parse_crs(27700))
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        E, N = RP.tm_forward_np(np.array([lon]), np.array([lat]), T["lon0"],
                                T["k0"], T["fe"], T["fn_eff"], T["f"], T["a"])
        assert abs(E[0] - 651409.903) < 0.005
        assert abs(N[0] - 313177.270) < 0.005
        lo, la = RP.tm_inverse_np(E, N, T["lon0"], T["k0"], T["fe"],
                                  T["fn_eff"], T["f"], T["a"])
        assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9

    def test_bng_full_pipeline_roundtrip_and_shift(self):
        fns = RP.crs_funcs(RP.parse_crs(27700))
        lon = np.array([-0.12, -3.2, 1.3])
        lat = np.array([51.5, 55.95, 52.63])
        E, N = fns["fwd_np"](lon, lat)
        # Britain lands inside the BNG kilometer grid
        assert ((E > 0) & (E < 800000) & (N > 0) & (N < 1300000)).all()
        lo, la = fns["inv_np"](E, N)
        assert np.abs(lo - lon).max() < 1e-7
        assert np.abs(la - lat).max() < 1e-7

    def test_bng_wkt_and_proj4_agree_with_epsg(self):
        tok = RP.parse_crs(27700)
        assert tok.startswith("tmd:")
        p4 = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
              "+x_0=400000 +y_0=-100000 +ellps=airy "
              "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")
        assert RP.parse_crs(p4) == tok
        wkt = ('PROJCS["OSGB 1936 / British National Grid",'
               'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
               'SPHEROID["Airy 1830",6377563.396,299.3249646],'
               'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Transverse_Mercator"],'
               'PARAMETER["latitude_of_origin",49],'
               'PARAMETER["central_meridian",-2],'
               'PARAMETER["scale_factor",0.9996012717],'
               'PARAMETER["false_easting",400000],'
               'PARAMETER["false_northing",-100000],UNIT["metre",1]]')
        assert RP.parse_crs(wkt) == tok

    def test_generic_tmerc_wgs84_is_utm_when_matching(self):
        assert RP.parse_crs("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 "
                            "+x_0=500000 +y_0=0 +ellps=WGS84") == "utm:33n"
        # non-UTM parameters -> tmd on WGS84 (datum shift is identity)
        tok = RP.parse_crs("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 "
                           "+x_0=3500000 +y_0=0 +ellps=WGS84")
        assert tok.startswith("tmd:6378137.0:")
        fns = RP.crs_funcs(tok)
        E, N = fns["fwd_np"](np.array([9.0]), np.array([0.0]))
        assert abs(E[0] - 3500000.0) < 1e-6 and abs(N[0]) < 1e-6


def test_proj4_datum_names_and_mercator_1sp_refusal():
    """Code-review regressions: '+datum=NAD27' must apply the Helmert
    shift (never silently resolve to wgs84), and WKT Mercator_1SP (the
    ELLIPSOIDAL Mercator) must refuse rather than silently use the
    spherical pseudo-Mercator kernel."""
    t = RP.parse_crs("+proj=longlat +datum=NAD27")
    assert t.startswith("geog:6378206.4:")
    assert RP.parse_crs("+proj=longlat +datum=WGS84") == "wgs84"
    with pytest.raises(NotImplementedError, match=r"\+datum"):
        RP.parse_crs("+proj=longlat +datum=potsdam")
    wkt = ('PROJCS["World Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_1SP"],'
           'PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],'
           'UNIT["metre",1]]')
    # the EPSG:3395 form IS supported (true ellipsoidal Mercator) —
    # but a scaled/offset 1SP variant must refuse, never silently
    # degrade to either the spherical or the k0=1 kernel
    assert RP.parse_crs(wkt) == "merc3395"
    scaled = wkt.replace('PARAMETER["scale_factor",1]',
                         'PARAMETER["scale_factor",0.994]')
    with pytest.raises(NotImplementedError, match="Mercator_1SP"):
        RP.parse_crs(scaled)


def test_dispatcher_routes_new_targets_and_never_falls_through(spark):
    """reproject() must route merc3395/datum/tmd targets through the
    composed warp — never silently fall through to the CEA kernel —
    and unknown tokens refuse."""
    h, w = 12, 18
    full = ((np.arange(h)[:, None] * 7919 + np.arange(w)[None, :]
             * 104729) % 1997).astype(np.int64)
    px = spark.createDataFrame(
        [(r, c, int(full[r, c])) for r in range(h) for c in range(w)],
        "row long, col long, value long")
    org, cell = (-100.0, 40.0), (0.05, -0.05)
    for dst in (3395, 4267, 27700):
        got = (RP.reproject(px, 4326, dst, org, cell, (h, w), (8, 12),
                            bbox_lonlat=(-100.0, 39.4, -99.1, 40.0))
               .toPandas().sort_values(["trow", "tcol"]))
        exp = RP.reproject_any_numpy_oracle(
            full, -1, 4326, dst, org, cell, (8, 12),
            bbox_lonlat=(-100.0, 39.4, -99.1, 40.0))
        np.testing.assert_array_equal(
            got.value.fillna(-1).to_numpy().reshape(8, 12), exp)
    # since r5 the full mode dict reaches every family — an UNKNOWN
    # mode must still refuse rather than silently warp with nearest
    with pytest.raises(NotImplementedError):
        RP.reproject(px, 4326, 3395, org, cell, (h, w), (8, 12),
                     resampling="nope")


def test_mode_matrix_any_crs(spark):
    """r5 matrix completion: the FULL GDAL mode dict reaches EVERY CRS
    family through reproject_any's composed warp (reference
    georasters.py:592-606 warps any mode to any target). Full mode
    sweep on a UTM target; one kernel + one aggregate on each other
    family, each checked cell-for-cell vs the independent numpy
    oracles.

    Codegen is disabled for THIS test only: the 15 composed-warp
    plans each janino-compile ~100KB of staged series math (~50 s
    and real heap per compile — 13 min total, and enough JIT/deopt
    pressure to OOM a late-suite shared JVM), while the VALUES being
    checked are identical interpreted. The production codegen path
    stays exercised by the driver gates (reproject_utm_cubic,
    reproject_lcc_lanczos, reproject_any_average) and the per-family
    pytest checks."""
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")}
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try:
        _run_mode_matrix(spark)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _run_mode_matrix(spark):
    h, w = 20, 30
    full = ((np.arange(h)[:, None] * 7919 + np.arange(w)[None, :]
             * 104729) % 997).astype(np.float64)
    full[3, 4] = -1.0  # a nodata hole inside the kernel's reach
    px = spark.createDataFrame(
        [(r, c, float(full[r, c])) for r in range(h) for c in range(w)
         if full[r, c] != -1.0],
        "row long, col long, value double")
    org, cell = (2.0, 54.0), (0.2, -0.2)  # lon 2..8, lat 50..54 (zone 31)
    bbox = (2.0, 50.0, 8.0, 54.0)
    out = (16, 24)

    def check(dst, mode):
        got = RP.reproject(px, 4326, dst, org, cell, (h, w), out,
                           resampling=mode, bbox_lonlat=bbox).toPandas()
        if mode in ("cubic", "cubicspline", "lanczos"):
            kern = {"cubic": "catmull", "cubicspline": "bspline",
                    "lanczos": "lanczos"}[mode]
            exp, _ = RP.reproject_any_kernel_numpy_oracle(
                full, -1.0, 4326, dst, org, cell, out, kern, bbox_lonlat=bbox)
        else:
            how = {"average": "mean"}.get(mode, mode)
            exp, _ = RP.reproject_any_average_numpy_oracle(
                full, -1.0, 4326, dst, org, cell, out, how, bbox_lonlat=bbox)
        grid = np.full(out, np.nan)
        vals = got.dropna(subset=["value"])
        grid[vals.trow.to_numpy(dtype=np.int64),
             vals.tcol.to_numpy(dtype=np.int64)] = vals.value.to_numpy()
        both = ~(np.isnan(grid) & np.isnan(exp))
        np.testing.assert_allclose(grid[both], exp[both], rtol=1e-6,
                                   atol=1e-6, err_msg=f"{dst}/{mode}")
        assert np.isfinite(grid).sum() > 0.3 * grid.size, (dst, mode)

    # kernel + aggregate sweep on the cheapest family (WebMercator:
    # small closed-form expressions, so the sweep stays fast);
    # sum/min/max/count share the exact bucket plan with average/mode
    # and are covered on CEA by test_reproject_dispatcher_and_agg_modes
    for mode in ("cubic", "cubicspline", "lanczos", "average", "mode"):
        check(3857, mode)
    # kernel + aggregate coverage across every remaining family (the
    # verdict's named gap: conic/UTM/datum targets refused these)
    check(32631, "cubic")       # UTM × Catmull-Rom
    check(32631, "average")     # UTM × forward-bucket
    check("EPSG:2154", "lanczos")  # LCC × windowed sinc
    check("EPSG:2154", "mode")
    check(5070, "cubicspline")  # Albers × B-spline
    check(5070, "sum")
    check("+proj=sinu", "cubic")
    check(3395, "average")      # ellipsoidal Mercator
    check(4267, "cubic")        # datum'd geographic (NAD27)
    check(27700, "average")     # TM-on-datum (OSGB)


def test_any_bounds_webmerc_pole_clip_and_nonfinite_raise():
    # a pole-reaching source must give the clipped Mercator square, not
    # arctanh(1)=inf bounds; and the extent must match the specialized
    # webmerc plan's ±85.05112878 convention (mode-invariant lattice)
    X0, Y0, X1, Y1 = RP.any_bounds(
        "EPSG:4326", "EPSG:3857", (-180.0, 90.0), (1.0, -1.0), (180, 360))
    import math as _m
    assert all(_m.isfinite(v) for v in (X0, Y0, X1, Y1))
    R = 6378137.0
    exp = R * _m.log(_m.tan(_m.pi / 4 + _m.radians(85.05112878) / 2))
    assert abs(Y1 - exp) < 1e-6 and abs(Y0 + exp) < 1e-6
    # ellipsoidal Mercator (EPSG:3395) has no pole clip: a source
    # reaching lat 90° must raise loudly, not warp an all-NULL grid
    with pytest.raises(ValueError, match="non-finite"):
        RP.any_bounds("EPSG:4326", "EPSG:3395", (-180.0, 90.0),
                      (1.0, -1.0), (180, 360))


def test_spline_prefilter_interpolation_property():
    # after the prefilter, B-spline basis evaluation at integer points
    # must reproduce the samples: (c[i-1] + 4c[i] + c[i+1])/6 == a[i]
    rng = np.random.default_rng(7)
    a = rng.uniform(-100, 100, 17)
    c = RP.spline_filter1d_mirror(a)
    ext = np.concatenate([[c[1]], c, [c[-2]]])  # mirror ends
    rec = (ext[:-2] + 4 * ext[1:-1] + ext[2:]) / 6
    assert np.abs(rec - a).max() < 1e-12
    m = RP.spline_filter_matrix(17)
    assert np.abs(m @ a - c).max() < 1e-12
    # n=1 and n=2 degenerate lines
    assert RP.spline_filter1d_mirror(np.array([5.0]))[0] == 5.0
    c2 = RP.spline_filter1d_mirror(np.array([2.0, 8.0]))
    assert np.abs((np.array([c2[1], c2[0]]) + 4 * c2 +
                   np.array([c2[1], c2[0]])) / 6 - [2.0, 8.0]).max() < 1e-12


def _b3(t):
    t = abs(t)
    if t < 1:
        return (4.0 - 6.0 * t * t + 3.0 * t * t * t) / 6.0
    if t < 2:
        return (2.0 - t) ** 3 / 6.0
    return 0.0


def test_resize_cubic_spline_vs_numpy_oracle(spark):
    # hand-rolled oracle: per-line recursion, then B3 evaluation with
    # mirror indexing at the skimage coordinate map
    rng = np.random.default_rng(3)
    h, w, th, tw = 9, 13, 14, 20
    img = rng.uniform(-50, 50, (h, w)).round(3)
    coef = np.apply_along_axis(RP.spline_filter1d_mirror, 1, img)
    coef = np.apply_along_axis(RP.spline_filter1d_mirror, 0, coef)

    def mirror(i, n):
        p = 2 * n - 2
        m = i % p
        return m if m < n else p - m

    exp = np.zeros((th, tw))
    for tr in range(th):
        for tc in range(tw):
            u = round((tr + 0.5) * h / th - 0.5, RP._Q)
            v = round((tc + 0.5) * w / tw - 0.5, RP._Q)
            r0, c0 = int(np.floor(u)), int(np.floor(v))
            du, dv = u - r0, v - c0
            s = 0.0
            for a in (-1, 0, 1, 2):
                for b in (-1, 0, 1, 2):
                    s += (_b3(a - du) * _b3(b - dv)
                          * coef[mirror(r0 + a, h), mirror(c0 + b, w)])
            exp[tr, tc] = s

    rows = [(int(r), int(c), float(img[r, c]))
            for r in range(h) for c in range(w)]
    px = spark.createDataFrame(rows, "row long, col long, value double")
    out = RP.resize_grid(px, (h, w), (th, tw), order=3).collect()
    assert len(out) == th * tw
    for r in out:
        assert r["n_contrib"] == 16
        assert abs(r["value"] - exp[r["trow"], r["tcol"]]) < 1e-5


def test_spline_prefilter_requires_dense(spark):
    rows = [(r, c, 1.0) for r in range(4) for c in range(5) if (r, c) != (2, 3)]
    px = spark.createDataFrame(rows, "row long, col long, value double")
    with pytest.raises(Exception, match="non-dense"):
        RP.spline_prefilter_px(px, (4, 5)).collect()


def test_gather_from_tiles_matches_pixel_join(spark, images_t1):
    # the tile-cogrouped gather must be VALUE-IDENTICAL to the pixel
    # left-join gather (same quantized row/col exprs, same NULL rule),
    # including int-vs-long cogroup key hashing (a silent empty-group
    # failure mode pinned here)
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(90, 180))
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    a = {(r["trow"], r["tcol"]): (r["value"], round(r["xm"], 6))
         for r in RP.wgs84_to_cea_grid(px, **kw).collect()}
    b = {(r["trow"], r["tcol"]): (r["value"], round(r["xm"], 6))
         for r in RP.wgs84_to_cea_grid(None, images=images_t1, **kw).collect()}
    assert a == b
    assert sum(1 for v, _ in a.values() if v is not None) > 5000


@pytest.mark.parametrize("mode", ["cubic", "lanczos"])
def test_kernel_tiles_matches_pixel_join(spark, images_t1, mode):
    # cubic/lanczos tile-cogrouped gathers: corners shared with the
    # join plan (_kernel_corners), signed-weight-mass NULL guard
    # reproduced over valid corners only
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(60, 120))
    fn = (RP.wgs84_to_cea_grid_cubic if mode == "cubic"
          else RP.wgs84_to_cea_grid_lanczos)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    a = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in fn(px, **kw).collect()}
    b = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in fn(None, images=images_t1, **kw).collect()}
    assert set(a) == set(b)
    for key, (va, na) in a.items():
        vb, nb = b[key]
        assert na == nb, key
        if va is None:
            assert vb is None, key
        else:
            assert vb == pytest.approx(va, abs=2e-6), key
    assert sum(1 for v, _ in a.values() if v is not None) > 3000


@pytest.mark.parametrize("mode", ["cubic", "lanczos"])
def test_kernel_tiles_matches_pixel_join_upsampling(spark, images_t1, mode):
    """UPSAMPLING shape for the fused cubic/lanczos tile plan: targets
    near the grid's top/left edge have negative corner indices and key
    to superblock -1; the edge tiles must reach those tasks as halo
    (the bilinear upsampling review finding, applied to the r7 fused
    kernel plan)."""
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(540, 1080))
    fn = (RP.wgs84_to_cea_grid_cubic if mode == "cubic"
          else RP.wgs84_to_cea_grid_lanczos)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    a = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in fn(px, **kw).collect()}
    b = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in fn(None, images=images_t1, **kw).collect()}
    assert set(a) == set(b)
    mismatched = [k for k in a
                  if a[k][1] != b[k][1]
                  or (a[k][0] is None) != (b[k][0] is None)
                  or (a[k][0] is not None and b[k][0] is not None
                      and abs(a[k][0] - b[k][0]) > 2e-6)]
    assert not mismatched, mismatched[:10]
    edge_valid = sum(1 for (tr, tc), (v, _) in a.items()
                     if (tr == 0 or tc == 0) and v is not None)
    assert edge_valid > 100


def test_bilinear_tiles_matches_pixel_join_upsampling(spark, images_t1):
    """UPSAMPLING shape: targets at the grid's top/left edge have
    negative top-left corner indices (r0/c0 = -1) and key to superblock
    -1 — the row-0/col-0 tiles must still reach those tasks as halo so
    the in-range corners renormalize exactly like the pixel plan
    (r7 review regression: a >=0 key filter NULLed those targets)."""
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(540, 1080))
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    a = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in RP.wgs84_to_cea_grid_bilinear(px, **kw).collect()}
    b = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in RP.wgs84_to_cea_grid_bilinear(
             None, images=images_t1, **kw).collect()}
    assert set(a) == set(b)
    mismatched = [k for k in a
                  if a[k][1] != b[k][1]
                  or (a[k][0] is None) != (b[k][0] is None)
                  or (a[k][0] is not None and b[k][0] is not None
                      and abs(a[k][0] - b[k][0]) > 2e-6)]
    assert not mismatched, mismatched[:10]
    # the edge rows exist and are non-NULL where the pixel plan says so
    edge_valid = sum(1 for (tr, tc), (v, _) in a.items()
                     if (tr == 0 or tc == 0) and v is not None)
    assert edge_valid > 100


def test_bilinear_tiles_matches_pixel_join(spark, images_t1):
    # tile-cogrouped bilinear: same _bilinear_corners exprs, NULL
    # corners excluded from both the weighted sum and the weight mass
    # — must reproduce the inner-join renormalization (value to 6 dp,
    # n_contrib exactly, NULL where no corner is valid)
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(90, 180))
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    a = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in RP.wgs84_to_cea_grid_bilinear(px, **kw).collect()}
    b = {(r["trow"], r["tcol"]): (r["value"], r["n_contrib"])
         for r in RP.wgs84_to_cea_grid_bilinear(
             None, images=images_t1, **kw).collect()}
    assert set(a) == set(b)
    for key, (va, na) in a.items():
        vb, nb = b[key]
        assert na == nb, key
        if va is None:
            assert vb is None, key
        else:
            assert vb == pytest.approx(va, abs=2e-6), key
    assert sum(1 for v, _ in a.values() if v is not None) > 5000


def test_kernel_tiles_rejects_kernel_wider_than_tile(spark, images_t1):
    """The fused plan's ±1-block halo replication cannot feed a kernel
    whose half-width reaches past one tile — must refuse loudly, not
    drop contributions."""
    spec = synth.T1
    with pytest.raises(ValueError, match="half-width"):
        RP.wgs84_to_cea_grid_lanczos(
            None, (spec.x0, spec.y0), (spec.cellx, spec.celly),
            (spec.height, spec.width), (30, 60), a=70, images=images_t1)


def test_gather_from_tiles_rejects_duplicate_tile_keys(spark, images_t1):
    """A unioned/mosaic images table with two rows for the same
    (tile_row, tile_col) must raise, not decode an arbitrary one."""
    spec = synth.T1
    kw = dict(src_origin=(spec.x0, spec.y0),
              src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=(30, 60))
    doubled = images_t1.unionByName(images_t1.limit(1))
    with pytest.raises(Exception, match="image rows share tile"):
        RP.wgs84_to_cea_grid(None, images=doubled, **kw).collect()


def test_reproject_quartile_aggregates_vs_numpy(spark, images_t1):
    """rms/med/q1/q3 (the rest of the gdalwarp -r enum) agree with
    numpy per-bucket recomputation on sampled target cells."""
    spec = synth.T1
    out_shape = (45, 90)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    kw = dict(src_origin=(spec.x0, spec.y0), src_cellsize=(spec.cellx, spec.celly),
              src_shape=(spec.height, spec.width), out_shape=out_shape)
    full = synth.stitched_array(spec).astype(np.float64)
    h, w = full.shape
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    valid = full != spec.ndv
    X0, Y1, X1, Y0 = RP.cea_bounds(spec.x0, spec.y0 + h * spec.celly,
                                   spec.x0 + w * spec.cellx, spec.y0)
    tcx, tcy = (X1 - X0) / out_shape[1], (Y1 - Y0) / out_shape[0]
    X = (RP.R * 1.0) * np.radians(spec.x0 + (cc + 0.5) * spec.cellx)
    Y = (RP.R / 1.0) * np.sin(np.radians(spec.y0 + (rr + 0.5) * spec.celly))
    trow = np.floor(np.round((Y - Y0) / tcy, 4)).astype(np.int64)
    tcol = np.floor(np.round((X - X0) / tcx, 4)).astype(np.int64)

    ref = {
        "rms": lambda v: np.sqrt((v * v).sum() / v.size),
        "med": lambda v: np.percentile(v, 50, method="linear"),
        "q1": lambda v: np.percentile(v, 25, method="linear"),
        "q3": lambda v: np.percentile(v, 75, method="linear"),
    }
    for mode, fn in ref.items():
        got = RP.reproject(px, 4326, 6933, resampling=mode, **kw).toPandas()
        assert len(got) > 0
        sample = got.sample(n=8, random_state=1)
        for t in sample.itertuples(index=False):
            v = full[valid & (trow == t.trow) & (tcol == t.tcol)]
            assert v.size == t.n_contrib
            assert abs(t.value - round(float(fn(v)), 6)) < 1e-9, mode


def test_warp_cutline_matches_pip_filter(spark, images_t1):
    """warp_cutline == full warp + numpy even-odd filter on the target
    centers' inverse lon/lat; the donut hole stays excluded."""
    import math

    import numpy as np

    from georasters_spark.functions import geometry as geom
    from georasters_spark.operators import reproject as RP
    from georasters_spark.sources import synth

    spec = synth.T1
    zones = [synth.ZONES_T1[0], synth.ZONES_EXTRA[1]]  # rect + donut
    got = RP.warp_cutline(
        None, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), (90, 180), zones,
        images=images_t1).collect()
    full = RP.wgs84_to_cea_grid(
        None, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), (90, 180), images=images_t1).collect()
    exp = set()
    for r in full:
        lon = r["xm"] / RP.R * 180.0 / math.pi
        lat = math.asin(r["ym"] / RP.R) * 180.0 / math.pi
        for z in zones:
            rings = [np.asarray(ring, dtype=np.float64) for ring in z.rings]
            if geom.points_in_rings(np.array([lon]), np.array([lat]),
                                    rings)[0]:
                exp.add((r["trow"], r["tcol"], z.zone_id))
    assert {(r["trow"], r["tcol"], r["zone_id"]) for r in got} == exp
    # the donut hole region (inside outer, inside hole) is excluded:
    # a center near (55, -50) falls in the hole
    hole_rows = [r for r in got if r["zone_id"] == 5
                 and 45.2 < r["xm"] / RP.R * 180.0 / math.pi < 65.8
                 and -60.3 < math.asin(r["ym"] / RP.R) * 180.0 / math.pi < -40.7]
    assert not hole_rows
