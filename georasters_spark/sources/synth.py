"""Deterministic synthetic fixtures: the images+caption tile table, zone
polygons, and query points (FIXTURES.md §1-3).

Everything is generated from pure *integer* formulas of (row, col, seed)
so that a DuckDB oracle can recompute any pixel-level result via
``range()`` cross joins while the Spark side exercises the real binary
codec + decode path. That makes every raster operator oracle-checkable
end-to-end (driver CORRECTNESS gate) without external data.

Field design ("pre1500-like": int16 values >= 0, ~25% nodata blobs —
reference anchor tests/test_georasters.py:21-27):

    value(row, col)  = (row*7919 + col*104729 + seed) % 1997
    masked(row, col) = ((row*31 + col*17 + seed*7) % 97) < 24

The table is produced *distributed* (spark.range over tiles →
mapInPandas encoding) — at 10^12-image scale generation itself must be
a Spark job, never a driver-side loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..functions import cells
from . import codec

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, tile_row int, tile_col int, "
    "xmin double, ymax double, cellx double, celly double, "
    "crs string, ndv double, dtype string, cell_id long"
)


@dataclass(frozen=True)
class GridSpec:
    """One logical raster grid, cut into tile_size x tile_size tiles."""

    grid_id: str = "g42"
    width: int = 540  # pixels (t1 smoke tier, FIXTURES.md §5)
    height: int = 270
    seed: int = 42
    tile: int = 64
    x0: float = -180.0
    y0: float = 90.0
    lon_span: float = 360.0
    lat_span: float = 180.0
    ndv: float = -9999.0
    crs: str = "EPSG:4326"
    dtype: str = "int16"
    cell_res: int = 3  # cell index resolution for tile keys

    @property
    def cellx(self) -> float:
        return self.lon_span / self.width

    @property
    def celly(self) -> float:
        return -self.lat_span / self.height

    @property
    def tiles_x(self) -> int:
        return math.ceil(self.width / self.tile)

    @property
    def tiles_y(self) -> int:
        return math.ceil(self.height / self.tile)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


T1 = GridSpec()  # 540x270, 45 tiles — pytest + driver correctness
T1B = GridSpec(grid_id="g43", seed=43)  # algebra partner grid
T2 = GridSpec(grid_id="t2", width=2160, height=1080, cell_res=5)
BENCH = GridSpec(grid_id="bench", width=4320, height=2160, cell_res=6)


# ---------------------------------------------------------------------------
# pure-numpy field formulas (shared by generator, oracles, and tests)
# ---------------------------------------------------------------------------

def field_value(row, col, seed: int) -> np.ndarray:
    r = np.asarray(row, dtype=np.int64)
    c = np.asarray(col, dtype=np.int64)
    return (r * 7919 + c * 104729 + seed) % 1997


def field_masked(row, col, seed: int) -> np.ndarray:
    r = np.asarray(row, dtype=np.int64)
    c = np.asarray(col, dtype=np.int64)
    return ((r * 31 + c * 17 + seed * 7) % 97) < 24


def tile_array(spec: GridSpec, tile_row: int, tile_col: int) -> np.ndarray:
    """The (tile, tile) int16 array for one tile; ndv where masked or
    outside the grid domain (edge tiles are ndv-padded)."""
    t = spec.tile
    rr = np.arange(tile_row * t, (tile_row + 1) * t, dtype=np.int64)[:, None]
    cc = np.arange(tile_col * t, (tile_col + 1) * t, dtype=np.int64)[None, :]
    v = field_value(rr, cc, spec.seed)
    bad = field_masked(rr, cc, spec.seed) | (rr >= spec.height) | (cc >= spec.width)
    return np.where(bad, int(spec.ndv), v).astype(np.int16)


def stitched_array(spec: GridSpec) -> np.ndarray:
    """Full (height, width) array — numpy oracle for pytest."""
    rr = np.arange(spec.height, dtype=np.int64)[:, None]
    cc = np.arange(spec.width, dtype=np.int64)[None, :]
    v = field_value(rr, cc, spec.seed)
    return np.where(field_masked(rr, cc, spec.seed), int(spec.ndv), v).astype(
        np.int16
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL emitters
# ---------------------------------------------------------------------------

def pixel_sql(spec: GridSpec, alias: str = "px", valid_only: bool = True) -> str:
    """CTE body: the pixel table (row, col, value, x, y, xc, yc) that the
    Spark decode path must reproduce. valid_only drops masked cells
    (mask ≅ NULL, georasters.py:329-333)."""
    where = f"WHERE NOT ((r.range*31 + c.range*17 + {spec.seed}*7) % 97 < 24)" if valid_only else ""
    return f"""{alias} AS (
  SELECT CAST(r.range AS BIGINT) AS row, CAST(c.range AS BIGINT) AS col,
         CAST((r.range*7919 + c.range*104729 + {spec.seed}) % 1997 AS BIGINT) AS value,
         ((r.range*31 + c.range*17 + {spec.seed}*7) % 97 < 24) AS masked,
         {spec.x0} + CAST(c.range AS DOUBLE) * {spec.cellx!r} AS x,
         {spec.y0} + CAST(r.range AS DOUBLE) * {spec.celly!r} AS y,
         {spec.x0} + (CAST(c.range AS DOUBLE) + 0.5) * {spec.cellx!r} AS xc,
         {spec.y0} + (CAST(r.range AS DOUBLE) + 0.5) * {spec.celly!r} AS yc
  FROM range({spec.height}) r CROSS JOIN range({spec.width}) c
  {where}
)"""


def tile_sql(spec: GridSpec, alias: str = "tiles") -> str:
    """CTE: one row per tile with id/position/center — oracle for
    tile-level operators (cell assignment, kNN over tiles)."""
    t = spec.tile
    # center formulas MUST match the Spark side association-for-association:
    # xmin = x0 + (tx*t)*cellx (Python build_images), center = xmin + (t*cellx)/2
    return f"""{alias} AS (
  SELECT printf('{spec.grid_id}_%04d_%04d', CAST(ty.range AS INT), CAST(tx.range AS INT)) AS image_id,
         CAST(ty.range AS BIGINT) AS tile_row, CAST(tx.range AS BIGINT) AS tile_col,
         ({spec.x0} + (tx.range * {t}) * {spec.cellx!r}) + ({t} * {spec.cellx!r}) / 2 AS center_x,
         ({spec.y0} + (ty.range * {t}) * {spec.celly!r}) + ({t} * {spec.celly!r}) / 2 AS center_y
  FROM range({spec.tiles_y}) ty CROSS JOIN range({spec.tiles_x}) tx
)"""


# ---------------------------------------------------------------------------
# distributed generator
# ---------------------------------------------------------------------------

def image_id_of(spec: GridSpec, tile_row: int, tile_col: int) -> str:
    return f"{spec.grid_id}_{tile_row:04d}_{tile_col:04d}"


def build_images(spark, spec: GridSpec, fmt: str = "raw16"):
    """Distributed images-table builder: spark.range(n_tiles) →
    mapInPandas numpy encode. One output row per tile."""
    import pandas as pd

    n_tx = spec.tiles_x
    t = spec.tile

    def gen(batches):
        for pdf in batches:
            rows = []
            for tid in pdf["id"].tolist():
                ty, tx = divmod(int(tid), n_tx)
                arr = tile_array(spec, ty, tx)
                valid = arr != int(spec.ndv)
                checksum = int(arr[valid].astype(np.int64).sum())
                enc = codec.encode_tile(arr, fmt, spec.ndv)
                # phash describes the STORED bytes: recompute from the
                # decoded payload so lossy formats carry their own hash
                dec = codec.decode_tile(enc, fmt, t, t, spec.ndv)
                xmin = spec.x0 + tx * t * spec.cellx
                ymax = spec.y0 + ty * t * spec.celly
                cid = int(
                    cells.cell_of(
                        xmin + t * spec.cellx / 2,
                        ymax + t * spec.celly / 2,
                        spec.cell_res,
                    )
                )
                rows.append(
                    {
                        "image_id": image_id_of(spec, ty, tx),
                        "bytes": enc,
                        "w": t,
                        "h": t,
                        "fmt": fmt,
                        "caption": f"{spec.grid_id} tile r{ty} c{tx} sum={checksum}",
                        "phash": codec.average_hash(np.asarray(dec), spec.ndv),
                        "tile_row": ty,
                        "tile_col": tx,
                        "xmin": xmin,
                        "ymax": ymax,
                        "cellx": spec.cellx,
                        "celly": spec.celly,
                        "crs": spec.crs,
                        "ndv": spec.ndv,
                        "dtype": spec.dtype,
                        "cell_id": cid,
                    }
                )
            yield pd.DataFrame(rows)

    base = spark.range(spec.n_tiles).repartition(
        max(1, min(spec.n_tiles, spark.sparkContext.defaultParallelism))
    )
    return base.mapInPandas(gen, schema=IMAGES_SCHEMA)


# ---------------------------------------------------------------------------
# zones (polygon fixtures) — convex ones carry an exact SQL oracle
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Zone:
    zone_id: int
    name: str
    # rings: outer ring first, optional holes after; each ring is a list
    # of (x, y); NOT closed (first point not repeated).
    rings: tuple = ()
    convex: bool = False

    @property
    def outer(self):
        return self.rings[0]


def _ccw(ring):
    area = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    return list(ring) if area > 0 else list(reversed(ring))


def make_zone(zone_id, name, outer, holes=(), convex=False) -> Zone:
    rings = tuple([tuple(_ccw(outer))] + [tuple(_ccw(h)) for h in holes])
    return Zone(zone_id, name, rings, convex)


# Vertices deliberately avoid rational pixel-center coordinates so the
# strict-inequality SQL half-plane oracle and the ray-casting kernel
# agree on every pixel center.
ZONES_T1 = [
    make_zone(1, "rect_atlantic", [(-60.37, -20.11), (19.93, -20.11),
                                   (19.93, 40.23), (-60.37, 40.23)], convex=True),
    make_zone(2, "tri_pacific", [(100.13, -50.21), (170.57, -45.03),
                                 (135.23, 20.57)], convex=True),
    make_zone(3, "pent_arctic", [(-170.11, 50.13), (-120.47, 45.29),
                                 (-110.03, 70.91), (-150.59, 85.07),
                                 (-175.31, 70.19)], convex=True),
]

# pytest-only zones: concave, with hole, continent-sized skew zone
ZONES_EXTRA = [
    make_zone(4, "concave_l", [(-150.2, -80.3), (-90.4, -80.3), (-90.4, -50.6),
                               (-120.1, -50.6), (-120.1, -30.2), (-150.2, -30.2)]),
    make_zone(5, "donut", [(30.3, -70.4), (80.7, -70.4), (80.7, -30.1), (30.3, -30.1)],
              holes=[[(45.2, -60.3), (65.8, -60.3), (65.8, -40.7), (45.2, -40.7)]]),
    make_zone(6, "skew_half_world", [(-179.9, -89.9), (179.9, -89.9),
                                     (179.9, 0.1), (-179.9, 0.1)], convex=True),
]


def zone_sql_predicate(zone: Zone, x_expr: str, y_expr: str) -> str:
    """Exact SQL point-in-polygon for a CONVEX zone: AND of strict
    half-plane tests over CCW edges."""
    assert zone.convex, "SQL oracle predicate only for convex zones"
    ring = zone.outer
    tests = []
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        tests.append(
            f"(({x2!r} - {x1!r}) * (({y_expr}) - {y1!r}) - "
            f"({y2!r} - {y1!r}) * (({x_expr}) - {x1!r})) > 0"
        )
    return "(" + " AND ".join(tests) + ")"


def zone_sql_predicate_evenodd(zone: Zone, x_expr: str, y_expr: str) -> str:
    """Exact SQL point-in-polygon by the even-odd (crossing-number)
    rule over ALL rings — the literal SQL mirror of
    ``functions/geometry.points_in_rings`` (same float literals, same
    multiply-then-divide pairing), so concave zones, holes and
    multipart outers are oracle-checkable, not just convex ones."""
    terms = []
    for ring in zone.rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if y1 == y2:  # horizontal edges never cross (geometry.py:37)
                continue
            terms.append(
                f"CASE WHEN (({y1!r} > ({y_expr})) != ({y2!r} > ({y_expr})))"
                f" AND (({x_expr}) < ({x2!r} - {x1!r}) * (({y_expr}) - {y1!r})"
                f" / ({y2!r} - {y1!r}) + {x1!r}) THEN 1 ELSE 0 END")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def zones_df(spark, zones=None):
    """Zones as a (small, broadcastable) DataFrame with array-ring geometry."""
    zones = zones if zones is not None else ZONES_T1
    rows = [
        (
            z.zone_id,
            z.name,
            [[[float(x), float(y)] for (x, y) in ring] for ring in z.rings],
        )
        for z in zones
    ]
    return spark.createDataFrame(
        rows, "zone_id long, name string, geometry array<array<array<double>>>"
    )


# ---------------------------------------------------------------------------
# points (map_pixel / kNN / distance query fixtures) — SQL-expressible
# ---------------------------------------------------------------------------

def points_sql(n: int = 100, alias: str = "pts") -> str:
    return f"""{alias} AS (
  SELECT CAST(i.range AS BIGINT) AS point_id,
         -180.0 + CAST((i.range * 7351) % 3600 AS DOUBLE) / 10.0 AS x,
         90.0 - CAST((i.range * 4099) % 1800 AS DOUBLE) / 10.0 AS y
  FROM range({n}) i
)"""


def points_df(spark, n: int = 100):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("point_id"),
        (F.lit(-180.0) + ((F.col("id") * 7351) % 3600).cast("double") / 10.0).alias("x"),
        (F.lit(90.0) - ((F.col("id") * 4099) % 1800).cast("double") / 10.0).alias("y"),
    )
