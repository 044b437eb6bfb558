"""Affine grid math as Spark Column expressions (the map_pixel family).

Reference semantics (cited against /root/reference/georasters/georasters.py):
  * map_pixel  (x,y) -> (row,col): HALF_EVEN rounding of
    (x-xmin)/cellx via np.round, or floor mode (georasters.py:101-126).
    Spark's F.bround is also HALF_EVEN, so the mapping is exact;
    plain F.round (HALF_UP) would be wrong — see tests.
  * map_pixel_inv (row,col) -> (x,y): x = xmin + col*cellx,
    y = ymax + row*celly (georasters.py:128-150) — cell-corner convention.
  * extent/extract subsetting = range predicates (georasters.py:1016-1044).

Everything here is a pure Column expression — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def col_of_x(x, xmin, cellx, floor: bool = False) -> Column:
    """x -> col. HALF_EVEN (np.round) by default, floor mode optional."""
    e = (_c(x) - _c(xmin)) / _c(cellx)
    return (F.floor(e) if floor else F.bround(e, 0)).cast("long")


def row_of_y(y, ymax, celly, floor: bool = False) -> Column:
    """y -> row; celly is negative for north-up rasters."""
    e = (_c(y) - _c(ymax)) / _c(celly)
    return (F.floor(e) if floor else F.bround(e, 0)).cast("long")


def x_of_col(col, xmin, cellx) -> Column:
    return _c(xmin) + _c(col) * _c(cellx)


def y_of_row(row, ymax, celly) -> Column:
    return _c(ymax) + _c(row) * _c(celly)


def x_center_of_col(col, xmin, cellx) -> Column:
    return _c(xmin) + (_c(col) + F.lit(0.5)) * _c(cellx)


def y_center_of_row(row, ymax, celly) -> Column:
    return _c(ymax) + (_c(row) + F.lit(0.5)) * _c(celly)


def extent_predicate(xcol, ycol, xmin, ymin, xmax, ymax) -> Column:
    """bbox subset (georasters.py:1032-1044): half-open on the east/south
    edge so adjacent extents tile without overlap."""
    return (
        (_c(xcol) >= _c(xmin))
        & (_c(xcol) < _c(xmax))
        & (_c(ycol) > _c(ymin))
        & (_c(ycol) <= _c(ymax))
    )


def extract_predicate(rowcol, colcol, row0, col0, dr, dc) -> Column:
    """Window of cells within (dr, dc) of a center cell
    (georasters.py:1016-1030); border clamping is implicit because
    out-of-range rows/cols simply don't exist in the pixel table."""
    return (F.abs(_c(rowcol) - _c(row0)) <= _c(dr)) & (
        F.abs(_c(colcol) - _c(col0)) <= _c(dc)
    )


def assert_same_grid(meta_a: dict, meta_b: dict) -> None:
    """Binary-op precondition: exactly equal geot + CRS, else raise —
    mirrors RasterGeoTWarning (georasters.py:431-434, :1502-1504)."""
    for k in ("xmin", "ymax", "cellx", "celly", "crs"):
        if meta_a.get(k) != meta_b.get(k):
            raise ValueError(
                f"grid mismatch on {k!r}: {meta_a.get(k)} != {meta_b.get(k)}"
            )
