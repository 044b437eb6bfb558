"""Hierarchical spatial cell index (the H3/S2 role in the north rule).

From-scratch numpy implementation — no h3/s2 libs in-sandbox, and the
north rule demands a from-scratch index anyway. Design: a Z-order
(Morton) quadtree over the WGS84 lon/lat rectangle:

  * resolution r in [0, 29]: 2^r x 2^r grid over lon [-180,180),
    lat [90,-90) (row 0 = north, matching raster row order).
  * ix = floor((lon+180)/360 * 2^r),  iy = floor((90-lat)/180 * 2^r),
    both clamped to [0, 2^r - 1].
  * cell_id = (r << 58) | interleave_bits(ix, iy)
    (ix on even bits, iy on odd bits; sign bit always clear)

Properties used by the engine:
  * hierarchical: parent(cell) = ((r-1) << 58) | (morton >> 2) — zone
    pruning and coarse partitioning.
  * k-ring: neighbors are (ix+dx, iy+dy) re-encoded — ring-expansion kNN.
  * Z-order locality: sorting tiles by cell_id clusters them spatially —
    Iceberg-style file clustering so bbox queries prune files.

All functions are vectorized numpy (called from Arrow pandas UDFs —
no per-row Python). An equivalent unrolled-SQL expression generator
(`morton_sql`) lets DuckDB oracles recompute cell ids bit-for-bit.
"""

from __future__ import annotations

import numpy as np

# Morton code occupies bits [0, 58); the resolution occupies bits
# [58, 63). Keeping the sign bit clear means ids stay positive int64 /
# SQL BIGINT for every res <= 29 (29 << 58 + 2^58 < 2^63).
RES_SHIFT = 58
MAX_RES = 29


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 30 bits of x so they occupy even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0x3FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x3FFFFFFF)
    return x


def lonlat_to_ixiy(lon, lat, res: int):
    n = 1 << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((90.0 - lat) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix, iy


def encode(ix, iy, res: int) -> np.ndarray:
    """(ix, iy, res) -> int64 cell id."""
    m = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    cid = (np.uint64(res) << np.uint64(RES_SHIFT)) | m
    return cid.view(np.int64) if isinstance(cid, np.ndarray) else np.int64(cid)


def cell_of(lon, lat, res: int) -> np.ndarray:
    ix, iy = lonlat_to_ixiy(lon, lat, res)
    return encode(ix, iy, res)


def decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell id -> (ix, iy, res)."""
    c = np.asarray(cell).view(np.uint64) if isinstance(cell, np.ndarray) else np.uint64(
        np.int64(cell)
    )
    res = (c >> np.uint64(RES_SHIFT)).astype(np.int64) if isinstance(
        c, np.ndarray
    ) else np.int64(c >> np.uint64(RES_SHIFT))
    m = c & np.uint64((1 << RES_SHIFT) - 1)
    ix = _compact1by1(m).astype(np.int64)
    iy = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def parent(cell, steps: int = 1):
    ix, iy, res = decode(cell)
    new_res = res - steps
    return encode(ix >> steps, iy >> steps, int(np.max(new_res)))


def kring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 block),
    clamped at the index boundary. Returns unique int64 ids."""
    ix, iy, res = decode(int(cell))
    n = 1 << int(res)
    dx = np.arange(-k, k + 1)
    gx, gy = np.meshgrid(ix + dx, iy + dx)
    ok = (gx >= 0) & (gx < n) & (gy >= 0) & (gy < n)
    return np.unique(encode(gx[ok], gy[ok], int(res)))


def ring(cell: int, k: int) -> np.ndarray:
    """Exactly the hollow ring at Chebyshev distance k."""
    if k == 0:
        return np.asarray([int(cell)], dtype=np.int64)
    inner = set(kring(cell, k - 1).tolist())
    return np.asarray(
        sorted(set(kring(cell, k).tolist()) - inner), dtype=np.int64
    )


def cell_bounds(cell) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a cell."""
    ix, iy, res = decode(int(cell))
    n = 1 << int(res)
    w = 360.0 / n
    h = 180.0 / n
    lon0 = -180.0 + int(ix) * w
    lat1 = 90.0 - int(iy) * h
    return lon0, lat1 - h, lon0 + w, lat1


def morton_sql(ix_expr: str, iy_expr: str, res: int, dialect: str = "duckdb") -> str:
    """Unrolled SQL expression equal to encode(ix, iy, res).

    Emitted for both engines so the DuckDB oracle and the Spark plan
    compute cell ids bit-for-bit identically (dialect: integer division
    is ``//`` in DuckDB, ``DIV`` in Spark SQL).
    """
    idiv = "//" if dialect == "duckdb" else " DIV "
    terms = [f"CAST({res} AS BIGINT) * {1 << RES_SHIFT}"]
    for b in range(res):
        terms.append(f"((({ix_expr}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({iy_expr}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"
