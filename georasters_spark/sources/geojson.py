"""GeoJSON vector source + sink (RFC 7946), pure stdlib json.

The reference's vector I/O is geopandas: ``gp.read_file(...)`` feeds
zones into clip/stats (reference scripts/spatial_script.py:38-49) and
``to_geopandas().to_file(driver='GeoJSON')`` is the standard polygon
sink next to the shapefile driver (georasters.py:1717-1738 +
geopandas). This module re-realizes both drivers from scratch, the
GeoJSON twin of sources/shapefile.py:

  reader: FeatureCollection / Feature / bare geometry; Polygon and
          MultiPolygon; closed rings validated and opened; properties
          carried as attribute rows — the same ``(zones, attrs)``
          shape ``zones_from_shp`` returns, so GeoJSON zones flow
          straight into the fused even-odd-PIP zonal plan.
  writer: WKT-polygon DataFrame (the ``polygonize_geoms`` shape) →
          FeatureCollection text with RFC 7946 ring orientation
          (outer CCW, holes CW) and closed rings.

Coordinates are [lon, lat] per the RFC (x, y — matching the engine's
(xc, yc) order). Failure modes raise ValueError("geojson: ...").
"""

from __future__ import annotations

import json


def _open_ring(coords, what: str):
    """Validate one GeoJSON linear ring: >= 4 positions, closed
    (first == last, RFC 7946 §3.1.6); return the OPEN ring as
    ((x, y), ...)."""
    if not isinstance(coords, list) or len(coords) < 4:
        raise ValueError(f"geojson: {what}: ring needs >= 4 positions")
    pts = []
    for p in coords:
        if (not isinstance(p, (list, tuple)) or len(p) < 2
                or not all(isinstance(v, (int, float)) for v in p[:2])):
            raise ValueError(f"geojson: {what}: bad position {p!r}")
        pts.append((float(p[0]), float(p[1])))
    if pts[0] != pts[-1]:
        raise ValueError(f"geojson: {what}: ring not closed")
    return tuple(pts[:-1])


def _geometry_rings(geom: dict, what: str):
    """Polygon/MultiPolygon geometry dict → flat tuple of OPEN rings
    (outer + holes together — even-odd PIP needs no reclassification,
    the same flattening ``zones_from_shp`` applies to multi-part
    records)."""
    if not isinstance(geom, dict):
        raise ValueError(f"geojson: {what}: geometry is not an object")
    gtype = geom.get("type")
    coords = geom.get("coordinates")
    if gtype == "Polygon":
        polys = [coords]
    elif gtype == "MultiPolygon":
        polys = coords
    else:
        raise ValueError(
            f"geojson: {what}: geometry type {gtype!r} (zones need "
            "Polygon or MultiPolygon)")
    if not isinstance(polys, list) or not polys:
        raise ValueError(f"geojson: {what}: empty coordinates")
    rings = []
    for poly in polys:
        if not isinstance(poly, list) or not poly:
            raise ValueError(f"geojson: {what}: empty polygon")
        for ring in poly:
            rings.append(_open_ring(ring, what))
    return tuple(rings)


def parse_geojson(text):
    """Parse GeoJSON text (or an already-loaded dict) into records
    ``[{"rings": ((...),), "properties": {...}}, ...]``. Accepts a
    FeatureCollection, a single Feature, or a bare Polygon /
    MultiPolygon geometry."""
    obj = json.loads(text) if isinstance(text, (str, bytes)) else text
    if not isinstance(obj, dict):
        raise ValueError("geojson: top level is not an object")
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj.get("features")
        if not isinstance(feats, list):
            raise ValueError("geojson: FeatureCollection without features")
    elif t == "Feature":
        feats = [obj]
    elif t in ("Polygon", "MultiPolygon"):
        feats = [{"type": "Feature", "geometry": obj, "properties": {}}]
    else:
        raise ValueError(f"geojson: unsupported top-level type {t!r}")
    recs = []
    for i, f in enumerate(feats):
        what = f"feature {i}"
        if not isinstance(f, dict) or f.get("type") != "Feature":
            raise ValueError(f"geojson: {what}: not a Feature")
        geom = f.get("geometry")
        if geom is None:
            continue  # null geometry: attribute row dropped with it
        props = f.get("properties") or {}
        if not isinstance(props, dict):
            raise ValueError(f"geojson: {what}: properties not an object")
        recs.append({"rings": _geometry_rings(geom, what),
                     "properties": props})
    return recs


def zones_from_geojson(text, name_field: str = "name",
                       id_field: str | None = None):
    """GeoJSON text → ``(zones, attrs)`` in the engine's zone shape
    (``synth.Zone``: open rings, outer+holes flat, even-odd PIP) —
    the exact contract of ``shapefile.zones_from_shp``. zone_id is
    1-based feature order unless ``id_field`` names a numeric
    property."""
    from .synth import Zone

    recs = parse_geojson(text)
    zones, attrs = [], []
    for i, r in enumerate(recs):
        props = r["properties"]
        if id_field is not None:
            if id_field not in props:
                raise ValueError(
                    f"geojson: feature {i} missing id property "
                    f"{id_field!r}")
            zid = int(props[id_field])
        else:
            zid = i + 1
        name = str(props.get(name_field, f"feature_{i + 1}"))
        zones.append(Zone(zid, name, r["rings"], convex=False))
        attrs.append(props)
    return zones, attrs


def load_geojson(spark, path: str, name_field: str = "name"):
    """Read a .geojson file from local disk into a (small,
    broadcastable) zones DataFrame ``(zone_id, name, rings, crs)`` —
    the same shape as ``shapefile.load_shapefile``. RFC 7946 fixes the
    CRS to WGS84 lon/lat, so crs is always 'wgs84'."""
    with open(path, "rb") as f:
        zones, _ = zones_from_geojson(f.read())
    rows = [(z.zone_id, z.name,
             [[[float(x), float(y)] for x, y in ring] for ring in z.rings],
             "wgs84") for z in zones]
    return spark.createDataFrame(
        rows, "zone_id long, name string, "
              "rings array<array<array<double>>>, crs string")


# --------------------------------------------------------------------------
# sink: WKT-polygon DataFrame -> FeatureCollection text
# --------------------------------------------------------------------------

def _signed_area2(ring) -> float:
    """Twice the shoelace signed area of an OPEN ring (positive =
    counterclockwise in x-right / y-up axes)."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def _closed(ring, want_ccw: bool):
    """Orient an OPEN ring per RFC 7946 §3.1.6 (outer CCW, holes CW)
    and emit it CLOSED as [[x, y], ...]."""
    pts = list(ring)
    ccw = _signed_area2(pts) > 0
    if ccw != want_ccw:
        pts.reverse()
    pts.append(pts[0])
    return [[float(x), float(y)] for x, y in pts]


def encode_feature_collection(features) -> str:
    """``[(rings, properties), ...]`` (rings OPEN, first = outer, rest
    = holes) → deterministic FeatureCollection text (sorted property
    keys, no whitespace variance)."""
    feats = []
    for rings, props in features:
        if not rings:
            raise ValueError("geojson: feature without rings")
        coords = [_closed(rings[0], want_ccw=True)]
        coords += [_closed(r, want_ccw=False) for r in rings[1:]]
        feats.append({
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": coords},
            "properties": dict(props),
        })
    return json.dumps(
        {"type": "FeatureCollection", "features": feats},
        sort_keys=True, separators=(",", ":"))


def write_geojson(df, path: str, wkt_col: str = "wkt") -> int:
    """Write a WKT-polygon DataFrame (the ``polygonize_geoms`` shape:
    one row per region, a ``wkt`` POLYGON column + attribute columns)
    as a GeoJSON FeatureCollection — the GeoJSON driver of the
    reference's ``to_geopandas().to_file()`` sink. Returns the
    feature count.

    Scale note: like ``write_shapefile``, a single text file is an
    inherently eager sink — this collects the one-row-per-REGION
    vector table (the deliberate small-side boundary); raster-side
    pixel tables never pass through here."""
    from .shapefile import parse_wkt_polygon

    cols = [f.name for f in df.schema if f.name != wkt_col]
    rows = df.select(wkt_col, *cols).collect()
    feats = [(parse_wkt_polygon(r[wkt_col]),
              {c: r[c] for c in cols}) for r in rows]
    text = encode_feature_collection(feats)
    with open(path, "w") as f:
        f.write(text)
    return len(rows)
