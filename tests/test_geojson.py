"""GeoJSON source/sink (sources/geojson.py): parse matrix
(FeatureCollection / Feature / bare geometry, Polygon / MultiPolygon,
holes), ring validation, RFC 7946 orientation on write, write→read
roundtrip, zones parity with the shapefile reader."""

import json

import numpy as np
import pytest

from georasters_spark.sources import geojson as GJ


def _fc(*features):
    return json.dumps({"type": "FeatureCollection", "features": list(features)})


def _feat(geom, props=None):
    return {"type": "Feature", "geometry": geom, "properties": props or {}}


SQ = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
HOLE = [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]
TRI = [[10.0, 0.0], [14.0, 0.0], [12.0, 3.0], [10.0, 0.0]]


def test_parse_polygon_with_hole():
    recs = GJ.parse_geojson(_fc(_feat(
        {"type": "Polygon", "coordinates": [SQ, HOLE]}, {"name": "donut"})))
    assert len(recs) == 1
    rings = recs[0]["rings"]
    assert len(rings) == 2 and rings[0][0] == (0.0, 0.0)
    assert all(r[0] != r[-1] or len(r) == 1 for r in rings)  # opened
    assert recs[0]["properties"]["name"] == "donut"


def test_parse_multipolygon_flattens():
    recs = GJ.parse_geojson(_fc(_feat(
        {"type": "MultiPolygon", "coordinates": [[SQ], [TRI]]})))
    assert len(recs) == 1 and len(recs[0]["rings"]) == 2


def test_parse_feature_and_bare_geometry():
    assert len(GJ.parse_geojson(json.dumps(_feat(
        {"type": "Polygon", "coordinates": [SQ]})))) == 1
    assert len(GJ.parse_geojson(json.dumps(
        {"type": "Polygon", "coordinates": [TRI]}))) == 1


def test_null_geometry_dropped_with_attrs():
    recs = GJ.parse_geojson(_fc(
        _feat(None, {"name": "ghost"}),
        _feat({"type": "Polygon", "coordinates": [SQ]}, {"name": "real"})))
    assert [r["properties"]["name"] for r in recs] == ["real"]


@pytest.mark.parametrize("bad, msg", [
    ("[1,2]", "not an object"),
    (json.dumps({"type": "Line"}), "unsupported top-level"),
    (_fc(_feat({"type": "Point", "coordinates": [1, 2]})), "Polygon or Multi"),
    (_fc(_feat({"type": "Polygon", "coordinates": [SQ[:-1]]})), "not closed"),
    (_fc(_feat({"type": "Polygon", "coordinates": [SQ[:3]]})), ">= 4"),
    (_fc(_feat({"type": "Polygon", "coordinates": [[[0, "a"]] * 4]})),
     "bad position"),
    (_fc(_feat({"type": "Polygon", "coordinates": []})), "empty"),
])
def test_parse_errors(bad, msg):
    with pytest.raises(ValueError, match=msg):
        GJ.parse_geojson(bad)


def test_zones_from_geojson_ids_and_names():
    text = _fc(
        _feat({"type": "Polygon", "coordinates": [SQ]},
              {"name": "a", "code": 7}),
        _feat({"type": "Polygon", "coordinates": [TRI]},
              {"name": "b", "code": 9}))
    zones, attrs = GJ.zones_from_geojson(text)
    assert [z.zone_id for z in zones] == [1, 2]
    assert [z.name for z in zones] == ["a", "b"]
    zones2, _ = GJ.zones_from_geojson(text, id_field="code")
    assert [z.zone_id for z in zones2] == [7, 9]
    with pytest.raises(ValueError, match="missing id property"):
        GJ.zones_from_geojson(_fc(_feat(
            {"type": "Polygon", "coordinates": [SQ]})), id_field="code")


def test_encode_orients_rings_rfc7946():
    # feed outer CW + hole CCW: the writer must flip both
    outer_cw = tuple(reversed([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]))
    hole_ccw = ((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    text = GJ.encode_feature_collection([((outer_cw, hole_ccw), {"n": 1})])
    coords = json.loads(text)["features"][0]["geometry"]["coordinates"]
    assert coords[0][0] == coords[0][-1]  # closed
    assert GJ._signed_area2([tuple(p) for p in coords[0][:-1]]) > 0  # CCW
    assert GJ._signed_area2([tuple(p) for p in coords[1][:-1]]) < 0  # CW
    # parse back: identical point SETS per ring
    recs = GJ.parse_geojson(text)
    assert {frozenset(r) for r in recs[0]["rings"]} == {
        frozenset(outer_cw), frozenset(hole_ccw)}


def test_write_read_roundtrip_spark(spark, tmp_path):
    rows = [
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
         "donut", 2.5),
        ("POLYGON ((10 0, 14 0, 12 3, 10 0))", "tri", -1.0),
    ]
    df = spark.createDataFrame(rows, "wkt string, name string, score double")
    path = str(tmp_path / "zones.geojson")
    assert GJ.write_geojson(df, path) == 2
    zdf = GJ.load_geojson(spark, path)
    got = {r["name"]: r for r in zdf.collect()}
    assert set(got) == {"donut", "tri"}
    assert len(got["donut"]["rings"]) == 2
    assert got["tri"]["crs"] == "wgs84"
    # attribute fidelity through parse_geojson
    with open(path) as f:
        recs = GJ.parse_geojson(f.read())
    assert {r["properties"]["name"]: r["properties"]["score"]
            for r in recs} == {"donut": 2.5, "tri": -1.0}


def test_geojson_zones_match_shapefile_zones():
    """Same geometry through both vector readers → identical PIP masks
    (the two sources are interchangeable zone feeds)."""
    from georasters_spark.functions.geometry import points_in_rings
    from georasters_spark.sources import shapefile as SHPF

    parts = [[(0.0, 0.0), (8.0, 0.0), (8.0, 6.0), (0.0, 6.0)],
             [(2.0, 2.0), (6.0, 2.0), (6.0, 4.0), (2.0, 4.0)]]
    shp, _ = SHPF.encode_shp([parts])
    zs, _ = SHPF.zones_from_shp(shp)
    closed = [[[float(x), float(y)] for x, y in p] + [[float(p[0][0]),
               float(p[0][1])]] for p in parts]
    zg, _ = GJ.zones_from_geojson(json.dumps(
        {"type": "Polygon", "coordinates": closed}))
    xs = np.linspace(-1, 9, 23)
    ys = np.linspace(-1, 7, 17)
    xg, yg = np.meshgrid(xs, ys)
    a = points_in_rings(xg.ravel(), yg.ravel(), zs[0].rings)
    b = points_in_rings(xg.ravel(), yg.ravel(), zg[0].rings)
    assert a.any() and not a.all()
    assert (a == b).all()
