"""Shapefile source: struct-level roundtrips + validation.

Reference parity: georasters' clip/stats consume gp.read_file(.shp)
frames (reference scripts/spatial_script.py:38-49); here the .shp/.dbf
pair is parsed from scratch and must reproduce ring/attribute data
bit-exactly through encode -> decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from georasters_spark.functions import geometry as geom
from georasters_spark.sources import shapefile as shp


TRI = [[(0.0, 0.0), (10.0, 0.0), (5.0, 8.0)]]
DONUT = [[(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)],
         [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0)]]


def test_shp_roundtrip_polygon_parts():
    data, shx = shp.encode_shp([TRI, DONUT])
    recs = shp.decode_shp(data, shx)
    assert [r["rec_no"] for r in recs] == [1, 2]
    assert all(r["shape_type"] == shp.SHP_POLYGON for r in recs)
    # rings come back closed; content identical
    assert recs[0]["parts"][0] == TRI[0] + [TRI[0][0]]
    assert len(recs[1]["parts"]) == 2
    assert recs[1]["parts"][1] == DONUT[1] + [DONUT[1][0]]


def test_shp_null_shape_and_point():
    data, shx = shp.encode_shp([TRI, None])
    recs = shp.decode_shp(data, shx)
    assert recs[1]["shape_type"] == shp.SHP_NULL
    assert recs[1]["parts"] is None
    pdata, _ = shp.encode_shp([[[(3.5, -2.25)]]], shape_type=shp.SHP_POINT)
    precs = shp.decode_shp(pdata)
    assert precs[0]["parts"] == [[(3.5, -2.25)]]


def test_shp_validation():
    data, shx = shp.encode_shp([TRI])
    with pytest.raises(ValueError, match="file code"):
        shp.decode_shp(b"\x00" * 100)
    with pytest.raises(ValueError, match="file size"):
        shp.decode_shp(data[:-4])
    # shx disagreement
    bad = bytearray(shx)
    struct.pack_into(">i", bad, 100, 999)
    with pytest.raises(ValueError, match="disagrees"):
        shp.decode_shp(data, bytes(bad))
    with pytest.raises(ValueError, match="<3 vertices"):
        shp.encode_shp([[[(0.0, 0.0), (1.0, 1.0)]]])


def test_dbf_roundtrip_types_and_deleted():
    fields = [("NAME", "C", 8, 0), ("CODE", "N", 5, 0),
              ("W", "N", 7, 2), ("OK", "L", 1, 0), ("DT", "D", 8, 0)]
    rows = [{"NAME": "alpha", "CODE": 42, "W": 3.25, "OK": True,
             "DT": "20260817"},
            {"NAME": "b", "CODE": -7, "W": 0.5, "OK": False, "DT": None}]
    buf = shp.encode_dbf(fields, rows)
    f2, r2 = shp.decode_dbf(buf)
    assert [f[0] for f in f2] == ["NAME", "CODE", "W", "OK", "DT"]
    assert r2[0] == rows[0] and r2[1] == rows[1]
    # mark record 0 deleted -> skipped
    hsize = struct.unpack_from("<H", buf, 8)[0]
    mut = bytearray(buf)
    mut[hsize] = 0x2A
    _, r3 = shp.decode_dbf(bytes(mut))
    assert len(r3) == 1 and r3[0]["NAME"] == "b"


def test_dbf_validation():
    with pytest.raises(ValueError, match="> 10 chars"):
        shp.encode_dbf([("WAY_TOO_LONG_NAME", "C", 4, 0)], [])
    with pytest.raises(ValueError, match="does not fit"):
        shp.encode_dbf([("N", "N", 2, 0)], [{"N": 12345}])
    buf = shp.encode_dbf([("A", "C", 3, 0)], [{"A": "x"}])
    with pytest.raises(ValueError, match="version"):
        shp.decode_dbf(b"\x09" + buf[1:])


def test_zones_from_shp_evenodd_holes():
    data, _ = shp.encode_shp([DONUT])
    dbf = shp.encode_dbf([("NAME", "C", 6, 0)], [{"NAME": "donut"}])
    zones, attrs = shp.zones_from_shp(data, dbf)
    assert len(zones) == 1 and zones[0].name == "donut"
    # closing vertex stripped
    assert len(zones[0].rings[0]) == 4 and len(zones[0].rings) == 2
    inside = geom.points_in_rings(
        np.array([10.0, 2.0, 25.0]), np.array([10.0, 2.0, 10.0]),
        zones[0].rings)
    # center is IN the hole -> out; (2,2) in outer only -> in; (25,..) out
    assert inside.tolist() == [False, True, False]


def test_zones_from_shp_count_mismatch_and_line_reject():
    data, _ = shp.encode_shp([TRI, DONUT])
    dbf = shp.encode_dbf([("NAME", "C", 6, 0)], [{"NAME": "only"}])
    with pytest.raises(ValueError, match="dbf rows"):
        shp.zones_from_shp(data, dbf)
    line, _ = shp.encode_shp([TRI], shape_type=shp.SHP_POLYLINE)
    with pytest.raises(ValueError, match="polygon records"):
        shp.zones_from_shp(line)


def test_prj_wkt_parse():
    wkt = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
           'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
           'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')
    assert shp.decode_prj(wkt) == "wgs84"
    assert shp.decode_prj(wkt.encode()) == "wgs84"


def test_load_shapefile_dataframe(spark, tmp_path):
    data, shx = shp.encode_shp([TRI, DONUT])
    dbf = shp.encode_dbf([("NAME", "C", 8, 0)],
                         [{"NAME": "tri"}, {"NAME": "donut"}])
    base = tmp_path / "zones"
    (tmp_path / "zones.shp").write_bytes(data)
    (tmp_path / "zones.shx").write_bytes(shx)
    (tmp_path / "zones.dbf").write_bytes(dbf)
    (tmp_path / "zones.prj").write_text(
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')
    df = shp.load_shapefile(spark, str(base))
    rows = {r["name"]: r for r in df.collect()}
    assert rows["tri"]["zone_id"] == 1 and rows["tri"]["crs"] == "wgs84"
    assert len(rows["donut"]["rings"]) == 2
    assert rows["donut"]["rings"][1][0] == [5.0, 5.0]


# --------------------------------------------------------------------------
# sink: write_shapefile (the reference's to_geopandas().to_file() workflow)
# --------------------------------------------------------------------------

def test_parse_wkt_polygon():
    rings = shp.parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))")
    assert len(rings) == 2
    # closing vertex stripped
    assert rings[0] == [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    assert rings[1][0] == (2.0, 2.0) and len(rings[1]) == 4
    with pytest.raises(ValueError, match="not a POLYGON"):
        shp.parse_wkt_polygon("LINESTRING (0 0, 1 1)")
    with pytest.raises(ValueError, match="malformed"):
        shp.parse_wkt_polygon("POLYGON ( )")


def test_write_shapefile_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "tri", 0.5, True,
          "POLYGON ((0 0, 10 0, 5 8, 0 0))"),
         (2, "donut", 2.25, False,
          "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
          " (5 5, 15 5, 15 15, 5 15, 5 5))")],
        "zone_id long, name string, score double, ok boolean, wkt string")
    wgs84 = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
             'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
             'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')
    base = str(tmp_path / "out")
    n = shp.write_shapefile(df, base, crs_wkt=wgs84)
    assert n == 2
    # read back through the independent source path
    back = shp.load_shapefile(spark, base, name_field="NAME")
    rows = {r["name"]: r for r in back.collect()}
    assert rows["tri"]["crs"] == "wgs84"
    assert len(rows["donut"]["rings"]) == 2
    assert rows["donut"]["rings"][1][0] == [5.0, 5.0]
    # attributes survive with dbf typing
    _, recs = shp.decode_dbf((tmp_path / "out.dbf").read_bytes())
    by_name = {r["NAME"].strip(): r for r in recs}
    assert by_name["tri"]["ZONE_ID"] == 1
    assert abs(by_name["donut"]["SCORE"] - 2.25) < 1e-9
    assert by_name["tri"]["OK"] is True and by_name["donut"]["OK"] is False


def test_write_shapefile_from_polygonize_geoms(spark, tmp_path):
    """End-to-end reference workflow (georasters.py:1717-1738): raster →
    polygonize_geoms → .shp on disk → zones_from_shp gives back regions
    whose hole structure matches n_rings."""
    from georasters_spark.operators.algebra import polygonize_geoms

    rows = [(0, 0, 1.0)]
    rows += [(10 + r, 10 + c, 3.0) for r in range(3) for c in range(3)
             if not (r == 1 and c == 1)]
    px = spark.createDataFrame(rows, "row long, col long, value double")
    geoms = polygonize_geoms(px, (0.0, 0.0), (1.0, -1.0))
    base = str(tmp_path / "regions")
    n = shp.write_shapefile(geoms, base)
    assert n == 2
    data = (tmp_path / "regions.shp").read_bytes()
    dbf = (tmp_path / "regions.dbf").read_bytes()
    zones, attrs = shp.zones_from_shp(data, dbf, name_field="REGION_ID")
    n_rings = {float(a["VALUE"]): len(z.rings) for z, a in zip(zones, attrs)}
    assert n_rings == {1.0: 1, 3.0: 2}


def test_write_shapefile_rejects_unmappable(spark, tmp_path):
    df = spark.createDataFrame(
        [([1, 2], "POLYGON ((0 0, 1 0, 0 1, 0 0))")],
        "arr array<int>, wkt string")
    with pytest.raises(ValueError, match="no dbf mapping"):
        shp.write_shapefile(df, str(tmp_path / "bad"))


# --------------------------------------------------------------------------
# round-6 review fixes: positional dbf pairing, name collisions, L decode
# --------------------------------------------------------------------------

def test_zones_from_shp_null_record_consumes_attr_row():
    """ESRI pairs one dbf row with EVERY shp record including Null
    shapes: the null's attribute row is consumed, not misaligned."""
    data, _ = shp.encode_shp([TRI, None, DONUT])
    dbf = shp.encode_dbf([("NAME", "C", 6, 0)],
                         [{"NAME": "tri"}, {"NAME": "gone"},
                          {"NAME": "donut"}])
    zones, attrs = shp.zones_from_shp(data, dbf)
    assert [z.name for z in zones] == ["tri", "donut"]
    assert [a["NAME"] for a in attrs] == ["tri", "donut"]
    # count check is against ALL records now
    short = shp.encode_dbf([("NAME", "C", 6, 0)],
                           [{"NAME": "tri"}, {"NAME": "donut"}])
    with pytest.raises(ValueError, match="3 shp records but 2 dbf rows"):
        shp.zones_from_shp(data, short)


def test_zones_from_shp_deleted_dbf_row():
    """A deleted dbf row stays as an alignment placeholder; attached to
    a live shape it raises instead of shifting attributes."""
    data, _ = shp.encode_shp([TRI, DONUT])
    dbf = shp.encode_dbf([("NAME", "C", 6, 0)],
                         [{"NAME": "tri"}, {"NAME": "donut"}])
    hsize = struct.unpack_from("<H", dbf, 8)[0]
    mut = bytearray(dbf)
    mut[hsize] = 0x2A  # delete record 0 (live shape) -> inconsistency
    with pytest.raises(ValueError, match="flagged deleted"):
        shp.zones_from_shp(data, bytes(mut))
    f, rows = shp.decode_dbf(bytes(mut), include_deleted=True)
    assert rows[0] is None and rows[1]["NAME"] == "donut"


def test_dbf_field_name_collision_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [(1.0, 2.0, "POLYGON ((0 0, 1 0, 0 1, 0 0))")],
        "population_a double, population_b double, wkt string")
    with pytest.raises(ValueError, match="truncate to dbf field name"):
        shp.write_shapefile(df, str(tmp_path / "c"))


def test_write_shapefile_custom_wkt_col_with_wkt_attribute(spark, tmp_path):
    """A non-geometry column literally named 'wkt' must survive as an
    ordinary C attribute when the geometry column is custom-named."""
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 4 0, 0 4, 0 0))", "label-a", 7)],
        "geometry string, wkt string, score long")
    base = str(tmp_path / "w")
    assert shp.write_shapefile(df, base, wkt_col="geometry") == 1
    _, recs = shp.decode_dbf((tmp_path / "w.dbf").read_bytes())
    assert recs[0]["WKT"].strip() == "label-a"
    assert recs[0]["SCORE"] == 7


def test_dbf_logical_empty_width_is_none():
    # hand-build a dbf with an L field of declared width 0: raw b'' must
    # decode to None (substring membership would have said True)
    assert shp._dbf_value("L", 0, b"") is None
    assert shp._dbf_value("L", 1, b"T") is True
    assert shp._dbf_value("L", 1, b"?") is None
