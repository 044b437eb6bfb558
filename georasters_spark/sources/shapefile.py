"""Shapefile (.shp / .shx / .dbf / .prj) vector source — pure struct.

The reference's flagship clip/stats workflow starts from a shapefile:
``col = gp.read_file(tests/data/COL.shp); data.clip(col, keep=True)``
(reference ``scripts/spatial_script.py:38-49``; the clip/stats sections
of ``tests/test_georasters.py`` load ``COL.shp``/``TUR.shp`` the same
way).  GeoPandas/fiona/GDAL are absent in-sandbox — and the north rule
wants the engine from scratch — so this module parses the public ESRI
shapefile white-paper format and dBASE III directly:

- ``.shp``  geometry: 100-byte header (big-endian file code 9994,
  little-endian version 1000 + shape type + bbox doubles), then records
  of (BE record number, BE content length in 16-bit words, LE shape
  struct).  Polygon (5), PolygonZ (15) and PolygonM (25) are decoded to
  ring lists (Z/M arrays skipped); Point (1) / MultiPoint (8) /
  PolyLine (3) decode to coordinate lists; Null (0) to ``None``.
- ``.shx``  index: same header, then (BE offset, BE length) per record
  — emitted by the writer, used by the reader only for validation.
- ``.dbf``  attributes: dBASE III header (LE record count / header
  size / record size), 32-byte field descriptors, fixed-width ASCII
  records.  C→str, N/F→int|float, L→bool, D→'YYYYMMDD' str.
- ``.prj``  CRS: WKT1 text routed through the existing parser
  (``operators/reproject.parse_crs``).

Scale shape: a zone table is the SMALL side of every spatial join in
this engine (clip/zonal broadcast the ring list; the pixel/image side
is the 100-TB side), so the shapefile is read driver-side and
broadcast — the same plan shape as ``synth.ZONES_T1``.  The encoders
exist so tests and gates build spec-conformant fixtures from literals
instead of shipping binary blobs.

Ring convention: ESRI stores rings CLOSED (first vertex repeated) with
outer rings clockwise and holes counter-clockwise.  ``zones_from_shp``
strips the closing vertex and keeps ring order; the engine's even-odd
point-in-polygon (``functions/geometry.points_in_rings``) is
orientation- and nesting-agnostic, so multipart polygons (several
outer rings and/or holes in one record) need no reclassification.
"""

from __future__ import annotations

import struct

import numpy as np

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8
_POLY_TYPES = {3, 5, 13, 15, 23, 25}  # polyline/polygon + Z/M variants
_POINT_TYPES = {1, 11, 21}
_MULTIPOINT_TYPES = {8, 18, 28}


# --------------------------------------------------------------------------
# .shp
# --------------------------------------------------------------------------

def decode_shp(buf: bytes, shx: bytes | None = None) -> list:
    """Parse a .shp byte string into records:
    ``{"rec_no": int, "shape_type": int, "parts": [[(x, y), ...], ...]}``
    (parts as stored: rings closed, one list per part; points /
    multipoints get a single part).  Null shapes give ``parts=None``.
    Passing the sibling ``.shx`` validates record offsets/lengths."""
    if len(buf) < 100:
        raise ValueError("shp: truncated header")
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"shp: bad file code {code}")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    if flen_words * 2 != len(buf):
        raise ValueError(
            f"shp: header length {flen_words * 2} != file size {len(buf)}")
    version, ftype = struct.unpack_from("<ii", buf, 28)
    if version != 1000:
        raise ValueError(f"shp: bad version {version}")

    index = None
    if shx is not None:
        if len(shx) < 100 or struct.unpack_from(">i", shx, 0)[0] != 9994:
            raise ValueError("shx: bad header")
        n = (struct.unpack_from(">i", shx, 24)[0] * 2 - 100) // 8
        index = [struct.unpack_from(">ii", shx, 100 + 8 * i) for i in range(n)]

    out = []
    pos = 100
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("shp: truncated record header")
        rec_no, clen_words = struct.unpack_from(">ii", buf, pos)
        content = buf[pos + 8 : pos + 8 + clen_words * 2]
        if len(content) != clen_words * 2:
            raise ValueError(f"shp: truncated record {rec_no}")
        if index is not None:
            k = len(out)
            if k >= len(index) or index[k] != (pos // 2, clen_words):
                raise ValueError(f"shp: record {rec_no} disagrees with shx")
        (stype,) = struct.unpack_from("<i", content, 0)
        if stype != SHP_NULL and stype != ftype:
            raise ValueError(
                f"shp: record type {stype} != file type {ftype}")
        out.append({"rec_no": rec_no, "shape_type": stype,
                    "parts": _decode_shape(stype, content)})
        pos += 8 + clen_words * 2
    return out


def _decode_shape(stype: int, content: bytes):
    if stype == SHP_NULL:
        return None
    if stype in _POINT_TYPES:
        x, y = struct.unpack_from("<dd", content, 4)
        return [[(x, y)]]
    if stype in _MULTIPOINT_TYPES:
        (npts,) = struct.unpack_from("<i", content, 36)
        pts = np.frombuffer(content, "<f8", count=2 * npts, offset=40)
        return [[tuple(p) for p in pts.reshape(npts, 2)]]
    if stype in _POLY_TYPES:
        nparts, npts = struct.unpack_from("<ii", content, 36)
        if nparts <= 0 or npts <= 0:
            raise ValueError("shp: polygon with no parts/points")
        starts = list(struct.unpack_from(f"<{nparts}i", content, 44))
        off = 44 + 4 * nparts
        need = off + 16 * npts
        if len(content) < need:
            raise ValueError("shp: point array truncated")
        pts = np.frombuffer(content, "<f8", count=2 * npts, offset=off)
        pts = pts.reshape(npts, 2)
        bounds = starts + [npts]
        if any(bounds[i] >= bounds[i + 1] for i in range(nparts)):
            raise ValueError("shp: non-increasing part offsets")
        return [[tuple(p) for p in pts[bounds[i] : bounds[i + 1]]]
                for i in range(nparts)]
    raise NotImplementedError(f"shp: shape type {stype} not supported")


def encode_shp(shapes: list, shape_type: int = SHP_POLYGON):
    """Shapes → (.shp bytes, .shx bytes).  Each shape is a list of
    parts; polygon parts are auto-closed if the first vertex is not
    repeated.  ``None`` emits a Null shape record."""
    records = []
    for parts in shapes:
        if parts is None:
            records.append(struct.pack("<i", SHP_NULL))
            continue
        if shape_type in _POLY_TYPES:
            closed = []
            for p in parts:
                p = [(float(x), float(y)) for x, y in p]
                if len(p) < 3:
                    raise ValueError("shp: ring with <3 vertices")
                if p[0] != p[-1]:
                    p = p + [p[0]]
                closed.append(p)
            allp = [xy for p in closed for xy in p]
            xs = [x for x, _ in allp]
            ys = [y for _, y in allp]
            starts, acc = [], 0
            for p in closed:
                starts.append(acc)
                acc += len(p)
            content = struct.pack("<idddd", shape_type, min(xs), min(ys),
                                  max(xs), max(ys))
            content += struct.pack("<ii", len(closed), len(allp))
            content += struct.pack(f"<{len(starts)}i", *starts)
            content += np.asarray(allp, dtype="<f8").tobytes()
            records.append(content)
        elif shape_type in _POINT_TYPES:
            (x, y), = parts[0]
            records.append(struct.pack("<idd", shape_type, x, y))
        else:
            raise NotImplementedError(f"shp: encode type {shape_type}")

    body = bytearray()
    shx_body = bytearray()
    pos = 100
    for i, content in enumerate(records):
        clen = len(content) // 2
        body += struct.pack(">ii", i + 1, clen) + content
        shx_body += struct.pack(">ii", pos // 2, clen)
        pos += 8 + len(content)

    allxy = [xy for parts in shapes if parts for p in parts for xy in p]
    xs = [x for x, _ in allxy] or [0.0]
    ys = [y for _, y in allxy] or [0.0]

    def header(total_len: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_len // 2)
                + struct.pack("<ii", 1000, shape_type)
                + struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
                + struct.pack("<dddd", 0, 0, 0, 0))

    shp = header(100 + len(body)) + bytes(body)
    shx = header(100 + len(shx_body)) + bytes(shx_body)
    return shp, shx


# --------------------------------------------------------------------------
# .dbf (dBASE III)
# --------------------------------------------------------------------------

def decode_dbf(buf: bytes, include_deleted: bool = False):
    """.dbf bytes → (fields, rows).  fields: [(name, type, length,
    decimals)]; rows: list of dicts with typed values.  Deleted records
    (flag 0x2A) are skipped by default; ``include_deleted=True`` keeps
    them as ``None`` placeholders so row index == record index (needed
    when pairing attributes positionally with .shp records)."""
    if len(buf) < 33:
        raise ValueError("dbf: truncated header")
    version = buf[0]
    if version & 0x07 != 0x03:
        raise ValueError(f"dbf: unsupported version byte 0x{version:02x}")
    nrec, hsize, rsize = struct.unpack_from("<IHH", buf, 4)
    fields = []
    pos = 32
    while pos < hsize - 1:
        if buf[pos] == 0x0D:
            break
        desc = buf[pos : pos + 32]
        if len(desc) < 32:
            raise ValueError("dbf: truncated field descriptor")
        name = desc[:11].split(b"\x00")[0].decode("ascii")
        ftype = chr(desc[11])
        flen = desc[16]
        fdec = desc[17]
        if ftype not in "CNFLD":
            raise ValueError(f"dbf: field type {ftype!r} not supported")
        fields.append((name, ftype, flen, fdec))
        pos += 32
    if 1 + sum(f[2] for f in fields) != rsize:
        raise ValueError("dbf: record size disagrees with field widths")

    rows = []
    pos = hsize
    for _ in range(nrec):
        rec = buf[pos : pos + rsize]
        if len(rec) < rsize:
            raise ValueError("dbf: truncated record")
        pos += rsize
        if rec[0] == 0x2A:  # deleted
            if include_deleted:
                rows.append(None)
            continue
        if rec[0] != 0x20:
            raise ValueError(f"dbf: bad deletion flag 0x{rec[0]:02x}")
        row = {}
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen]
            off += flen
            row[name] = _dbf_value(ftype, fdec, raw)
        rows.append(row)
    return fields, rows


def _dbf_value(ftype: str, fdec: int, raw: bytes):
    s = raw.decode("ascii", "strict")
    if ftype == "C":
        return s.rstrip()
    if ftype in "NF":
        s = s.strip()
        if not s or s == "*" * len(s):
            return None
        return float(s) if (fdec > 0 or "." in s or ftype == "F") else int(s)
    if ftype == "L":
        # tuple membership, not substring: a zero-length raw value must
        # decode to None, but '' in "YyTt" would be True
        if s in ("Y", "y", "T", "t"):
            return True
        if s in ("N", "n", "F", "f"):
            return False
        return None
    if ftype == "D":
        return s.strip() or None
    raise AssertionError(ftype)


def encode_dbf(fields: list, rows: list) -> bytes:
    """(fields, rows) → .dbf bytes.  fields: [(name, type, length,
    decimals)] with types C/N/F/L/D."""
    for name, ftype, flen, fdec in fields:
        if len(name) > 10:
            raise ValueError(f"dbf: field name {name!r} > 10 chars")
        if ftype not in "CNFLD":
            raise ValueError(f"dbf: field type {ftype!r}")
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<BBBB", 0x03, 26, 8, 17)  # version + ymd stamp
    out += struct.pack("<IHH", len(rows), hsize, rsize)
    out += b"\x00" * 20
    for name, ftype, flen, fdec in fields:
        out += name.encode("ascii").ljust(11, b"\x00")
        out += ftype.encode("ascii") + b"\x00" * 4
        out += struct.pack("<BB", flen, fdec) + b"\x00" * 14
    out += b"\x0d"
    for row in rows:
        out += b"\x20"
        for name, ftype, flen, fdec in fields:
            v = row.get(name)
            if ftype == "C":
                s = ("" if v is None else str(v)).ljust(flen)
            elif ftype in "NF":
                if v is None:
                    s = " " * flen
                elif fdec > 0:
                    s = f"{float(v):.{fdec}f}".rjust(flen)
                else:
                    s = str(int(v)).rjust(flen)
            elif ftype == "L":
                s = "?" if v is None else ("T" if v else "F")
            else:  # D
                s = ("" if v is None else str(v)).ljust(flen)
            b = s.encode("ascii")
            if len(b) != flen:
                raise ValueError(
                    f"dbf: value {v!r} does not fit field {name}({flen})")
            out += b
    out += b"\x1a"
    return bytes(out)


# --------------------------------------------------------------------------
# assembly: shapefile -> zones / DataFrame
# --------------------------------------------------------------------------

def decode_prj(text) -> str:
    """.prj WKT → CRS token via the engine's WKT1 parser."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    from ..operators.reproject import parse_crs

    return parse_crs(text)


def zones_from_shp(shp: bytes, dbf: bytes | None = None,
                   name_field: str = "NAME", id_field: str | None = None):
    """Parse .shp (+ optional .dbf) into the engine's zone shape:
    a list of ``synth.Zone`` (rings open, outer+holes together — the
    even-odd PIP needs no outer/hole split), plus the attribute rows.
    Returns ``(zones, attrs)``; zone_id is 1-based record order unless
    ``id_field`` names a numeric .dbf column.

    Attribute pairing is POSITIONAL per the ESRI convention: one .dbf
    row per .shp record INCLUDING Null shapes (a null shape's attribute
    row is consumed and dropped with it).  Deleted .dbf rows are kept
    as alignment placeholders; one attached to a live shape is a
    shp/dbf inconsistency and raises."""
    from .synth import Zone

    recs = decode_shp(shp)
    attrs_by_rec = None
    if dbf is not None:
        _, attrs_by_rec = decode_dbf(dbf, include_deleted=True)
        if len(attrs_by_rec) != len(recs):
            raise ValueError(
                f"shapefile: {len(recs)} shp records but "
                f"{len(attrs_by_rec)} dbf rows")
    zones, attrs = [], []
    for i, r in enumerate(recs):
        if r["shape_type"] == SHP_NULL:
            continue
        if r["shape_type"] not in _POLY_TYPES or r["shape_type"] in (3, 13, 23):
            raise ValueError("shapefile: zones need polygon records")
        row = attrs_by_rec[i] if attrs_by_rec is not None else {}
        if row is None:
            raise ValueError(
                f"shapefile: record {r['rec_no']} is a live shape but its "
                "dbf row is flagged deleted")
        zid = int(row[id_field]) if id_field else r["rec_no"]
        name = str(row.get(name_field, f"shape_{r['rec_no']}"))
        rings = tuple(
            tuple(p[:-1] if p[0] == p[-1] else p) for p in r["parts"])
        zones.append(Zone(zid, name, rings, convex=False))
        if attrs_by_rec is not None:
            attrs.append(row)
    return zones, attrs


def load_shapefile(spark, base: str, name_field: str = "NAME"):
    """Read ``base + '.shp'/'.dbf'/'.prj'`` from local disk into a
    (small, broadcastable) zones DataFrame ``(zone_id, name, rings,
    crs)`` matching ``synth.zones_df``'s geometry shape."""
    with open(base + ".shp", "rb") as f:
        shp = f.read()
    dbf = None
    try:
        with open(base + ".dbf", "rb") as f:
            dbf = f.read()
    except FileNotFoundError:
        pass
    crs = "wgs84"
    try:
        with open(base + ".prj", "rb") as f:
            crs = decode_prj(f.read())
    except FileNotFoundError:
        pass
    zones, _ = zones_from_shp(shp, dbf, name_field=name_field)
    rows = [(z.zone_id, z.name,
             [[[float(x), float(y)] for x, y in ring] for ring in z.rings],
             crs) for z in zones]
    return spark.createDataFrame(
        rows, "zone_id long, name string, "
              "rings array<array<array<double>>>, crs string")


# --------------------------------------------------------------------------
# sink: WKT-polygon DataFrame -> .shp/.shx/.dbf/.prj files
# --------------------------------------------------------------------------

def parse_wkt_polygon(wkt: str) -> list:
    """``POLYGON ((x y, ...), (x y, ...))`` → list of OPEN rings
    (closing vertex stripped).  Only the POLYGON form `polygonize_geoms`
    emits is accepted; anything else raises."""
    s = wkt.strip()
    if not s.upper().startswith("POLYGON"):
        raise ValueError(f"shp sink: not a POLYGON WKT: {s[:40]!r}")
    body = s[s.index("(") + 1: s.rindex(")")].strip()
    rings = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                pts = []
                for tok in body[start:i].split(","):
                    x, y = tok.split()
                    pts.append((float(x), float(y)))
                if len(pts) > 1 and pts[0] == pts[-1]:
                    pts = pts[:-1]
                rings.append(pts)
    if not rings or depth != 0:
        raise ValueError(f"shp sink: malformed POLYGON WKT: {s[:40]!r}")
    return rings


def _dbf_fields_for(schema, wkt_col: str = "wkt") -> list:
    """Map a Spark schema (minus the geometry column) onto dBASE III
    field descriptors: integers → N(18,0), floats → N(24,10), booleans
    → L, strings → C(64).  dBASE caps names at 10 chars; two columns
    truncating to the same uppercase name would silently merge, so
    collisions raise."""
    fields = []
    seen = {}
    for f in schema:
        if f.name == wkt_col:
            continue
        fname = f.name[:10].upper()
        if fname in seen:
            raise ValueError(
                f"shp sink: columns {seen[fname]!r} and {f.name!r} both "
                f"truncate to dbf field name {fname!r}")
        seen[fname] = f.name
        t = f.dataType.simpleString()
        if t in ("tinyint", "smallint", "int", "bigint"):
            fields.append((f.name[:10].upper(), "N", 18, 0))
        elif t in ("float", "double"):
            fields.append((f.name[:10].upper(), "N", 24, 10))
        elif t == "boolean":
            fields.append((f.name[:10].upper(), "L", 1, 0))
        elif t == "string":
            fields.append((f.name[:10].upper(), "C", 64, 0))
        else:
            raise ValueError(f"shp sink: no dbf mapping for {f.name}: {t}")
    return fields


def write_shapefile(df, base: str, wkt_col: str = "wkt",
                    crs_wkt: str | None = None) -> int:
    """Write a WKT-polygon DataFrame (the `polygonize_geoms` shape:
    one row per region, a ``wkt`` POLYGON column + attribute columns)
    as ``base + '.shp'/'.shx'/'.dbf'`` (+ ``'.prj'`` when ``crs_wkt``
    is given) — the reference's ``to_geopandas().to_file()`` sink
    (georasters.py:1717-1738 + geopandas) from scratch.  Returns the
    record count.

    Scale note: a single .shp is an inherently eager single-file
    format (32-bit offsets, monolithic header) — this sink collects
    the one-row-per-REGION vector table, the same deliberate
    small-side boundary as ``geotiff.assemble_tiff`` (the distributed
    twin is simply keeping the geometry DataFrame); the raster-side
    pixel tables never pass through here."""
    cols = [f for f in df.schema if f.name != wkt_col]
    rows = df.select(wkt_col, *[f.name for f in cols]).collect()
    shapes = [parse_wkt_polygon(r[wkt_col]) for r in rows]
    shp, shx = encode_shp(shapes)
    fields = _dbf_fields_for(df.schema, wkt_col=wkt_col)
    recs = []
    for r in rows:
        rec = {}
        for f, (fname, ftype, _, _) in zip(cols, fields):
            v = r[f.name]
            if ftype == "N" and v is not None and f.dataType.simpleString() in (
                    "float", "double"):
                v = float(v)
            rec[fname] = v
        recs.append(rec)
    dbf = encode_dbf(fields, recs)
    with open(base + ".shp", "wb") as f:
        f.write(shp)
    with open(base + ".shx", "wb") as f:
        f.write(shx)
    with open(base + ".dbf", "wb") as f:
        f.write(dbf)
    if crs_wkt is not None:
        with open(base + ".prj", "w") as f:
            f.write(crs_wkt)
    return len(rows)
