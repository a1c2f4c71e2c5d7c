"""Vector feature sources (SURVEY.md §2.1 S9).

The reference reads shapefiles/GeoJSON into Feature[MultiPolygon, T]
driver-side (UtilsShape.scala:26-107 — simple features are small by
contract there too). Here:

- GeoJSON: parsed with stdlib ``json`` driver-side → DataFrame of
  (feature_id, geom WKT, value) rows — the schema
  ``operators.rasterize.rasterize_features`` consumes. No fiona/ogr
  needed for GeoJSON, it is just JSON.
- Shapefile (.shp binary): parsed with a stdlib ``struct`` reader —
  the ESRI shapefile format is public and simple (100-byte header,
  big-endian record headers, little-endian Polygon records). Polygon
  (5) and PolygonZ (15, XY part) records are supported; ring
  orientation (clockwise = outer, counter-clockwise = hole) groups
  rings into polygons. Numeric attributes come from the sibling
  ``.dbf`` (dBASE III layout). No fiona/pyshp needed.

Scale note: vector dims are the SMALL side of every raster⋈vector op
(they broadcast); a 100 TB workload's big side is the raster. For
vector sets too large for the driver, the same GeoJSON-lines parse
runs distributed via ``spark.read.text`` + ``from_json`` — provided
here as ``read_geojsonl`` (one feature per line, the common bulk
format).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = "feature_id bigint, geom string, value double"


def _ring_wkt(ring: list[list[float]]) -> str:
    return "(" + ", ".join(f"{x} {y}" for x, y in ring) + ")"


def geojson_geom_to_wkt(geom: dict) -> list[str]:
    """GeoJSON geometry → list of POLYGON WKTs (MultiPolygon explodes
    to its members; the rasterizer burns them per-feature anyway)."""
    gtype = geom["type"]
    if gtype == "Polygon":
        return [
            "POLYGON (" + ", ".join(_ring_wkt(r) for r in geom["coordinates"]) + ")"
        ]
    if gtype == "MultiPolygon":
        return [
            "POLYGON (" + ", ".join(_ring_wkt(r) for r in poly) + ")"
            for poly in geom["coordinates"]
        ]
    raise ValueError(f"unsupported GeoJSON geometry type: {gtype}")


def read_geojson(
    spark: SparkSession, path: str, value_property: str = "value"
) -> DataFrame:
    """Driver-side GeoJSON FeatureCollection → feature DataFrame
    (UtilsShape.readGeoJSON* analog). Features are small by contract;
    use read_geojsonl for bulk feature sets."""
    with open(path) as fh:
        doc = json.load(fh)
    rows = []
    fid = 0
    for feat in doc.get("features", []):
        props = feat.get("properties") or {}
        val = float(props.get(value_property, 1.0))
        for wkt in geojson_geom_to_wkt(feat["geometry"]):
            rows.append((fid, wkt, val))
            fid += 1
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def read_geojsonl(
    spark: SparkSession, path: str, value_property: str = "value"
) -> DataFrame:
    """Distributed GeoJSON-lines source: one feature JSON per line.

    Parsing is JVM-side ``from_json`` for properties and a thin
    executor-side pass for geometry→WKT — scales with the file, no
    driver materialization.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    lines = spark.read.text(path)

    def parse(batch_iter):
        import pandas as pd

        fid_base = 0
        for pdf in batch_iter:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if not line:
                    continue
                feat = json.loads(line)
                props = feat.get("properties") or {}
                val = float(props.get(value_property, 1.0))
                for wkt in geojson_geom_to_wkt(feat["geometry"]):
                    rows.append((fid_base, wkt, val))
                    fid_base += 1
            yield pd.DataFrame(
                rows, columns=["feature_id", "geom", "value"]
            )

    parsed = lines.mapInPandas(parse, FEATURE_SCHEMA)
    # per-partition counters → globally unique ids without any shuffle
    return parsed.withColumn("feature_id", F.monotonically_increasing_id())


def _ring_signed_area(ring: list[tuple[float, float]]) -> float:
    """Shoelace ×2: negative for clockwise rings (shapefile outer).

    Coordinates are translated to the first vertex before the cross
    products — area is translation-invariant, and without the shift a
    small ring far from the origin (projected meters, e.g. a 2 mm
    rectangle at UTM easting 460134) cancels below double ulp and can
    flip orientation, misgrouping an outer ring as a hole."""
    if not ring:
        return 0.0
    ox, oy = ring[0]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += (x1 - ox) * (y2 - oy) - (x2 - ox) * (y1 - oy)
    return s


def parse_shp(data: bytes) -> list[list[list[tuple[float, float]]]]:
    """Parse .shp bytes → one entry per shape record: a list of rings
    (each a closed [(x, y), ...]). Null shapes yield empty lists.

    Format (public ESRI spec): 100-byte file header (file code 9994
    big-endian at 0, file length in 16-bit words big-endian at 24);
    records = 8-byte big-endian (number, content-length) header + a
    little-endian shape: type int32, then for Polygon (5) / PolygonZ
    (15): bbox 4×f64, numParts i32, numPoints i32, parts i32[],
    points (x, y) f64[] — PolygonZ's trailing z/m sections are beyond
    the XY block and are skipped via the record length.
    """
    import struct as st

    (code,) = st.unpack(">i", data[0:4])
    if code != 9994:
        raise ValueError(f"not a shapefile: file code {code}")
    (flen_words,) = st.unpack(">i", data[24:28])
    end = flen_words * 2
    shapes = []
    pos = 100
    while pos < min(end, len(data)):
        _num, clen_words = st.unpack(">ii", data[pos : pos + 8])
        content = data[pos + 8 : pos + 8 + clen_words * 2]
        pos += 8 + clen_words * 2
        (stype,) = st.unpack("<i", content[0:4])
        if stype == 0:  # null shape
            shapes.append([])
            continue
        if stype not in (5, 15):
            raise ValueError(
                f"shape type {stype} not supported (Polygon=5 / PolygonZ=15)"
            )
        n_parts, n_points = st.unpack("<ii", content[36:44])
        parts = list(st.unpack(f"<{n_parts}i", content[44 : 44 + 4 * n_parts]))
        pts_off = 44 + 4 * n_parts
        flat = st.unpack(
            f"<{2 * n_points}d", content[pts_off : pts_off + 16 * n_points]
        )
        pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_points)]
        bounds = parts + [n_points]
        shapes.append([pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)])
    return shapes


def parse_dbf(data: bytes) -> list[dict[str, object]]:
    """Parse .dbf (dBASE III) bytes → one attribute dict per record.
    Character fields come back stripped; N/F fields as float; others
    as raw strings. Deleted records (flag ``*``) are skipped."""
    import struct as st

    n_rec, hdr_size, rec_size = st.unpack("<IHH", data[4:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    out = []
    for i in range(n_rec):
        rec = data[hdr_size + i * rec_size : hdr_size + (i + 1) * rec_size]
        if not rec or rec[0:1] == b"*":
            continue
        row: dict[str, object] = {}
        off = 1
        for name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype in ("N", "F"):
                row[name] = float(raw) if raw else None
            else:
                row[name] = raw
        out.append(row)
    return out


def shp_rings_to_wkts(rings: list[list[tuple[float, float]]]) -> list[str]:
    """Group a record's rings into POLYGON WKTs: a clockwise ring
    (negative shoelace) opens a new polygon, counter-clockwise rings
    are holes of the polygon they follow (the shapefile convention;
    UtilsShape.scala:40-55 rebuilds MultiPolygons the same way)."""
    polys: list[list[list[tuple[float, float]]]] = []
    for ring in rings:
        if _ring_signed_area(ring) <= 0 or not polys:  # outer (or orphan hole)
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return [
        "POLYGON (" + ", ".join(_ring_wkt(ring) for ring in poly) + ")"
        for poly in polys
    ]


def read_shapefile(
    spark: SparkSession,
    path: str,
    value_field: str | None = None,
) -> DataFrame:
    """Shapefile source (UtilsShape.readShapefileMultiPolygon*
    analog): stdlib parse of ``.shp`` polygon records + the sibling
    ``.dbf`` numeric attribute, emitting FEATURE_SCHEMA rows exactly
    like read_geojson (driver-side — vector dims are the small,
    broadcastable side by contract; bulk features belong in
    GeoJSON-lines via read_geojsonl)."""
    shp_path = path[:-4] if path.endswith(".shp") else path
    with open(shp_path + ".shp", "rb") as fh:
        shapes = parse_shp(fh.read())
    attrs: list[dict[str, object]] = []
    try:
        with open(shp_path + ".dbf", "rb") as fh:
            attrs = parse_dbf(fh.read())
    except FileNotFoundError:
        pass

    def value_of(i: int) -> float:
        if i >= len(attrs):
            return 1.0
        row = attrs[i]
        if value_field is not None:
            v = row.get(value_field)
            return float(v) if v is not None else 1.0
        for v in row.values():  # first numeric field, like value_property
            if isinstance(v, float):
                return v
        return 1.0

    rows = []
    fid = 0
    for i, rings in enumerate(shapes):
        for wkt in shp_rings_to_wkts(rings):
            rows.append((fid, wkt, value_of(i)))
            fid += 1
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
