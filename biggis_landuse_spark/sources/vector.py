"""Vector feature sources (SURVEY.md §2.1 S9).

The reference reads shapefiles/GeoJSON into Feature[MultiPolygon, T]
driver-side (UtilsShape.scala:26-107 — simple features are small by
contract there too). Here:

- GeoJSON: parsed with stdlib ``json`` driver-side → DataFrame of
  (feature_id, geom WKT, value) rows — the schema
  ``operators.rasterize.rasterize_features`` consumes. No fiona/ogr
  needed for GeoJSON, it is just JSON.
- Shapefile (.shp binary): requires fiona/pyshp, not in this
  container — ``read_shapefile`` raises NotImplementedError with the
  integration point documented, mirroring the codec-stub policy of
  sources.geotiff / multimodal.

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


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Shapefile source (UtilsShape.readShapefileMultiPolygon*):
    requires fiona/pyshp — not available here. Wire the driver-side
    read in and emit FEATURE_SCHEMA rows exactly like read_geojson."""
    raise NotImplementedError(
        "shapefile parsing needs fiona/pyshp; convert to GeoJSON and "
        "use read_geojson / read_geojsonl"
    )
