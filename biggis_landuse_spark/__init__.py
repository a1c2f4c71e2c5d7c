"""biggis_landuse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``biggis-project/biggis-landuse`` (a GeoTrellis/RDD land-use
update-detection pipeline library) as an idiomatic PySpark engine:
DataFrame / Spark SQL for all relational and map-algebra work,
Structured Streaming for the pixel/event stream path, pandas UDFs
only where built-in operators genuinely cannot express the
semantics (raster kernels, stateful reassembly).

Layout (mirrors SURVEY.md §7):

- ``session``    — SparkSession factory tuned for the engine
- ``model``      — tile/pixel schemas (SURVEY.md §1.1)
- ``catalog``    — layer catalog service: write/read/delete/merge
  (reference: api/package.scala:62-385)
- ``pixeling``   — tile ⇄ pixel dual representation
  (reference: UtilsML.scala:17-52, TilePixelingExample.scala:63-107)
- ``operators``  — local/focal map algebra, pyramid, resample,
  rasterize, stats
- ``functions``  — text analysis, dedup, similarity search
- ``sources``    — GeoTiff/CSV/LibSVM/Kafka connectors
- ``ml``         — normalization + OneVsRest classification
- ``streaming``  — Structured Streaming operators
- ``queries``    — the driver-facing query registry (each query is
  declared once with its Spark implementation AND its DuckDB oracle
  SQL)
"""

__version__ = "0.1.0"
