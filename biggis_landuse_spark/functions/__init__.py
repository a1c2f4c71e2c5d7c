"""Column-level function library: text analysis, dedup, similarity.

These are the training-data-pipeline operators layered on the same
DataFrame substrate as the raster engine (SURVEY.md §7.2 M5). All hot
paths are built-in Spark SQL functions / higher-order array functions
(JVM-side, codegen) — no Python UDFs.
"""
