"""Structured Streaming operators (SURVEY.md §2.9).

The reference *intended* a Kafka pixel-stream path but never landed it
(commented plans, TilePixelingExample.scala:74-94; DStream deps,
pom.xml:233-246) and fell back to CSV. This package realizes it:
windowed aggregation with watermarks, late-data policy, and stateful
tile reassembly — all source-agnostic (kafka/file/rate/memory), so the
graph under test is the production graph.
"""
