"""Connectors: sample codecs (CSV/LibSVM/Kafka message format),
GeoTiff ingest plumbing, Kafka source/sink wrappers."""
