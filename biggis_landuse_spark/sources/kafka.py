"""Kafka source/sink wrappers (SURVEY.md §2.1 S14/S15).

The reference only produced to Kafka via a raw KafkaProducer util
(UtilsKafka.scala:18-34) and left the consume side as commented plans
(TilePixelingExample.scala:74-94). Here both directions are Structured
Streaming / batch DataFrame writers over the standard ``kafka``
format, carrying the same delimited sample codec
(sources.codecs.encode_sample / decode_sample).

The Kafka connector jar is not in this container, so these wrappers
only *construct* readers/writers; tests exercise the identical codec
path through file/memory sources (tests/test_streaming.py) — the
operator graph is source-agnostic by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggis_landuse_spark.sources.codecs import decode_sample, encode_sample


def read_sample_stream_kafka(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    fmt: str = "kafka",
    **options: str,
) -> DataFrame:
    """Streaming pixel-sample source: Kafka value = the reference's
    delimited codec (S15, realizing the commented plan).

    ``fmt`` exists for the test double only (no broker or connector jar
    ships in this container; Spark reserves the name "kafka" so the
    double registers under its own): tests/test_kafka_wrappers.py runs
    THIS function end-to-end against a wire-schema-identical file
    source, so every line here except the default format string is
    executed — options, the value cast, the codec. Extra ``options``
    pass through to the source (e.g. startingOffsets="earliest";
    tests/test_kafka_integration.py needs it to replay a pre-filled
    topic against a real broker)."""
    reader = (
        spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return decode_stream(raw.selectExpr("CAST(value AS STRING) AS value"))


def decode_stream(lines: DataFrame) -> DataFrame:
    """value:string → sample columns; works on any source (kafka, file,
    socket, memory) — the graph under test equals the graph in prod."""
    return lines.select(decode_sample(F.col("value")).alias("s")).select("s.*")


def write_samples_kafka(
    samples: DataFrame,
    bootstrap: str,
    topic: str,
    streaming: bool = True,
    fmt: str = "kafka",
):
    """Sample sink (S14; reference UtilsKafka.send — but executor-side
    and exactly-once-capable instead of the reference's driver-side
    toLocalIterator loop, TilePixelingExample.scala:85). ``fmt``: see
    read_sample_stream_kafka."""
    encoded = samples.select(encode_sample().alias("value"))
    if streaming:
        return (
            encoded.writeStream.format(fmt)
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
        )
    return (
        encoded.write.format(fmt)
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
