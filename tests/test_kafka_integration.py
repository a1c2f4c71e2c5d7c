"""Real-broker Kafka integration test (env-gated).

tests/test_kafka_wrappers.py proves sources/kafka.py's option wiring,
value cast, and sample codec against a wire-schema-identical DataSource
double — the only untested token left is the literal ``kafka`` format
name, which needs an actual broker plus the spark-sql-kafka connector
jar, neither of which ships in this container.

This module closes that last token WHEN the environment provides both:
set ``KAFKA_BOOTSTRAP`` (e.g. ``localhost:9092``) and launch Spark with
the connector (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
Without the env var the module skips cleanly; with the env var but no
connector jar it skips with an explicit reason rather than failing, so
a misconfigured CI lane degrades loudly but green.
"""

from __future__ import annotations

import os
import uuid

import pytest

from biggis_landuse_spark.sources.kafka import (
    read_sample_stream_kafka,
    write_samples_kafka,
)

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set — no broker to test against"
)

SAMPLES = [
    (0, 1, 2, 3, 1.0, [0.5, 0.25]),
    (4, 5, 6, 7, 2.0, [1.5, -0.5]),
]
SCHEMA = (
    "tile_col int, tile_row int, px int, py int, "
    "label double, features array<double>"
)


def _connector_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_real_broker_round_trip(spark, tmp_path):
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    topic = f"it_pixels_{uuid.uuid4().hex[:8]}"
    samples = spark.createDataFrame(SAMPLES, SCHEMA)

    # batch producer (S14): the default fmt="kafka" path, for real
    write_samples_kafka(samples, BOOTSTRAP, topic, streaming=False).save()

    # streaming consumer (S15): same wrapper the spool-double test runs;
    # earliest offsets so the pre-filled topic replays from the start
    decoded = read_sample_stream_kafka(
        spark, BOOTSTRAP, topic, startingOffsets="earliest"
    )
    name = f"kafka_it_{uuid.uuid4().hex[:8]}"
    q = (
        decoded.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["tile_col"], r["tile_row"], r["px"], r["py"], r["label"],
         tuple(r["features"]))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got == {(a, b, c, d, e, tuple(f)) for a, b, c, d, e, f in SAMPLES}
