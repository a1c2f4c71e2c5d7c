"""Executes sources/kafka.py's wrappers end-to-end against a
wire-schema-identical test double.

No broker or connector jar ships in this container (and Spark reserves
the data-source name "kafka", so the double cannot shadow it); the
double exposes the EXACT Kafka source schema (key/value binary, topic,
partition, offset) and sink contract (consumes a ``value`` column,
routed by the ``topic`` option) over files, so the wrappers' option
wiring, value cast, and sample codec all run for real — the only
untested token left in kafka.py is the literal default format name.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from biggis_landuse_spark.sources.kafka import (
    read_sample_stream_kafka,
    write_samples_kafka,
)

KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint"
)


def _topic_file(options) -> str:
    # the double reuses the bootstrap option as its directory — the
    # wrapper passes it through verbatim, which is what's under test
    d = options["kafka.bootstrap.servers"]
    topic = options.get("subscribe") or options["topic"]
    return os.path.join(d, f"{topic}.log")


class _Lines(InputPartition):
    def __init__(self, fp, start, end, topic):
        self.fp, self.start, self.end, self.topic = fp, start, end, topic


def _read_lines(p: _Lines):
    if not os.path.exists(p.fp):
        return
    with open(p.fp, "rb") as f:
        for off, line in enumerate(f):
            if off >= p.end:
                break
            if off >= p.start:
                yield (None, line.rstrip(b"\n"), p.topic, 0, off)


def _count(fp):
    if not os.path.exists(fp):
        return 0
    with open(fp, "rb") as f:
        return sum(1 for _ in f)


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.fp = _topic_file(options)
        self.topic = options.get("subscribe", "")

    def read(self, partition):
        yield from _read_lines(
            _Lines(self.fp, 0, _count(self.fp), self.topic)
        )


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.fp = _topic_file(options)
        self.topic = options.get("subscribe", "")

    def initialOffset(self):
        return {"n": 0}

    def latestOffset(self):
        return {"n": _count(self.fp)}

    def partitions(self, start, end):
        return [_Lines(self.fp, int(start["n"]), int(end["n"]), self.topic)]

    def read(self, partition):
        return _read_lines(partition)

    def commit(self, end):
        pass

    def stop(self):
        pass


class _Wrote(WriterCommitMessage):
    def __init__(self, lines):
        self.lines = lines


class _BatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.fp = _topic_file(options)

    def write(self, iterator):
        return _Wrote([str(row["value"]) for row in iterator])

    def commit(self, messages):
        with open(self.fp, "a") as f:
            for m in messages:
                if m is not None:
                    for ln in m.lines:
                        f.write(ln + "\n")

    def abort(self, messages):
        pass


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.fp = _topic_file(options)

    def write(self, iterator):
        return _Wrote([str(row["value"]) for row in iterator])

    def commit(self, messages, batchId):
        with open(self.fp, "a") as f:
            for m in messages:
                if m is not None:
                    for ln in m.lines:
                        f.write(ln + "\n")

    def abort(self, messages, batchId):
        pass


class FileKafkaDataSource(DataSource):
    """The wire double: Kafka schema + options, file transport."""

    @classmethod
    def name(cls):
        return "filekafka"

    def schema(self):
        return KAFKA_WIRE_SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)

    def writer(self, schema, overwrite):
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _StreamWriter(self.options)


SAMPLES = [
    (0, 1, 2, 3, 1.0, [0.5, 0.25]),
    (4, 5, 6, 7, 2.0, [1.5, -0.5]),
]
SCHEMA = (
    "tile_col int, tile_row int, px int, py int, "
    "label double, features array<double>"
)


@pytest.fixture()
def broker(spark, tmp_path):
    # the double lives in a pytest top-level module the Python workers
    # cannot import — ship it by value instead of by reference
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(FileKafkaDataSource)
    return str(tmp_path / "broker")


def test_kafka_wrappers_produce_consume_round_trip(spark, tmp_path, broker):
    os.makedirs(broker)
    samples = spark.createDataFrame(SAMPLES, SCHEMA)

    # batch producer path (streaming=False branch); the double (a
    # Python DataSource) demands an explicit append mode — the real
    # kafka sink is append-only by nature
    write_samples_kafka(
        samples, broker, "pixels", streaming=False, fmt="filekafka"
    ).mode("append").save()

    # wire check: what's on the topic is the reference's delimited codec
    with open(os.path.join(broker, "pixels.log")) as f:
        lines = sorted(f.read().splitlines())
    assert lines[0].endswith(";SpatialKey(0,1);2;3")

    # streaming consumer path — the S15 realization under test
    decoded = read_sample_stream_kafka(spark, broker, "pixels", fmt="filekafka")
    q = (
        decoded.writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["tile_col"], r["tile_row"], r["px"], r["py"], r["label"],
         tuple(r["features"]))
        for r in spark.sql("SELECT * FROM kafka_rt").collect()
    }
    assert got == {(a, b, c, d, e, tuple(f)) for a, b, c, d, e, f in SAMPLES}


def test_kafka_stream_producer_path_builds_and_runs(spark, tmp_path, broker):
    os.makedirs(broker)
    samples = spark.createDataFrame(SAMPLES, SCHEMA)
    src = str(tmp_path / "src")
    samples.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    writer = write_samples_kafka(stream, broker, "live", fmt="filekafka")
    q = (
        writer.option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    with open(os.path.join(broker, "live.log")) as f:
        assert len(f.read().splitlines()) == len(SAMPLES)


# ---------------------------------------------------------------------------
# Env-gated REAL-broker integration (r7, VERDICT item 6): runs only
# when KAFKA_BOOTSTRAP_SERVERS points at a live broker AND the
# spark-sql-kafka connector is on the classpath; skips cleanly
# otherwise (no broker or jar ships in this container). Mirrors
# tests/test_spool_source.py's round trip over the standard `kafka`
# format so the one untested token in kafka.py — the literal default
# format name — gets executed whenever an environment provides it.
# ---------------------------------------------------------------------------

_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")


def _kafka_connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", _BOOTSTRAP or "none:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # DATA_SOURCE_NOT_FOUND → jar missing
        return "DATA_SOURCE_NOT_FOUND" not in str(e)


@pytest.mark.skipif(
    not _BOOTSTRAP, reason="KAFKA_BOOTSTRAP_SERVERS not set (no broker)"
)
def test_real_kafka_round_trip(spark, tmp_path):
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on classpath")
    import uuid as _uuid

    from biggis_landuse_spark.sources.codecs import SAMPLE_SCHEMA

    topic = f"biggis-it-{_uuid.uuid4().hex[:8]}"
    samples = spark.createDataFrame(
        [(3, 4, 10, 20, 1.0, [1.0, 2.0])], SAMPLE_SCHEMA
    )
    # produce through the REAL default format (no fmt override)
    write_samples_kafka(
        samples, _BOOTSTRAP, topic, streaming=False
    ).save()
    # consume through the streaming wrapper, availableNow → memory
    q = (
        read_sample_stream_kafka(spark, _BOOTSTRAP, topic)
        .writeStream.format("memory")
        .queryName("kafka_it")
        .option(
            "checkpointLocation", str(tmp_path / "ck_kafka_it")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM kafka_it").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["label"] == 1.0 and r["features"] == [1.0, 2.0]
    assert (r["tile_col"], r["tile_row"], r["px"], r["py"]) == (3, 4, 10, 20)
