"""Custom Python DataSource (Spark 4 DataSource V2 API): a partitioned,
offset-tracked append-only message spool — the in-container stand-in
for the Kafka topic the reference planned to consume
(TilePixelingExample.scala:74-94; UtilsKafka.scala:18-34).

A spool directory holds one append-only ``p<N>.log`` file per
partition; each line is a message. The source exposes the Kafka read
contract — ``(partition int, offset bigint, value string)`` — in both
batch and streaming form:

- batch: full scan, one Spark task per spool partition;
- streaming: a DataSourceStreamReader whose checkpointable offset is
  ``{partition: next_line}``; each microbatch reads exactly the
  [start, end) line ranges, so replays after failure are exactly-once
  — the semantics the Kafka connector provides, realized over files.

Pair with sources.kafka.decode_stream to parse the reference's
``label;f1..fn;SpatialKey(c,r);x;y`` messages: the operator graph
downstream of ``value`` is IDENTICAL whether the bytes arrive from
this spool, a real Kafka topic, or a memory source — which is the
portability contract the streaming surface is built on.

Register per session and read::

    spark.dataSource.register(SpoolDataSource)
    df = spark.readStream.format("spool").option("path", d).load()
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_LOG_RE = re.compile(r"^p(\d+)\.log$")
SPOOL_SCHEMA = "partition int, offset bigint, value string"


def partition_files(path: str) -> dict[int, str]:
    out = {}
    if os.path.isdir(path):
        for name in os.listdir(path):
            m = _LOG_RE.match(name)
            if m:
                out[int(m.group(1))] = os.path.join(path, name)
    return out


def append_messages(path: str, partition: int, lines: list[str]) -> None:
    """Producer helper (test/ingest side): append messages to a
    partition log. Lines must not contain newlines."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"p{partition}.log"), "a") as f:
        for ln in lines:
            f.write(ln + "\n")


def _count_lines(fp: str) -> int:
    n = 0
    with open(fp, "rb") as f:
        for _ in f:
            n += 1
    return n


class _Slice(InputPartition):
    def __init__(self, pid: int, fp: str, start: int, end: int):
        self.pid = pid
        self.fp = fp
        self.start = start
        self.end = end


def _read_slice(s: _Slice):
    with open(s.fp, "r") as f:
        for off, line in enumerate(f):
            if off >= s.end:
                break
            if off >= s.start:
                yield (s.pid, off, line.rstrip("\n"))


class _SpoolBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [
            _Slice(pid, fp, 0, _count_lines(fp))
            for pid, fp in sorted(partition_files(self.path).items())
        ]

    def read(self, partition: _Slice):
        yield from _read_slice(partition)


class _SpoolStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {str(pid): 0 for pid in partition_files(self.path)}

    def latestOffset(self) -> dict:
        return {
            str(pid): _count_lines(fp)
            for pid, fp in partition_files(self.path).items()
        }

    def partitions(self, start: dict, end: dict):
        files = partition_files(self.path)
        out = []
        for pid_s, hi in end.items():
            pid = int(pid_s)
            lo = int(start.get(pid_s, 0))  # partitions born mid-stream
            if hi > lo and pid in files:
                out.append(_Slice(pid, files[pid], lo, int(hi)))
        return out or [_Slice(-1, "", 0, 0)]  # empty batch placeholder

    def read(self, partition: _Slice):
        if partition.pid < 0:
            return iter(())
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the sink checkpoint; nothing to ack

    def stop(self) -> None:
        pass


class SpoolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spool"

    def schema(self) -> str:
        return SPOOL_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SpoolBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SpoolStreamReader(self.options)
