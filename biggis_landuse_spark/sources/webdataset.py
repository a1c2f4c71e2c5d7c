"""WebDataset-style tar-shard sink/source for multimodal training data.

The de-facto layout large image/audio training pipelines consume
(the public WebDataset convention: a dataset is a set of ``.tar``
shards; each sample is a group of files sharing a basename —
``000042.jpg`` + ``000042.json`` — read sequentially for throughput).

Spark-first realization:

- ``write_webdataset``: rows (key, payload, meta) → one tar shard per
  Spark partition, written EXECUTOR-side with ``mapInPandas`` (the
  per-tile GeoTIFF export discipline — payloads never cross the
  driver; the returned manifest DataFrame carries shard paths +
  counts, driver traffic is shard-count-sized). Repartition upstream
  to choose the shard size; sample order inside a shard follows the
  partition's row order, so sort upstream for deterministic shards.
- ``read_webdataset``: shard files → (shard, key, payload, meta) rows
  via ``spark.read.format("binaryFile")`` + an executor-side untar —
  one task per shard, the same parallelism the files give any
  WebDataset loader.

Tar entries are written with zeroed mtime/uid/gid so identical inputs
produce byte-identical shards (reproducible builds).
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard string, n_samples long, n_bytes long"
SAMPLE_SCHEMA = "shard string, key string, payload binary, meta string"


def _clean_tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    return ti


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    payload_col: str = "payload",
    meta_col: str | None = "meta",
    ext: str = "bin",
) -> DataFrame:
    """Write (key, payload[, meta]) rows as WebDataset tar shards,
    one shard per Spark partition, named ``shard-{partition:05d}.tar``.

    Returns the manifest DataFrame (shard, n_samples, n_bytes) —
    materialize it (e.g. ``.collect()``) to execute the write.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    os.makedirs(path, exist_ok=True)
    cols = [key_col, payload_col] + ([meta_col] if meta_col else [])
    flat = df.select(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        tar = tarfile.open(fileobj=buf, mode="w")
        n = 0
        pid = None
        for pdf in batches:
            metas = pdf[meta_col] if meta_col else [None] * len(pdf)
            for key, payload, meta, pid_v in zip(
                pdf[key_col], pdf[payload_col], metas, pdf["_pid"]
            ):
                pid = int(pid_v)
                key = str(key)
                payload = bytes(payload) if payload is not None else b""
                tar.addfile(
                    _clean_tarinfo(f"{key}.{ext}", len(payload)),
                    io.BytesIO(payload),
                )
                if meta_col:
                    mb = ("" if meta is None else str(meta)).encode()
                    tar.addfile(
                        _clean_tarinfo(f"{key}.json", len(mb)),
                        io.BytesIO(mb),
                    )
                n += 1
        tar.close()
        if n == 0:
            yield pd.DataFrame(
                {"shard": [], "n_samples": [], "n_bytes": []}
            )
            return
        shard = os.path.join(path, f"shard-{pid:05d}.tar")
        data = buf.getvalue()
        with open(shard, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            {"shard": [shard], "n_samples": [n], "n_bytes": [len(data)]}
        )

    return flat.mapInPandas(run, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset shards back into (shard, key, payload, meta)
    rows: one binaryFile row per shard, untarred executor-side —
    sample grouping follows the shared-basename convention."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    shards = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select(F.col("path").alias("shard"), "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"shard": [], "key": [], "payload": [], "meta": []}
            for r in pdf.itertuples(index=False):
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(r.content))) as tar:
                    for m in tar.getmembers():
                        stem, dot, suffix = m.name.rpartition(".")
                        blob = tar.extractfile(m).read()
                        entry = samples.setdefault(
                            stem, {"payload": None, "meta": None}
                        )
                        if suffix == "json":
                            entry["meta"] = blob.decode()
                        else:
                            entry["payload"] = blob
                for key in sorted(samples):
                    out["shard"].append(r.shard)
                    out["key"].append(key)
                    out["payload"].append(samples[key]["payload"])
                    out["meta"].append(samples[key]["meta"])
            yield pd.DataFrame(out)

    return shards.mapInPandas(run, SAMPLE_SCHEMA)
