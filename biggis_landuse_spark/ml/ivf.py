"""Trained IVF codebooks: pyspark.ml KMeans over the embedding column.

The oracle-checked IVF query (queries/similarity.py::ann_ivf_topk)
uses a deterministic codebook so DuckDB can replay it; production ANN
at 100 TB trains the codebook. This module supplies that path: KMeans
(Lloyd's, seeded) over a sampled slice of the corpus → centroid
DataFrame in the exact shape ``functions.similarity.ivf_assign`` /
``ivf_topk`` consume, so the scale path (cell equi-join, n_probe cell
fan-out) is identical whichever codebook is used.

Scale notes: train on a deterministic hash sample (a few million rows
bounds KMeans cost regardless of corpus size); k chosen ~sqrt(N) so
cells average sqrt(N) vectors — the classic IVF balance between probe
fan-out and cell scan size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggis_landuse_spark.functions.similarity import as_double


def train_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Train a k-cell IVF codebook; returns (cid, cv) centroid rows.

    ``sample_fraction`` (deterministic content-hash sample on the
    vector bytes, not rand()) caps the training-set size; None trains
    on the full corpus (fine at test scale, not at 100 TB).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(as_double(vec_col).alias("_arr"))
    if sample_fraction is not None:
        n_buckets = max(1, int(round(1.0 / sample_fraction)))
        vecs = vecs.where(
            F.pmod(
                F.abs(F.hash(F.col("_arr").cast("string"))), F.lit(n_buckets)
            )
            == 0
        )
    train = vecs.select(array_to_vector("_arr").alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(train)
    centers = model.clusterCenters()
    from biggis_landuse_spark.session import local_df

    spark = corpus.sparkSession
    # model-sized relation via the Arrow local-relation path (r10:
    # a python-list DF costs ~0.5-0.7 s of worker round-trips per job)
    return local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cid int, cv array<double>",
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int,
    vec_col: str = "embedding",
    ncode: int = 16,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Train per-subspace PQ codebooks; returns (s, c, cv) rows in the
    shape ``functions.similarity.pq_encode`` / ``pq_topk`` consume.

    One seeded KMeans per subspace over that subspace's slice of the
    (optionally hash-sampled) corpus — m is a small constant (4-16),
    so the driver-side loop is m bounded Spark jobs, exactly how
    OPQ/IVFPQ trainers run in production. Swapping these for the
    deterministic first-N codebooks changes recall, not plumbing.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(as_double(vec_col).alias("_arr"))
    if sample_fraction is not None:
        n_buckets = max(1, int(round(1.0 / sample_fraction)))
        vecs = vecs.where(
            F.pmod(
                F.abs(F.hash(F.col("_arr").cast("string"))), F.lit(n_buckets)
            )
            == 0
        )
    dsub = F.floor(F.size("_arr") / m).cast("int")
    rows = []
    for s in range(m):
        sub = vecs.select(
            F.slice("_arr", F.lit(s) * dsub + 1, dsub).alias("_sv")
        )
        train = sub.select(array_to_vector("_sv").alias("features"))
        model = KMeans(k=ncode, seed=seed + s, maxIter=max_iter).fit(train)
        for c, center in enumerate(model.clusterCenters()):
            rows.append((s, c, [float(x) for x in center]))
    from biggis_landuse_spark.session import local_df

    return local_df(
        corpus.sparkSession, rows, "s int, c int, cv array<double>"
    )
