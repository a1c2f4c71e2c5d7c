"""Skew-handling primitives for hot keys (SURVEY.md §7.5.5).

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins automatically; these helpers cover the two cases AQE cannot:

- ``salted_join``: a shuffled equi-join where one key dominates (the
  polygon-rasterization pattern — features concentrate on few tiles,
  RasterizeFeaturesRDD.scala:44-45). The big side gets a deterministic
  salt derived from its own row content; the small side is replicated
  ``n_salt`` times; the join key becomes (key, salt), spreading the
  hot key across ``n_salt`` reducers. Replication multiplies the
  small side, so use for genuinely small/medium right sides.
- ``salted_distinct_count``: exact COUNT(DISTINCT v) per key where one
  key holds a huge value set. Plain groupBy(key).agg(countDistinct)
  routes every value of the hot key through one reducer; salting on
  hash(value) makes phase 1 distinct-count per (key, salt) — each
  reducer sees 1/n of the values, and because the salt partitions by
  VALUE, per-salt distinct counts sum exactly.

Both are deterministic (salts are hashes of data, never rand()), so
results are reproducible run-to-run and against oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 32,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key spread: big rows are salted by a hash
    of ``salt_cols`` (default: all non-key columns), small rows are
    replicated across every salt. Result equals
    ``big.join(small, on, how)`` row-for-row for the supported join
    types: inner / left / left_semi / left_anti (every big row carries
    exactly one salt, and each small row meets each big row exactly
    once because salts are disjoint).

    right / full outer are intentionally rejected: the small side is
    replicated ``n_salt`` times, so an unmatched small row would emit
    ``n_salt`` duplicate null-extended rows instead of one.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated small side would duplicate unmatched right rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = salt_cols or [c for c in big.columns if c not in keys]
    if not salt_cols:
        raise ValueError("big side needs at least one non-key column to salt on")
    b = big.withColumn("_salt", _salt(salt_cols, n_salt))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")),
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key: str | list[str],
    value: str,
    n_salt: int = 32,
) -> DataFrame:
    """Exact distinct-value count per key, skew-safe: phase 1 counts
    distinct values within (key, hash(value) % n_salt); phase 2 sums.
    The value-hash salt means no distinct value spans two salts, so
    the per-salt counts add up exactly.

    Returns (key cols..., n_distinct).
    """
    keys = [key] if isinstance(key, str) else list(key)
    phase1 = (
        df.withColumn("_salt", _salt([value], n_salt))
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(value)).alias("_n"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_n").cast("long").alias("n_distinct")
    )
