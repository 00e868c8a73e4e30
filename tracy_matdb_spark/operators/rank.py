"""Distributed exact global rank (the scale-safe primitive under splits).

A naive ``row_number() OVER (ORDER BY ...)`` collapses to a single
partition — fine at test scale, a wall at 100 TB. This implements the
classic two-phase exact rank entirely with built-in (codegen'd) ops:

  1. bucket each row by the high bits of its (uniform) 60-bit hash key;
  2. aggregate per-bucket counts (tiny: B rows), prefix-sum them on the
     driver, broadcast-join the offsets back;
  3. row_number() partitioned BY BUCKET (parallel windows) + offset.

Because the bucket key is a prefix of the sort key, bucket order equals
global order, so ``offset[bucket] + local_rank`` is the exact global
rank. Uniform hashing keeps buckets balanced (no skew by construction).
The bucket-count pass also yields the total row count for free — callers
that need N (e.g. split thresholds) take it from here instead of a
second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO60 = 2**60


def bucketize(df: DataFrame, hash_col: Column, n_buckets: int = 128) -> tuple[DataFrame, dict[int, int]]:
    """Attach __h/__b columns and return per-bucket counts (one agg job)."""
    width = TWO60 // n_buckets
    df = df.withColumn("__h", hash_col).withColumn("__b", (F.col("__h") / F.lit(width)).cast("int"))
    counts = {r["__b"]: r["cnt"] for r in df.groupBy("__b").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    return df, counts


def ranked_from_buckets(df: DataFrame, counts: dict[int, int], tiebreak: list[str], out_col: str) -> DataFrame:
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_df = df.sparkSession.createDataFrame(
        [(b, o) for b, o in offsets.items()] or [(0, 0)], "__b int, __offset bigint"
    )
    w = Window.partitionBy("__b").orderBy(F.col("__h"), *[F.col(c) for c in tiebreak])
    return (
        df.join(F.broadcast(offset_df), "__b")
        .withColumn(out_col, F.row_number().over(w) + F.col("__offset"))
        .drop("__h", "__b", "__offset")
    )


def global_rank_by_hash(
    df: DataFrame,
    hash_col: Column,
    tiebreak: list[str],
    out_col: str = "rank",
    n_buckets: int = 128,
) -> DataFrame:
    """Add exact 1-based global rank ordered by (hash_col, *tiebreak).

    hash_col must be a uniform BIGINT in [0, 2^60) (see functions.prng.hash60).
    """
    bucketed, counts = bucketize(df, hash_col, n_buckets)
    return ranked_from_buckets(bucketed, counts, tiebreak, out_col)
