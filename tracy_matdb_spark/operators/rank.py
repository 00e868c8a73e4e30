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


def global_rank_lazy(
    df: DataFrame,
    hash_col: Column,
    tiebreak: list[str],
    out_col: str = "rank",
    n_buckets: int = 128,
    total_col: str | None = None,
) -> DataFrame:
    """Single-action variant of global_rank_by_hash: the per-bucket
    prefix sums come from a window over the (n_buckets-row) count
    aggregate instead of a driver collect, so the whole rank is ONE lazy
    plan — no driver materialization, composable inside larger plans,
    and safe under speculative re-execution. The count aggregate is a
    second (automatic) traversal of df inside the same job.

    With total_col set, every row also carries the global row count
    (free from the same aggregate) — callers needing N for thresholds
    avoid a separate count() action."""
    width = TWO60 // n_buckets
    bucketed = df.withColumn("__h", hash_col).withColumn(
        "__b", (F.col("__h") / F.lit(width)).cast("int")
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    # n_buckets rows -> the single-partition window is O(buckets), not O(rows)
    w_all = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = counts.select(
        "__b",
        (F.sum("__cnt").over(w_all) - F.col("__cnt")).alias("__offset"),
        F.sum("__cnt").over(
            Window.orderBy("__b").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    w = Window.partitionBy("__b").orderBy(F.col("__h"), *[F.col(c) for c in tiebreak])
    out = (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, F.row_number().over(w) + F.col("__offset"))
    )
    if total_col is not None:
        out = out.withColumnRenamed("__total", total_col)
        return out.drop("__h", "__b", "__offset")
    return out.drop("__h", "__b", "__offset", "__total")
