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
    single_scan: bool = False,
) -> DataFrame:
    """Single-action variant of global_rank_by_hash: the per-bucket
    prefix sums come from a window over the (n_buckets-row) count
    aggregate instead of a driver collect, so the whole rank is ONE lazy
    plan — no driver materialization, composable inside larger plans,
    and safe under speculative re-execution.

    By default the count aggregate is a second (automatic) traversal of
    df inside the same job. With ``single_scan=True`` the bucketed
    projection is lazily local-checkpointed: the first stage of the job
    materializes it to executor storage (MEMORY_AND_DISK) and both the
    counts branch and the window branch read that copy, so an expensive
    upstream subquery is computed exactly once (measured ~2x on
    split_assign at sf0.1; an explicit repartition-for-ReuseExchange
    variant was tried and rejected — column pruning gives the two
    branches different projections, so the exchanges never canonicalize
    equal). Trade-offs of the checkpoint: executor storage for one full
    copy of df's pruned columns, and truncated lineage (an executor
    loss forces a job retry instead of partition recompute). For inputs
    that are already cheap pruned scans at extreme scale, prefer
    single_scan=False — re-scanning parquet can beat storing the copy.

    With total_col set, every row also carries the global row count
    (free from the same aggregate) — callers needing N for thresholds
    avoid a separate count() action."""
    width = TWO60 // n_buckets
    bucketed = df.withColumn("__h", hash_col).withColumn(
        "__b", (F.col("__h") / F.lit(width)).cast("int")
    )
    if single_scan:
        bucketed = bucketed.localCheckpoint(eager=False)
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


def _sliced_offsets(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    measure: Column,
    n_parts: int | None,
    single_scan: bool = False,
    total_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared phase 1+2 of the grouped two-phase window primitives:
    range-repartition df on (group, *order) into contiguous slices,
    then compute per-(group, slice) exclusive running totals of
    ``measure`` (count -> rank offsets; sum(x) -> prefix-sum offsets).
    Returns (sliced rows carrying __pid, broadcastable offsets).

    The offsets aggregate is O(n_parts) rows, so its per-group window
    is O(slices), not O(rows). n_parts is resolved explicitly so AQE
    never re-coalesces the two references to the exchange differently;
    slice ids (spark_partition_id) are deterministic ONLY when range
    bounds are sampled with partition-seeded RNG from a DETERMINISTIC
    scan. If ``df`` sits downstream of a shuffle (join/groupBy), its
    row order differs between the two evaluations of ``parts``, the
    sampled bounds can differ, and the offsets get mis-assigned —
    callers with post-shuffle inputs MUST pass single_scan=True so both
    branches read one materialized slicing (reproduced: ks_source_drift
    computed wrong per-source CDFs on an 8-thread session until its
    grid was single-scanned).

    single_scan lazily local-checkpoints the sliced rows so the offsets
    branch and the caller's window branch read one materialized copy
    instead of re-traversing the upstream (same trade-off as
    global_rank_lazy: executor storage + truncated lineage for one
    fewer evaluation of df). total_col additionally emits the per-GROUP
    total of ``measure`` on every offsets row — free from the same
    O(n_parts) aggregate, saving callers a separate scan+groupBy when
    they need group sizes (e.g. ntile arithmetic).
    """
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sort_cols = [F.col(c) for c in (*group_cols, *order_cols)]
    parts = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    if single_scan:
        parts = parts.localCheckpoint(eager=False)
    slice_tot = parts.groupBy(*group_cols, "__pid").agg(measure.alias("__m"))
    w_off = Window.partitionBy(*group_cols).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sel = [
        *group_cols,
        "__pid",
        (F.sum("__m").over(w_off) - F.col("__m")).alias("__offset"),
    ]
    if total_col is not None:
        sel.append(F.sum("__m").over(Window.partitionBy(*group_cols)).alias(total_col))
    offsets = slice_tot.select(*sel)
    return parts, offsets


def grouped_value_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "rank",
    n_parts: int | None = None,
    single_scan: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based rank within each group ordered by ``order_cols`` —
    the scale-safe replacement for ``row_number() OVER (PARTITION BY
    group ORDER BY value)`` when the group column has LOW cardinality
    (e.g. 3 order statuses): the naive window sorts each whole group in
    a single task, so at 100 TB every ~N/3-row group lands on one
    executor.

    Two-phase, all codegen'd built-ins:

      1. ``repartitionByRange`` on (group, *order) — Spark's sampled
         range partitioner gives each task a contiguous, balanced slice
         of the composite sort order, so one group spans many tasks;
      2. per-(group, slice) counts (O(n_parts) rows) -> per-group
         running-sum offsets, broadcast back;
      3. ``row_number()`` partitioned by (group, slice) — parallel
         windows — plus the slice offset = exact in-group rank.

    ``order_cols`` must make (group, *order) unique (include a tiebreak
    key): ranks are then deterministic and no tie can straddle a range
    boundary.

    single_scan / total_col: see _sliced_offsets — one materialized
    pass instead of two traversals, and a free per-group size column.
    """
    parts, offsets = _sliced_offsets(
        df, group_cols, order_cols, F.count(F.lit(1)), n_parts,
        single_scan=single_scan, total_col=total_col,
    )
    w = Window.partitionBy(*group_cols, "__pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        parts.join(F.broadcast(offsets), [*group_cols, "__pid"])
        .withColumn(out_col, F.row_number().over(w) + F.col("__offset"))
        .drop("__pid", "__offset")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    val_col: str,
    out_col: str = "prefix_sum",
    n_parts: int | None = None,
    single_scan: bool = False,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``val_col`` within each group in
    ``order_cols`` order — the scale-safe replacement for ``sum(x) OVER
    (PARTITION BY group ORDER BY ... ROWS UNBOUNDED PRECEDING)`` when
    the group has low cardinality (e.g. ~20 corpus sources): the naive
    window scans each whole group in one task.

    Same two-phase shape as grouped_value_rank, with per-slice SUMS as
    the offset measure: range-slice on (group, *order), broadcast the
    per-(group, slice) exclusive running totals back, add the in-slice
    running sum. ``order_cols`` must make (group, *order) unique so the
    prefix order is deterministic and ties never straddle slices.
    """
    parts, offsets = _sliced_offsets(
        df, group_cols, order_cols, F.sum(val_col), n_parts, single_scan=single_scan
    )
    w = (
        Window.partitionBy(*group_cols, "__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(offsets), [*group_cols, "__pid"])
        .withColumn(out_col, F.sum(val_col).over(w) + F.col("__offset"))
        .drop("__pid", "__offset")
    )


def grouped_kth_value(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    k_expr: str,
    out_cols: list[str] | None = None,
    n_parts: int | None = None,
    single_scan: bool = True,
) -> DataFrame:
    """Exact k-th order statistic per group — distributed selection
    WITHOUT ranking every row: only the one range slice per group that
    contains rank k is ever window-sorted.

    ``k_expr`` is a SQL expression over the per-group total ``__n``
    (e.g. ``"(__n + 1) div 2"`` for the lower median). Returns one row
    per group: group_cols + ``out_cols`` (default: order_cols) of the
    selected row, plus ``__n``.

    Why this beats a full grouped_value_rank for selection: both pay
    the same range shuffle, but rank then windows EVERY slice (a full
    parallel sort of all rows); selection reads the O(slices) offsets,
    locates the single slice where offset < k <= offset + count, and
    windows only that slice's rows — the sort work drops from O(n log
    n/slices) to O(n/slices log n/slices) per group, and with
    single_scan the other slices are never materialized twice. This is
    the classic two-round distributed median (Munro-Paterson style
    bucket selection) on top of the repo's slice machinery.

    ``order_cols`` must make (group, *order) unique (tiebreak keys), so
    k selects exactly one row deterministically."""
    if out_cols is None:
        out_cols = list(order_cols)
    parts, offsets = _sliced_offsets(
        df, group_cols, order_cols, F.count(F.lit(1)), n_parts,
        single_scan=single_scan, total_col="__n",
    )
    # target slice per group: the one whose [offset, offset+count) span
    # contains k. count is recoverable as next_offset - offset via the
    # group total on the last slice; carry it directly instead.
    target = (
        offsets.withColumn("__k", F.expr(k_expr))
        .withColumn(
            "__next",
            F.lead("__offset").over(
                Window.partitionBy(*group_cols).orderBy("__pid")
            ),
        )
        .withColumn("__hi", F.coalesce(F.col("__next"), F.col("__n")))
        .filter((F.col("__offset") < F.col("__k")) & (F.col("__k") <= F.col("__hi")))
        .select(*group_cols, "__pid", "__offset", "__k", "__n")
    )
    w = Window.partitionBy(*group_cols, "__pid").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        parts.join(F.broadcast(target), [*group_cols, "__pid"])
        .withColumn("__rk", F.row_number().over(w) + F.col("__offset"))
        .filter(F.col("__rk") == F.col("__k"))
        .select(*group_cols, *out_cols, "__n")
    )


def per_group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    tiebreak: list[str],
    k: int,
    shard_on: str,
    n_shards: int = 8,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-k per group without a single-task-per-group sort.

    A naive ``row_number() OVER (PARTITION BY group)`` gives each group
    ONE task — with a handful of queries against a 100 TB corpus that
    is Q tasks sorting N rows each. Two phases instead, both built-in
    window ops:

      1. shard each group's rows by hash(shard_on) into n_shards
         sub-partitions and keep the local top-k of each — parallel
         Q*n_shards tasks over N/n_shards rows, discarding all but
         Q*n_shards*k rows;
      2. exact rank over the survivors per group — the single-task
         window now touches <= n_shards*k rows per group.

    Phase 1 cannot lose a global top-k row (a row in the global top-k
    of its group is in the top-k of any subset containing it), so the
    result is exactly the naive window's. order_cols are Columns (may
    carry .desc()); tiebreak are column NAMES appended ascending for
    determinism."""
    order = [*order_cols, *[F.col(c) for c in tiebreak]]
    w1 = Window.partitionBy(*group_cols, "__shard").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__shard", F.pmod(F.xxhash64(F.col(shard_on)), F.lit(n_shards)))
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__shard", "__r1")
        .withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
