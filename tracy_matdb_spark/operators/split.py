"""Reproducible train/holdout/super splits (the reference's signature op).

Reference semantics (matdb/database/utility.py:42-165):
  Ntrain = ceil(N * p); Nhold = ceil((N - Ntrain) * p);
  Nsuper = N - Ntrain - Nhold (utility.py:106-110), assignment by a
  seeded shuffle (np.random.shuffle with the controller's global seed,
  database/__init__.py:1640-1642), persisted to ``<split>-ids.pkl`` so
  the exact split is reproducible (utility.py:113-126). Unsplittable
  groups go entirely to train (database/__init__.py:1414-1419).

Spark re-design: the "shuffle" is an order by a counter-based hash of
(seed, key) — deterministic at any parallelism, no RNG state. Ranks come
from the bucketed exact global rank (operators/rank.py), labels from the
ceil thresholds above. Persisting the assignment table (write to
parquet + version uuid) replaces the pkl files; re-split = new version.
Splittable=False handling is a caller-side union (label everything
'train'), same as the reference.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tracy_matdb_spark.functions.prng import hash60
from tracy_matdb_spark.operators.rank import global_rank_lazy


def split_counts(n: int, p: float) -> tuple[int, int, int]:
    """(Ntrain, Nhold, Nsuper) per matdb/database/utility.py:106-110."""
    ntrain = math.ceil(n * p)
    nhold = math.ceil((n - ntrain) * p)
    return ntrain, nhold, n - ntrain - nhold


def assign_split(
    df: DataFrame,
    key: str,
    train_perc: float,
    seed: int = 42,
    label_col: str = "label",
    single_scan: bool = False,
) -> DataFrame:
    """Add a deterministic 'train'/'holdout'/'super' label column.

    Exactly reproducible for a given (seed, key-set): assignment depends
    only on the hash order, never on partitioning or task scheduling.
    Fully lazy — the ceil thresholds are computed from the rank pass's
    own total (global_rank_lazy total_col), so labeling is ONE plan with
    no driver-side count() or collect() anywhere.

    single_scan defaults to False — the library default re-scans the
    input for the two branches, which is the safe choice at extreme
    scale (re-reading cheap pruned parquet beats storing an executor
    copy with truncated lineage; executor loss under localCheckpoint
    forces a job retry). Pass single_scan=True at call sites where the
    double scan is MEASURED to dominate (e.g. the split_assign_orders
    headline query: ~2x) — see global_rank_lazy for the full trade-off.
    """
    ranked = global_rank_lazy(
        df,
        hash60(F.lit(seed), F.col(key)),
        [key],
        out_col="__rank",
        total_col="__n",
        single_scan=single_scan,
    )
    ntrain = F.ceil(F.col("__n") * F.lit(train_perc))
    nhold = F.ceil((F.col("__n") - ntrain) * F.lit(train_perc))
    label: Column = (
        F.when(F.col("__rank") <= ntrain, F.lit("train"))
        .when(F.col("__rank") <= ntrain + nhold, F.lit("holdout"))
        .otherwise(F.lit("super"))
    )
    return ranked.withColumn(label_col, label).drop("__rank", "__n")


def oracle_split_sql(table: str, key: str, train_perc: float, seed: int = 42) -> str:
    """DuckDB SQL reproducing assign_split exactly (same hash, same ceils)."""
    h = f"(('0x' || substr(md5({seed} || '|' || {key}), 1, 15))::bigint)"
    return f"""
    WITH ranked AS (
        SELECT {key},
               row_number() OVER (ORDER BY {h}, {key}) AS rn,
               count(*) OVER () AS n
        FROM {table}
    )
    SELECT {key},
           CASE
             WHEN rn <= ceil(n * {train_perc}) THEN 'train'
             WHEN rn <= ceil(n * {train_perc}) + ceil((n - ceil(n * {train_perc})) * {train_perc}) THEN 'holdout'
             ELSE 'super'
           END AS label
    FROM ranked
    """
