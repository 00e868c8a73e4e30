"""Skew-safe aggregation: explicit two-stage salted rollups.

The reference never aggregates at a scale where key skew matters (its
rollups are per-group counts over folders, database/__init__.py:930-982).
At 100 TB a `groupBy(hot_key)` can put one key's entire volume on one
reducer. AQE rebalances *joins* on skew, but an aggregation over a hot
key still funnels every pre-aggregated partial for that key to a single
task — usually fine (partials are small), EXCEPT when the per-key state
is wide (collect_list/collect_set, exact distinct sets, large sketches).

`salted_agg` shards each key into `n_salts` sub-keys derived from a
*data* column (deterministic — no rand(), so retries/speculative tasks
reproduce the same shards), runs the wide stage-1 aggregation per
(key, salt), then merges the bounded per-shard partials in stage 2.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    shard_on: str,
    stage1: list[Column],
    stage2: Callable[[DataFrame], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: stage1 aggs run per (keys..., salt) where
    salt = hash(shard_on) % n_salts; stage2 merges shard partials per keys.

    stage1 columns must be *mergeable* (their stage-2 combiner exists):
    count -> sum, sum -> sum, min -> min, collect_set -> flatten+distinct.
    The caller supplies the stage-2 exprs via `stage2(sharded_df)`.
    """
    salt = (F.xxhash64(F.col(shard_on)) % n_salts + n_salts) % n_salts
    sharded = (
        df.withColumn("__salt", salt.cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*stage1)
    )
    return sharded.groupBy(*keys).agg(*stage2(sharded))
