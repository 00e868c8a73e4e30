"""Active-learning append loop + iterate-until-count generation.

Reference patterns:
- `Active.add_configs` (matdb/database/active.py:158-205): each
  iteration appends newly-selected configs, deduped by content hash
  against ALL history (181-198), membership tracked per iteration.
- Enumerated's retry loop (matdb/database/enumerated.py:376-379):
  generate candidates until `nconfigs` unique survive dedupe.

Spark re-design: history is an append-only table; per-iteration dedupe
is a left_anti join on the content hash (broadcast when history's hash
set fits, shuffled hash join otherwise — Catalyst/AQE decides). The
iteration id is a column, replacing the reference's iter_*.pkl files.
Both loops are *driver* loops around distributed batches — bounded,
deterministic, and restartable from the persisted table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_configs(history: DataFrame | None, batch: DataFrame, iteration: int, uid: str = "duid") -> DataFrame:
    """Append batch to history, dropping rows whose uid already exists
    (active.py:181-198). Returns the new history."""
    batch = batch.dropDuplicates([uid]).withColumn("iteration", F.lit(iteration))
    if history is None:
        return batch
    fresh = batch.join(history.select(uid), on=uid, how="left_anti")
    return history.unionByName(fresh)


def generate_until_count(
    make_batch: Callable[[int], DataFrame],
    target: int,
    uid: str = "duid",
    max_iterations: int = 10,
) -> tuple[DataFrame, int]:
    """Bounded driver loop: generate -> anti-join dedupe -> count, until
    `target` unique rows exist (enumerated.py:376-379). Each batch must be
    deterministic in its iteration index (counter-based PRNG), so the loop
    is reproducible. Returns (history, iterations_used)."""
    history: DataFrame | None = None
    for it in range(max_iterations):
        history = add_configs(history, make_batch(it), it, uid=uid)
        # localCheckpoint truncates the growing lineage so iteration k+1
        # doesn't recompute every prior batch (driver-loop hygiene at scale).
        history = history.localCheckpoint(eager=True)
        if history.count() >= target:
            # order before truncating: a bare limit() takes a partition-
            # dependent subset, which would break reproducibility across
            # cluster sizes. (iteration, uid) is a total order here.
            return history.orderBy("iteration", uid).limit(target), it + 1
    return history, max_iterations  # type: ignore[return-value]
