"""Run-state tracking: which configurations are pending / running / done.

The reference polls the filesystem per config — `can_execute`,
`is_executing` (OUTCAR exists, mmap-scanned for completion),
`can_extract` (matdb/database/__init__.py:539-554; calculators/
vasp.py:405-446) — and `status()` counts those flags.

Engine form: no polling. The expected-config catalog LEFT JOINs the
extracted-results table (whatever the ingest job has appended); the
state is derived columnar from what exists:

    pending    no extracted row yet
    running    extracted row exists but carries no energy (the marker an
               in-flight ingest writes)
    done       extracted + converged
    failed     extracted + unconverged

One broadcast-or-shuffle join + a map-side CASE — at 100 TB the
expected side is partitioned by (database, group_name) and the join key
(config uuid) prunes to the groups being polled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_run_state(expected: DataFrame, extracted: DataFrame, key: str = "run_id") -> DataFrame:
    """Attach a `state` column to the expected-config table."""
    ext = extracted.select(
        F.col(key),
        F.col("ref_energy").alias("__energy"),
        F.col("converged").alias("__converged"),
    )
    joined = expected.join(ext, key, "left")
    state = (
        F.when(F.col("__energy").isNull() & F.col("__converged").isNull(), F.lit("pending"))
        .when(F.col("__energy").isNull(), F.lit("running"))
        .when(F.col("__converged"), F.lit("done"))
        .otherwise(F.lit("failed"))
    )
    return joined.withColumn("state", state).drop("__energy", "__converged")


def run_state_rollup(states: DataFrame) -> DataFrame:
    """status()-style conditional counts over the derived states
    (database/__init__.py:930-982)."""
    return (
        states.groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_configs"))
        .orderBy("state")
    )
