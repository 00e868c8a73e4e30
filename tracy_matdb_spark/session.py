"""SparkSession factory with deterministic, oracle-friendly settings.

The reference (matdb) is a single-process Python dataflow; its only
"session" is the Controller object (reference: matdb/database/__init__.py:1585).
Here the session is a real SparkSession tuned for the driver protocol:
UTC timestamps (duckdb oracle parity), AQE on (runtime re-plan, skew
join), Arrow on (fast pandas interchange), shuffle partitions sized to
the local core count rather than the 200 default.

At cluster scale the same factory applies — only master/memory change;
`spark.sql.shuffle.partitions` should track executor-core totals or be
left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "tracy_matdb_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
