"""Bucketed co-located join: SortMergeJoin with no Exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.operators.bucketing import drop_table, write_bucketed


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = load(spark, SF_SMOKE, ("orders", "lineitem"))
    write_bucketed(
        t["orders"].select("o_orderkey", "o_totalprice"),
        str(tmp_path / "b_orders"),
        "b_orders",
        "o_orderkey",
        8,
    )
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_quantity"),
        str(tmp_path / "b_lineitem"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        # sanity: the join actually returns the right cardinality
        assert j.count() == t["lineitem"].count()

        # control: the same join on the unbucketed parquet MUST shuffle —
        # proves the Exchange elision came from bucketing, not the data size
        ctrl = t["orders"].select("o_orderkey").join(
            t["lineitem"].select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert "Exchange" in _formatted_plan(ctrl)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_table(spark, "b_orders")
        drop_table(spark, "b_lineitem")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from tracy_matdb_spark.operators.bucketing import write_partitioned

    docs = load(spark, SF_SMOKE, ("documents",))["documents"]
    path = str(tmp_path / "p_docs")
    write_partitioned(docs, path, "source")
    back = spark.read.parquet(path).filter(F.col("source") == "src1")
    plan = _formatted_plan(back)
    # the source filter must be resolved at directory-metadata level —
    # a partition filter, not a data filter evaluated per row
    assert "PartitionFilters" in plan and "src1" in plan.split("PartitionFilters")[1].split("]")[0]
    want = docs.filter(F.col("source") == "src1").count()
    assert back.count() == want
