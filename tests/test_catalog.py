"""The per-session relation cache in catalog.load (r14 optimization).

The cache must be METADATA-only reuse of the analyzed relation: same
session + same file (path, mtime_ns, size) -> same DataFrame object
(skipping repeated listing/schema-inference), while a REWRITTEN file
must produce a fresh relation that sees the new bytes — the invariant
that separates a catalog from result caching. Directory tables bypass
the cache (their file set can change without touching the dir inode).
"""

from __future__ import annotations

import os

from tracy_matdb_spark.catalog import _relation, load

SF_SMOKE = "/root/testdata/sf0.001"


def test_same_file_resolves_to_same_relation(spark):
    a = load(spark, SF_SMOKE, ("orders",))["orders"]
    b = load(spark, SF_SMOKE, ("orders",))["orders"]
    assert a is b  # second resolution reused the session's relation


def test_rewritten_file_invalidates_and_new_rows_are_visible(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(5).toDF("id").coalesce(1).write.mode("overwrite").parquet(p)
    # single part-file inside a directory -> directory path bypasses the
    # cache; exercise the single-file path the testdata tables use
    part = [e for e in os.listdir(p) if e.endswith(".parquet")][0]
    f = str(tmp_path / "single.parquet")
    os.rename(os.path.join(p, part), f)

    a = _relation(spark, f)
    assert a is _relation(spark, f)
    assert a.count() == 5

    spark.range(9).toDF("id").coalesce(1).write.mode("overwrite").parquet(p)
    part = [e for e in os.listdir(p) if e.endswith(".parquet")][0]
    os.replace(os.path.join(p, part), f)

    b = _relation(spark, f)
    assert b is not a  # (mtime_ns, size) changed -> fresh relation
    assert b.count() == 9  # and it reads the new bytes


def test_directory_tables_bypass_the_cache(spark, tmp_path):
    p = str(tmp_path / "d.parquet")
    spark.range(3).toDF("id").write.mode("overwrite").parquet(p)
    a = _relation(spark, p)
    b = _relation(spark, p)
    assert a is not b


def test_cached_relation_results_match_fresh_read(spark):
    cached = load(spark, SF_SMOKE, ("orders",))["orders"]
    fresh = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    assert cached.schema == fresh.schema
    assert cached.count() == fresh.count()
    got = {r["o_orderkey"] for r in cached.orderBy("o_orderkey").limit(50).collect()}
    want = {r["o_orderkey"] for r in fresh.orderBy("o_orderkey").limit(50).collect()}
    assert got == want
