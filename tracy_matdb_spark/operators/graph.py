"""Distributed connected components (min-label propagation).

The reference dedupes by exact content hash only (uid sets,
e.g. matdb/database/substitution.py:265-278); near-duplicate *clusters*
have no reference counterpart but are the end-game of any LSH dedup
pipeline at scale: candidate pairs -> similarity-verified edges ->
connected components -> keep one canonical doc per component.

Algorithm: iterative hash-to-min label propagation. Every node starts
labeled with itself; each round every node takes the min label over
itself and its neighbors. Labels are monotonically non-increasing, so
the fixpoint test is "sum(label) unchanged" — one tiny aggregate per
round instead of a changed-row join. Rounds needed = graph diameter;
near-dup components are small and dense (diameter 2-4 in practice), so
3-5 rounds close real corpora. Each round is one shuffle keyed on node
id — linear in |E|, no quadratic stage — and `localCheckpoint`
truncates lineage so plans don't grow with iterations (same pattern as
operators/active.py's iterate-until-count loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(nodes, undirected edges) -> (id, component) where component is
    the min node id reachable from id. Nodes absent from every edge keep
    themselves as component. Deterministic for a given graph regardless
    of partitioning — min is order-independent."""
    und = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(F.col(node_col).alias("id"), F.col(node_col).alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        labels = labels.localCheckpoint(eager=True)
        cur = labels.agg(F.sum("label")).collect()[0][0]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
        msgs = und.join(labels, und.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        labels = labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
    return labels.select("id", F.col("label").alias("component"))
