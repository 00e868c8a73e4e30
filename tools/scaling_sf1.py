"""sf0.1 -> sf1 scaling spot-check for the worst sf0.01 -> sf0.1 ratios.

One decade of scaling evidence (tools/scaling_check.py) is thin support
for 100 TB design claims; this adds a second decade for the queries with
the worst small-decade ratios (round-7 verdict item #1):
entity_resolution_pairs, minhash_lsh_pairs, pagerank_bipartite.

The sf1 dataset is derived deterministically from the driver's read-only
sf0.1 tables by tools/make_sf1.py (10x key-shifted replication; document
text token-suffixed per copy so near-dup structure scales linearly, not
quadratically — see that tool's docstring). Copy 0 is byte-identical to
driver sf0.1, so t(sf1)/t(driver sf0.1) is an honest 10x-data ratio.

Times use the same warm best-of-2 protocol as scaling_check; results are
merged into SCALING.json under the "sf1" key (scaling_check preserves it
on rewrite). Flags ratio > 12 — linear-in-data is 10x at this decade
(both sides are past the fixed-overhead floor, unlike the small decade
whose threshold is 25).

Usage:
    python tools/make_sf1.py          # once (~10 s, ~160 MB, gitignored)
    python tools/scaling_sf1.py       # updates SCALING.json["sf1"]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_check import _warm_time

# The small-decade RATIO_THRESHOLD (25) is calibrated for sf0.01 ->
# sf0.1 where per-query fixed overhead dominates the small side and
# inflates honest ratios. At sf0.1 -> sf1 both sides are past the
# overhead floor, so linear-in-data is ~10x and anything much above it
# is a real super-linear smell: flag at 12 (10x data + noise headroom).
RATIO_THRESHOLD = 12.0

from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.session import get_session

SMALL = "/root/testdata/sf0.1"
LARGE = "/root/repo/.localdata/sf1"
# The three worst small-decade ratios (the round-7 verdict item), then a
# broad slice of the headline set — one per plan family — so the second
# decade covers scan-agg, dim-join, window, text-pipeline, windowed-hash,
# streaming-adjacent, exact-dedup and brute-force kNN shapes, not just
# the three outliers. make_sf1 generates every table these read.
QUERIES = [
    "entity_resolution_pairs",
    "minhash_lsh_pairs",
    "pagerank_bipartite",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "orders_rolling_7d_revenue",
    "events_tumbling_1h",
    "corpus_e2e_rollup",
    "corpus_export_manifest",
    "exact_substring_spans",
    "dedup_exact",
    "knn_embeddings",
    "knn_pq_embeddings",
    "maxsim_late_interaction",
    # round-9 batch serving shapes: one corpus pass per query batch
    "knn_batch_embeddings",
    "maxsim_batch_late_interaction",
    "hybrid_rrf_batch",
]


def run() -> dict:
    if not os.path.exists(os.path.join(LARGE, "lineitem.parquet")):
        raise SystemExit("scaling_sf1: run tools/make_sf1.py first")
    registry = load_all()
    spark = get_session("scaling_sf1")
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    for name in QUERIES:
        fn = registry[name].fn
        t_small = _warm_time(spark, fn, SMALL)
        t_large = _warm_time(spark, fn, LARGE)
        ratio = round(t_large / max(t_small, 1e-9), 2)
        rows[name] = {
            "sec_sf0.1": round(t_small, 3),
            "sec_sf1": round(t_large, 3),
            "ratio": ratio,
            "flagged": ratio > RATIO_THRESHOLD,
        }
        if ratio > RATIO_THRESHOLD:
            flagged.append(name)
        print(f"{name}: {rows[name]}", flush=True)

    # streaming ingest is bench-special (it builds its own availableNow
    # micro-batch fixture from the events table), so it doesn't go
    # through the registry; time it with the same warm best-of-2.
    from tracy_matdb_spark.streaming.ingest import streaming_ingest_bench

    def _stream_time(sf_dir: str) -> float:
        streaming_ingest_bench(spark, sf_dir)  # warmup
        return min(
            streaming_ingest_bench(spark, sf_dir)["sec"] for _ in range(2)
        )

    t_small = _stream_time(SMALL)
    t_large = _stream_time(LARGE)
    ratio = round(t_large / max(t_small, 1e-9), 2)
    rows["streaming_incremental_dedup"] = {
        "sec_sf0.1": round(t_small, 3),
        "sec_sf1": round(t_large, 3),
        "ratio": ratio,
        "flagged": ratio > RATIO_THRESHOLD,
    }
    if ratio > RATIO_THRESHOLD:
        flagged.append("streaming_incremental_dedup")
    print(f"streaming_incremental_dedup: {rows['streaming_incremental_dedup']}", flush=True)
    spark.stop()
    return {
        "metric": "scaling_ratio_sf0.1_to_sf1",
        "data_ratio": 10.0,
        "dataset": "tools/make_sf1.py 10x key-shifted replication of driver sf0.1",
        "queries": rows,
        "flagged": flagged,
    }


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.json")
    result = run()
    try:
        with open(path) as fh:
            full = json.load(fh)
    except (OSError, ValueError):
        full = {}
    full["sf1"] = result
    with open(path, "w") as fh:
        json.dump(full, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"sf1_flagged": result["flagged"]}))
    if result["flagged"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
