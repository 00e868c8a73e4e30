"""sf1 -> sf10 (third decade) scaling spot-check for the near-linear
text queries.

The round-8 verdict flagged `exact_substring_spans` (7.41x) and
`corpus_e2e_rollup` (6.91x) as close-to-linear at sf0.1 -> sf1 while
the sf1 corpus (~160 MB) is entirely page-cached — thin evidence at the
decade where memory pressure starts to matter. This adds the third
decade for exactly those queries on a documents-only dataset
(tools/make_sf1.py --sf10-documents): 100 fixed-width token-suffixed
copies of the driver sf0.1 documents (~50k -> 500k docs), compared
against the structurally identical 10-copy corpus (sf1d) built by the
same generator — per-copy byte-identical text on both sides, so the
ratio is a pure 10x-rows effect.

Merged into SCALING.json under "sf10_documents" (scaling_check
preserves foreign keys on rewrite). Flag threshold matches the sf1
block: 12 (linear is 10x at this decade).

Usage:
    python tools/make_sf1.py --sf10-documents   # once (~2 min, gitignored)
    python tools/scaling_sf10.py                # updates SCALING.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_check import _warm_time  # noqa: E402
from tools.scaling_io import merge_scaling_block, read_scaling  # noqa: E402
from tracy_matdb_spark.queries import load_all  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402

SMALL = "/root/repo/.localdata/sf1d"
LARGE = "/root/repo/.localdata/sf10"
RATIO_THRESHOLD = 12.0
# The LSH-verify family joined the list after the sweep
# (tools/stress_sf10.py) caught its plan-time broadcast of the
# 3.7 GiB shingle table (now gated, see queries/llm.py
# LSH_VERIFY_BCAST_MAX_DOCS). Run with SPARK_GRAFT_DRIVER_MEM=24g:
# the 45M-shingle sf10 working set needs the cluster-profile heap
# (cluster_conf ships 48g executors); the 8g local default is the
# single-JVM ceiling, not a plan property.
QUERIES = [
    "exact_substring_spans",
    "corpus_e2e_rollup",
    "ngram_jaccard_pairs",
    "dedup_keep_best",
    # r12: the other two near-dup pipelines (banded simhash self-join;
    # minhash band LSH) — both newly behind gated_local_checkpoint, so
    # the decades measure the recompute-above-gate path where it fires
    "simhash_near_dup",
    "minhash_lsh_pairs",
    # r12 drift & monitoring family (documents-only inputs): the KS
    # grid is |distinct n_chars| x |sources| — must stay flat as docs
    # grow; chi2's cell table tracks vocab (which the token-suffixed
    # copies multiply); novelty's shingle agg tracks the corpus
    "ks_source_drift",
    "psi_source_drift",
    "chi2_term_source",
    "ngram_novelty_curve",
]

# --full mode (round-10): the join/events/ANN families, which had NO
# third-decade evidence while sf10 was documents-only — and the spans
# OOM proved that class of bug only shows up there. Small side is the
# full-schema sf1 (tools/make_sf1.py), large the full-schema sf10
# (tools/make_sf1.py --sf10-full): 10x rows on every table.
SF1_FULL = "/root/repo/.localdata/sf1"
QUERIES_FULL = [
    "q5_local_supplier_volume",  # multi-dim broadcast join chain
    "q18_large_volume_customers",  # large-agg semi join
    "q21_sole_returning_supplier",  # multi-self-join on lineitem
    "entity_resolution_pairs",  # blocking join (block-skew hazard)
    "events_salted_type_join",  # salted hot-key join
    "events_session_10m",  # session windowing over 10M events
    "knn_pq_embeddings",  # ADC scan at 200k vectors (PQ at corpus scale)
    "knn_batch_embeddings",  # batched brute-force corpus pass
    "pagerank_bipartite",  # iterative fixed-point over the 15M-order graph
    "triangle_part_graph",  # wedge-join graph analytics at 60M lineitem
    # the widened-LSH gate fires for real here (200k vectors -> extra
    # band bits): track the linear-candidates behavior as a ratio, not
    # a one-off STRESS_SF10 note (round-10 verdict item #6)
    "embedding_lsh_near_dup",
]

# Typed-state streaming rows carry STATE TELEMETRY alongside wall time:
# occupied state rows at each decade, so "state scales with near-dup
# structure / key count, not stream length" (streaming_lsh_first_seen's
# docstring claim) is a measured fact (round-10 verdict item #5).
QUERIES_TWS = [
    "streaming_minhash_dedup_tws",  # per-bucket ValueState across 3 resumed runs
    "events_stateful_totals_tws",  # per-user typed state over 10M events
    # r13: the streaming drift monitor's watermarked tumbling agg —
    # its "state = live windows x types, not stream length" docstring
    # claim needs the same measured state_rows rows at 10M events as
    # every other streaming query (r12 verdict item #1); the events
    # time axis is fixed across decades, so state_rows should stay
    # FLAT while rows grow 10x
    "events_type_psi_stream",
]


def _load1() -> float:
    """1-min load average, recorded per block so a noisy-box artifact is
    distinguishable from a quiet one without a rerun (the r12
    fourth-decade text block was box-confounded for exactly this lack)."""
    try:
        return round(os.getloadavg()[0], 2)
    except Exception:  # noqa: BLE001
        return -1.0


def run() -> dict:
    for d in (SMALL, LARGE):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            raise SystemExit("scaling_sf10: run tools/make_sf1.py --sf10-documents first")
    load1 = _load1()
    registry = load_all()
    spark = get_session("scaling_sf10")
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    for name in QUERIES:
        fn = registry[name].fn
        t_small = _warm_time(spark, fn, SMALL)
        t_large = _warm_time(spark, fn, LARGE)
        ratio = round(t_large / max(t_small, 1e-9), 2)
        rows[name] = {
            "sec_sf1d": round(t_small, 3),
            "sec_sf10": round(t_large, 3),
            "ratio": ratio,
            "flagged": ratio > RATIO_THRESHOLD,
        }
        if ratio > RATIO_THRESHOLD:
            flagged.append(name)
        print(f"{name}: {rows[name]}", flush=True)
    spark.stop()
    return {
        "metric": "scaling_ratio_sf1_to_sf10_documents",
        "data_ratio": 10.0,
        "dataset": "tools/make_sf1.py --sf10-documents (100 vs 10 fixed-width "
        "token-suffixed copies of driver sf0.1 documents)",
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "load1_start": load1,
        "queries": rows,
        "flagged": flagged,
    }


def run_sf100(only: list[str] | None = None) -> dict:
    """FOURTH decade for the text family: 500k vs 5M documents (100 vs
    1000 width-3 token-suffixed copies, tools/make_sf1.py
    --sf100-documents). The sf10-documents block proved the 2nd->3rd
    decade; this is the decade where the working set (~2.5 GB text,
    ~450M shingles for the n-gram family) decisively exceeds any
    single-executor memory slice, so a quadratic candidate set or an
    ungated broadcast fails hard instead of hiding in page cache.

    ``only`` re-measures a subset of QUERIES for a targeted refresh
    after an engine change — main() merges the rows into the existing
    block instead of replacing it (same contract as --full --only)."""
    small, large = "/root/repo/.localdata/sf10dw3", "/root/repo/.localdata/sf100d"
    for d in (small, large):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            raise SystemExit(
                "scaling_sf10 --sf100: run tools/make_sf1.py --sf100-documents first"
            )
    load1 = _load1()
    registry = load_all()
    spark = get_session("scaling_sf100")
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    for name in only if only is not None else QUERIES:
        fn = registry[name].fn
        t_small = _warm_time(spark, fn, small)
        t_large = _warm_time(spark, fn, large)
        ratio = round(t_large / max(t_small, 1e-9), 2)
        rows[name] = {
            "sec_sf10w3": round(t_small, 3),
            "sec_sf100": round(t_large, 3),
            "ratio": ratio,
            "flagged": ratio > RATIO_THRESHOLD,
        }
        if ratio > RATIO_THRESHOLD:
            flagged.append(name)
        print(f"{name}: {rows[name]}", flush=True)
    spark.stop()
    return {
        "metric": "scaling_ratio_sf10_to_sf100_documents",
        "data_ratio": 10.0,
        "dataset": "tools/make_sf1.py --sf100-documents (1000 vs 100 width-3 "
        "token-suffixed copies of driver sf0.1 documents)",
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "load1_start": load1,
        "queries": rows,
        "flagged": flagged,
    }


def run_full(only: list[str] | None = None) -> dict:
    """Third decade for the join/events/ANN families over the FULL
    star schema: sf1 (10 copies of driver sf0.1) vs sf10 (100 copies),
    both from the same key-shift generator — a pure 10x-rows ratio on
    every table at once, the regime where a join-side broadcast or a
    skewed shuffle actually breaks.

    ``only`` re-measures a subset of QUERIES_FULL (skipping the TWS /
    telemetry / streaming extras) for a targeted refresh after a
    dataset-generator fix — main() merges the rows into the existing
    block instead of replacing it."""
    for d, t in ((SF1_FULL, "lineitem"), (LARGE, "lineitem")):
        if not os.path.exists(os.path.join(d, f"{t}.parquet")):
            raise SystemExit(
                "scaling_sf10 --full: run tools/make_sf1.py and "
                "tools/make_sf1.py --sf10-full first"
            )
    load1 = _load1()
    registry = load_all()
    spark = get_session("scaling_sf10_full")
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    # streaming_incremental_dedup is measured through its own fixture
    # (streaming_ingest_bench), not registry[name].fn — accept it in
    # --only by routing it to the same fixture the full run uses
    only_stream = only is not None and "streaming_incremental_dedup" in only
    if only_stream:
        only = [n for n in only if n != "streaming_incremental_dedup"]
    for name in only if only is not None else QUERIES_FULL:
        fn = registry[name].fn
        t_small = _warm_time(spark, fn, SF1_FULL)
        t_large = _warm_time(spark, fn, LARGE)
        ratio = round(t_large / max(t_small, 1e-9), 2)
        rows[name] = {
            "sec_sf1": round(t_small, 3),
            "sec_sf10": round(t_large, 3),
            "ratio": ratio,
            "flagged": ratio > RATIO_THRESHOLD,
        }
        if ratio > RATIO_THRESHOLD:
            flagged.append(name)
        print(f"{name}: {rows[name]}", flush=True)
    if only is not None:
        if only_stream:
            from tracy_matdb_spark.streaming.ingest import streaming_ingest_bench

            def _stream_time_only(sf_dir: str) -> float:
                streaming_ingest_bench(spark, sf_dir)  # warmup
                return min(
                    streaming_ingest_bench(spark, sf_dir)["sec"] for _ in range(2)
                )

            t_small = _stream_time_only(SF1_FULL)
            t_large = _stream_time_only(LARGE)
            ratio = round(t_large / max(t_small, 1e-9), 2)
            rows["streaming_incremental_dedup"] = {
                "sec_sf1": round(t_small, 3),
                "sec_sf10": round(t_large, 3),
                "ratio": ratio,
                "flagged": ratio > RATIO_THRESHOLD,
            }
            if ratio > RATIO_THRESHOLD:
                flagged.append("streaming_incremental_dedup")
            print(
                f"streaming_incremental_dedup: {rows['streaming_incremental_dedup']}",
                flush=True,
            )
        spark.stop()
        return {
            "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "load1_start": load1,
            "queries": rows,
            "flagged": flagged,
        }

    # typed-state (transformWithStateInPandas) rows with state-store
    # telemetry: time like any query, then read the state-row count the
    # stream's final progress recorded (windows.LAST_STREAM_PROGRESS)
    from tracy_matdb_spark.streaming import windows as _w

    for name in QUERIES_TWS:
        fn = registry[name].fn
        out: dict[str, dict] = {}
        for sf_label, sf_dir in (("sf1", SF1_FULL), ("sf10", LARGE)):
            t = _warm_time(spark, fn, sf_dir)
            prog = _w.LAST_STREAM_PROGRESS.get(name, {})
            state_rows = prog.get("state_rows_total", -1)
            if state_rows < 0:
                # the whole point of this block is MEASURED state growth;
                # a missing/negative reading means the query stopped
                # recording progress under its registry name — publishing
                # -1 would silently void the measurement
                raise SystemExit(
                    f"scaling_sf10 --full: {name} recorded no state-row "
                    f"telemetry under its registry name at {sf_label} "
                    "(LAST_STREAM_PROGRESS key missing or negative); "
                    "refusing to publish a -1 state_rows row"
                )
            out[sf_label] = {
                "sec": round(t, 3),
                "state_rows": state_rows,
            }
        ratio = round(out["sf10"]["sec"] / max(out["sf1"]["sec"], 1e-9), 2)
        srow_ratio = (
            round(out["sf10"]["state_rows"] / max(out["sf1"]["state_rows"], 1), 2)
            if out["sf1"]["state_rows"] > 0
            else -1.0
        )
        rows[name] = {
            "sec_sf1": out["sf1"]["sec"],
            "sec_sf10": out["sf10"]["sec"],
            "ratio": ratio,
            "state_rows_sf1": out["sf1"]["state_rows"],
            "state_rows_sf10": out["sf10"]["state_rows"],
            "state_rows_ratio": srow_ratio,
            "flagged": ratio > RATIO_THRESHOLD,
        }
        if ratio > RATIO_THRESHOLD:
            flagged.append(name)
        print(f"{name}: {rows[name]}", flush=True)

    # pagerank per-iteration attribution (round-10 verdict item #3 /
    # round-11 item #2): run the instrumented twin at both decades so
    # the block-worst pagerank_bipartite ratio decomposes into build vs
    # per-iteration vs tail, and record whether the PR_BCAST_MAX_NODES
    # gate flipped between them
    from tracy_matdb_spark.queries.webscale import pagerank_iteration_telemetry

    pr_tel: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf1", SF1_FULL), ("sf10", LARGE)):
        pagerank_iteration_telemetry(spark, sf_dir)  # warmup
        pr_tel[sf_label] = pagerank_iteration_telemetry(spark, sf_dir)
        print(f"pagerank_telemetry[{sf_label}]: {pr_tel[sf_label]}", flush=True)

    # streaming ingest (SURVEY 2.11): same warm best-of-2 via its own
    # availableNow fixture, mirroring the sf1 block — the third decade
    # for the streaming family (10M events at sf10)
    from tracy_matdb_spark.streaming.ingest import streaming_ingest_bench

    def _stream_time(sf_dir: str) -> float:
        streaming_ingest_bench(spark, sf_dir)  # warmup
        return min(streaming_ingest_bench(spark, sf_dir)["sec"] for _ in range(2))

    t_small = _stream_time(SF1_FULL)
    t_large = _stream_time(LARGE)
    ratio = round(t_large / max(t_small, 1e-9), 2)
    rows["streaming_incremental_dedup"] = {
        "sec_sf1": round(t_small, 3),
        "sec_sf10": round(t_large, 3),
        "ratio": ratio,
        "flagged": ratio > RATIO_THRESHOLD,
    }
    if ratio > RATIO_THRESHOLD:
        flagged.append("streaming_incremental_dedup")
    print(f"streaming_incremental_dedup: {rows['streaming_incremental_dedup']}", flush=True)
    spark.stop()
    return {
        "metric": "scaling_ratio_sf1_to_sf10_full_schema",
        "data_ratio": 10.0,
        "dataset": "tools/make_sf1.py vs --sf10-full (10 vs 100 key-shifted "
        "copies of driver sf0.1, every table)",
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "load1_start": load1,
        "queries": rows,
        "pagerank_telemetry": pr_tel,
        "flagged": flagged,
    }


def main() -> None:
    only = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--only":
            if i + 1 >= len(argv):
                raise SystemExit("usage: scaling_sf10.py --full --only q1,q2,...")
            only = argv[i + 1].split(",")
    if "--sf100" in sys.argv[1:] and only is not None:
        # targeted row refresh, merged into the existing sf100_documents
        # block (same no-fabrication contract as --full --only)
        sub = run_sf100(only=only)
        full = read_scaling()
        block = full.get("sf100_documents")
        if not isinstance(block, dict) or "queries" not in block:
            raise SystemExit(
                "scaling_sf10: SCALING.json has no sf100_documents block to "
                "merge --only rows into; run --sf100 without --only first"
            )
        block["queries"].update(sub["queries"])
        block["flagged"] = sorted(
            (set(block.get("flagged", [])) - set(only)) | set(sub["flagged"])
        )
        block["refresh_load1"] = sub["load1_start"]
        block["driver_mem"] = sub["driver_mem"]
        merge_scaling_block("sf100_documents", block)
        print(json.dumps({"sf100_documents_refreshed": only, "flagged": sub["flagged"]}))
        sys.exit(1 if sub["flagged"] else 0)
    if "--full" in sys.argv[1:] and only is not None:
        # targeted row refresh, merged into the existing sf10_full block
        sub = run_full(only=only)
        full = read_scaling()
        block = full.get("sf10_full")
        if not isinstance(block, dict) or "queries" not in block:
            # no full-run baseline to merge into: a subset refresh must
            # not fabricate a block that carries none of the full run's
            # metadata and reads as a complete sf10_full baseline
            raise SystemExit(
                "scaling_sf10: SCALING.json has no sf10_full block to "
                "merge --only rows into; run --full without --only first"
            )
        block["queries"].update(sub["queries"])
        block["flagged"] = sorted(
            (set(block.get("flagged", [])) - set(only)) | set(sub["flagged"])
        )
        block["refresh_load1"] = sub["load1_start"]
        merge_scaling_block("sf10_full", block)
        print(json.dumps({"sf10_full_refreshed": only, "flagged": sub["flagged"]}))
        sys.exit(1 if sub["flagged"] else 0)
    if "--full" in sys.argv[1:]:
        key, result = "sf10_full", run_full()
    elif "--sf100" in sys.argv[1:]:
        key, result = "sf100_documents", run_sf100()
    else:
        key, result = "sf10_documents", run()
    merge_scaling_block(key, result)
    print(json.dumps({f"{key}_flagged": result["flagged"]}))
    if result["flagged"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
