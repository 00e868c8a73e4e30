"""Scaling-regression harness: sf0.01 -> sf0.1 wall-time ratios per query.

Motivation (round-4 verdict #1): a query can be hash-green at sf0.01 and
fast enough at one sf while its plan is super-linear in data size. The
round-4 simhash fix is the canonical example — 16-bit signatures banded
into 4-bit buckets degenerated to all-pairs *within* 16 buckets, which a
correctness check can never show and a single-sf bench under-weights.
This tool times each query at two scale factors and flags ratios far
above the data ratio.

Threshold: the sf0.01 -> sf0.1 data ratio is 10x. A healthy shuffle/agg
plan on local[32] lands well under that (fixed per-query overhead
dominates the small sf). We flag ratio > 25x (2.5x super-linear
headroom). Calibration against the one known bad plan: the pre-28a1628
simhash ran 9.4 s at sf0.1; at sf0.01 the 500-doc corpus fits in 16
buckets of ~30 docs (~0.2 s) — ratio ~45x, well above 25. The current
banded plan measures ~2-4x (overhead-dominated). Queries faster than
MIN_LARGE_SEC at the large sf are never flagged: at that absolute cost
they cannot be a scale hazard yet, and tiny denominators make the ratio
pure noise — they re-enter the net automatically once they grow.

Query set: every bench headline query, plus SCALING_EXTRA — the
candidate-pair-generating operators (LSH bucket joins, n-gram overlap
joins, pair explosions) whose topology is exactly the class that can
degenerate the way simhash did.

Usage:
    python tools/scaling_check.py            # writes SCALING.json, prints one JSON line
    python bench.py --scaling                # same entry point
Exit code 1 when any query is flagged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.session import get_session

SMALL_SF_DIR = "/root/testdata/sf0.01"
LARGE_SF_DIR = "/root/testdata/sf0.1"
DATA_RATIO = 10.0
# Flag when t(large)/t(small) exceeds this. 2.5x the data ratio: the old
# quadratic simhash shape measures ~45x here, healthy plans 2-8x.
RATIO_THRESHOLD = 25.0
# Below this absolute time at the large sf a query cannot yet be a scale
# hazard and its ratio is denominator-noise; it is reported, not flagged.
MIN_LARGE_SEC = 0.30

# Non-headline queries whose join topology generates candidate pairs —
# the degeneration-prone class this harness exists for.
SCALING_EXTRA = [
    "simhash_near_dup",
    "ngram_jaccard_pairs",
    "embedding_lsh_near_dup",
    "knn_ivf_embeddings",
    "near_dup_clusters",
    "doc_fingerprint",
    "decontam_ngram_overlap",
    "source_vocab_overlap",
    "basket_part_pairs",
    "incremental_dedup_ingest",
    "semantic_dedup",  # K-centroid assignment + W-neighbor window pairs
    "bloom_dedup_filter",  # bitset build + broadcast probe join
    "bigram_perplexity",  # model join back to doc bigrams
    "basket_pair_pmi",  # bounded basket self-join + marginals
    "countmin_heavy_hitters",  # sketch shuffle bounded at d*w keys
    "median_mad_outliers",  # two range-sliced selection passes
    "unigram_sampling_table",  # range-sliced prefix sum over the vocab
    "triangle_part_graph",  # pair agg + wedge join (degree-oriented)
    "dedup_keep_best",  # LSH pairs -> components -> argmax retention
    "shard_token_budget",  # global range-sliced rank under the sharder
    "universe_sample_join",  # sampled + exact join branches
    "entity_resolution_pairs",  # blocking join: the block-skew hazard class
    "scd2_user_state",  # keyed change-history windows (per-user islands)
    "bpe_train_merges",  # iterative CTE chain — cost must track vocab, not corpus
    "events_typemap_tws",  # typed-state protocol round-trips per key
    "dsir_importance_weights",  # gram explode + 512-bucket agg + broadcast
    "jl_projection_distortion",  # zero-join nested-lambda sketch pass
    "streaming_minhash_dedup_tws",  # per-bucket typed state across 3 resumed runs
    "knn_batch_embeddings",  # Q-query batch scan + two-phase sharded top-k
    "maxsim_batch_late_interaction",  # batched late-interaction agg chain
    "hard_negative_mining",  # label-filtered batch mining pass
    "temperature_sampling_weights",  # corpus rollup + ppm normalize
    "ks_source_drift",  # dense source x value grid + range-sliced CDFs
    "psi_source_drift",  # binned drift: keyed agg + bin-grid explode
    "chi2_term_source",  # vocab x source cells + range-sliced top-k
    "ngram_novelty_curve",  # shingle explode + first-occurrence agg
    "events_type_psi_stream",  # watermarked stream agg + PSI readout
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# ---------------------------------------------------------------------------
# Skew-join / skew-agg stress (round-5 verdict item #8)
# ---------------------------------------------------------------------------

SKEW_N = 12_000_000  # fact rows; one hot key holds 30%
SKEW_DIM = 100_002  # dim keys — far over any broadcast threshold with payload
SKEW_SALTS = 32


def skew_stress(spark) -> dict:
    """Time operators/skew.py's salted paths against the naive plans on
    a synthetic hot-key workload: 12M fact rows, ONE key holding 30%
    (the regime AQE only partially rescues). Two stresses:

    * join: fact x 100k-key dim, broadcast disabled, AQE skew-join ON
      (the honest baseline — AQE splits oversized partitions but the
      hot key's hash bucket still serializes); salted_join spreads the
      hot key over SKEW_SALTS tasks at the cost of dim replication.
    * agg: per-key distinct count with wide collect_set state; the
      salted form shards state by hash(value) — shards are DISJOINT in
      the collected column, so the stage-2 merge is a plain SUM of
      per-shard sizes, never a re-flatten.

    Each salted variant must beat its naive twin (ratio < 1.0, small
    tolerance); a slower salted path lands in `flagged`.
    """

    fact = (
        spark.range(SKEW_N)
        .selectExpr(
            "CASE WHEN id % 10 < 3 THEN 1 "
            f"ELSE (xxhash64(id) % {SKEW_DIM - 2} + {SKEW_DIM - 2}) % {SKEW_DIM - 2} + 2 END AS k",
            "id AS v",
        )
        .localCheckpoint()
    )
    dim = (
        spark.range(SKEW_DIM)
        .selectExpr("id AS k", "concat('d', id) AS label")
        .localCheckpoint()
    )

    from pyspark.sql import functions as F

    from tracy_matdb_spark.operators.skew import salted_agg, salted_join

    def timed(make_df) -> float:
        _materialize(make_df())
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _materialize(make_df())
            best = min(best, time.time() - t0)
        return round(best, 3)

    def naive_agg():
        return fact.groupBy("k").agg(F.size(F.collect_set("v")).alias("nd"))

    def salt_agg():
        return salted_agg(
            fact,
            ["k"],
            "v",
            [F.size(F.collect_set("v")).alias("nd_part")],
            lambda s: [F.sum("nd_part").cast("int").alias("nd")],
            n_salts=SKEW_SALTS,
        )

    def naive_join():
        return fact.join(dim, "k").groupBy().agg(
            F.count("*").alias("n"), F.max("label").alias("m")
        )

    def salt_join():
        return salted_join(fact, dim, "k", "v", n_salts=SKEW_SALTS).groupBy().agg(
            F.count("*").alias("n"), F.max("label").alias("m")
        )

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out: dict = {
        "fact_rows": SKEW_N,
        "hot_key_fraction": 0.3,
        "n_salts": SKEW_SALTS,
        "aqe_skew_join": spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
    }
    try:
        agg_naive_s = timed(naive_agg)
        agg_salted_s = timed(salt_agg)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        join_naive_s = timed(naive_join)
        join_salted_s = timed(salt_join)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    out["agg"] = {
        "naive_s": agg_naive_s,
        "salted_s": agg_salted_s,
        "ratio_salted_over_naive": round(agg_salted_s / agg_naive_s, 2),
    }
    out["join"] = {
        "naive_s": join_naive_s,
        "salted_s": join_salted_s,
        "ratio_salted_over_naive": round(join_salted_s / join_naive_s, 2),
    }
    # 1.05: the salted path must at least match the naive one; co-tenant
    # jitter of a few percent is not a regression signal
    out["flagged"] = [
        f"skew_{kind}_salted_slower"
        for kind in ("agg", "join")
        if out[kind]["ratio_salted_over_naive"] > 1.05
    ]
    return out


def _warm_time(spark, fn, sf_dir: str) -> float:
    """Best-of-2 warm time: one warmup (JVM/codegen, parquet footers),
    then the min of two timed runs — a single GC pause or session-state
    hiccup mid-sweep otherwise lands as a bogus 5-10x outlier (observed:
    one query recorded 13.3 s whose isolated warm time is 2.5 s)."""
    _materialize(fn(spark, sf_dir))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        best = min(best, time.time() - t0)
    return best


def run(out_path: str | None = None) -> dict:
    registry = load_all()
    names = [n for n, q in registry.items() if q.headline]
    names += [n for n in SCALING_EXTRA if n in registry and n not in names]
    missing = [n for n in SCALING_EXTRA if n not in registry]
    if missing:
        raise SystemExit(f"scaling_check: unknown SCALING_EXTRA queries: {missing}")

    spark = get_session("scaling_check")
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    for name in sorted(names):
        fn = registry[name].fn
        try:
            t_small = _warm_time(spark, fn, SMALL_SF_DIR)
            t_large = _warm_time(spark, fn, LARGE_SF_DIR)
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:200]}
            flagged.append(name)
            continue
        ratio = t_large / max(t_small, 1e-9)
        flag = ratio > RATIO_THRESHOLD and t_large >= MIN_LARGE_SEC
        rows[name] = {
            "sec_sf0.01": round(t_small, 3),
            "sec_sf0.1": round(t_large, 3),
            "ratio": round(ratio, 2),
            "flagged": flag,
        }
        if flag:
            flagged.append(name)
    skew = skew_stress(spark)
    flagged.extend(skew.pop("flagged"))
    spark.stop()

    result = {
        "metric": "scaling_ratio_sf0.01_to_sf0.1",
        "data_ratio": DATA_RATIO,
        "ratio_threshold": RATIO_THRESHOLD,
        "min_large_sec": MIN_LARGE_SEC,
        "queries": rows,
        "skew_stress": skew,
        "flagged": sorted(flagged),
    }
    if out_path:
        # preserve every top-level key this run does not itself produce
        # (the sf0.1 -> sf1 block from tools/scaling_sf1.py, the
        # sf1 -> sf10 blocks from tools/scaling_sf10.py, and any future
        # decade) across rewrites of the small-decade sweep — a rewrite
        # that kept only 'sf1' silently dropped the committed
        # third-decade evidence (round-9 ADVICE)
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            for key, val in prev.items():
                if key not in result:
                    result[key] = val
        except (OSError, ValueError):
            pass
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2, sort_keys=True)
            fh.write("\n")
    return result


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = run(out_path=os.path.join(root, "SCALING.json"))
    print(json.dumps({k: v for k, v in result.items() if k != "queries"} | {"n_queries": len(result["queries"])}))
    if result["flagged"]:
        print(f"scaling_check: FLAGGED {result['flagged']}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
