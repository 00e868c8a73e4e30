"""Probe: does stale persisted-RDD accumulation across interleaved bench
reps explain pagerank's interleaved-vs-single-shot gap?

BENCH_DRIFT_r11 measured pagerank_bipartite at 1.73-1.85 s single-shot
matched-order vs 2.77 s interleaved min (r10 verdict item #2 / r11 item
#3). Candidate mechanism: several headline queries localCheckpoint
intermediates (pagerank's edge set + degree table, the BOM recursion,
the tws memory-sink reads); each checkpoint persists RDDs that stay in
executor storage until the JVM garbage-collects the py4j reference —
across 19 queries x 5 reps that squeezes the unified-memory execution
pool and evicts pagerank's own checkpoint blocks.

Protocol (one session, so JIT/session effects cancel):
  2 warmup passes over the full headline list, then three interleaved
  legs of $SPARK_GRAFT_BENCH_REPS rounds each over the same list in the
  same order:
    legA  — bench.py behavior byte-for-byte (no cleanup);
    legB  — after each query's materialization, unpersist EVERY
            persisted RDD (safe here: every rep rebuilds its DataFrame
            from scratch, nothing re-executes an old plan);
    legA2 — legA again, to control for slow session drift.
  Per rep it records pagerank's wall time and the persistent-RDD count
  just before pagerank runs. The verdict: if legB's pagerank median
  recovers toward the single-shot number while legA/legA2 sit high with
  a growing RDD count, the penalty is the stale checkpoints.

Usage: python tools/pr_interleave_probe.py   # writes one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracy_matdb_spark.queries import load_all  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = "pagerank_bipartite"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def unpersist_all(spark) -> int:
    """Unpersist every persisted RDD (localCheckpoint blocks included).
    Returns how many were dropped. Non-blocking: eviction proceeds while
    the next query plans."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    dropped = 0
    # py4j exposes the Java map with the Python Mapping protocol:
    # values() yields JavaRDD proxies directly
    for jrdd in list(jmap.values()):
        try:
            jrdd.unpersist(False)
            dropped += 1
        except Exception:  # noqa: BLE001 — already cleaned by ContextCleaner
            pass
    return dropped


def leg(spark, headline, cleanup: bool) -> dict:
    pr_times: list[float] = []
    rdds_before_pr: list[int] = []
    for _ in range(REPS):
        for name, q in headline:
            if name == TARGET:
                rdds_before_pr.append(n_persistent(spark))
                t0 = time.time()
                materialize(q.fn(spark, SF_DIR))
                pr_times.append(time.time() - t0)
            else:
                materialize(q.fn(spark, SF_DIR))
            if cleanup:
                unpersist_all(spark)
    s = sorted(pr_times)
    return {
        "pagerank_s": [round(t, 3) for t in pr_times],
        "pagerank_median_s": round(s[len(s) // 2], 3),
        "pagerank_min_s": round(s[0], 3),
        "persistent_rdds_before_pagerank": rdds_before_pr,
    }


def main() -> None:
    registry = load_all()
    spark = get_session("pr_probe")
    headline = [(name, q) for name, q in registry.items() if q.headline]
    assert any(name == TARGET for name, _ in headline)
    for _ in range(2):  # JVM/codegen then C2 JIT warmups, like bench.py
        for _, q in headline:
            materialize(q.fn(spark, SF_DIR))
    out = {
        "metric": "pagerank_interleave_probe",
        "sf_dir": SF_DIR,
        "reps": REPS,
        "load1_start": round(os.getloadavg()[0], 2),
        "legA_no_cleanup": leg(spark, headline, cleanup=False),
        "legB_unpersist_each": leg(spark, headline, cleanup=True),
        "legA2_no_cleanup": leg(spark, headline, cleanup=False),
    }
    # single-shot tail in the SAME session: pagerank alone, back-to-back
    ss = []
    fn = registry[TARGET].fn
    for _ in range(REPS):
        t0 = time.time()
        materialize(fn(spark, SF_DIR))
        ss.append(round(time.time() - t0, 3))
    out["single_shot_same_session_s"] = ss
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
