"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is executed twice; the reported time is the second (warm)
run — the first run pays JVM/codegen warmup, which is noise relative
to the plan quality we are measuring. Timing includes full execution
to a count/collect-free materialization (`write.format("noop")`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.session import get_session


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _contention_guard() -> None:
    """Warn (stderr only — the stdout JSON contract is untouched) when
    other JVMs are running: the round-2/3 recorded benches were polluted
    by concurrent Spark work by +15-50%, making them useless as
    round-over-round signals."""
    try:
        import subprocess

        out = subprocess.run(["pgrep", "-c", "java"], capture_output=True, text=True)
        n = int(out.stdout.strip() or 0)
        if n > 0:
            print(
                f"bench warning: {n} java process(es) already running — "
                "timings will include contention; rerun on a quiet machine",
                file=sys.stderr,
            )
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    _contention_guard()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    registry = load_all()
    spark = get_session("bench")
    times: dict[str, float] = {}
    for name, q in registry.items():
        if not q.headline:
            continue
        try:
            materialize(q.fn(spark, sf_dir))  # warmup
            t0 = time.time()
            materialize(q.fn(spark, sf_dir))
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)
    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
