"""A/B the shuffle/spill compression codec on a shuffle-bound query.

The r14 sf100 probe ran under zstd (disk was the scarce resource at
600M rows) and its pagerank sf10 leg measured ~2x the lz4-measured
sf10_full row — a cross-artifact discrepancy that took archaeology to
attribute. This probe pins the knob with a controlled A/B: same query
(pagerank_bipartite, the registry's most shuffle-bound plan), same
data (sf10: 60M lineitem), same box, best-of-2 warm times, and one
fresh PROCESS per codec — spark.io.compression.codec binds at SparkEnv
creation, so re-using a JVM across arms would silently measure the
first codec twice. Merged into SCALING.json under "io_codec_ab"; the
cluster guidance is the measured pair: zstd's ~2x-smaller shuffle
files vs its CPU cost on a shuffle-bound plan.

Usage: python tools/codec_ab_probe.py   (after tools/make_sf1.py --sf10-full)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "pagerank_bipartite"


def _arm(codec: str) -> float:
    """One codec arm in its own process; prints the warm seconds."""
    from tools.scaling_check import _warm_time
    from tools.scaling_sf10 import LARGE
    from tracy_matdb_spark.queries import load_all
    from tracy_matdb_spark.session import get_session

    spark = get_session(f"codec_ab_{codec}")
    sec = _warm_time(spark, load_all()[QUERY].fn, LARGE)
    spark.stop()
    return sec


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--arm":
        codec = sys.argv[2]
        assert os.environ.get("SPARK_GRAFT_IO_CODEC") == codec
        print(f"ARM_RESULT {json.dumps({codec: _arm(codec)})}", flush=True)
        return

    from tools.scaling_sf10 import _load1

    load1 = _load1()
    out: dict[str, dict] = {}
    for codec in ("lz4", "zstd"):
        env = dict(os.environ, SPARK_GRAFT_IO_CODEC=codec)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", codec],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("ARM_RESULT ")][-1]
        sec = json.loads(line[len("ARM_RESULT ") :])[codec]
        out[codec] = {"sec_sf10": round(sec, 3)}
        print(f"{codec}: {out[codec]}", flush=True)
    ratio = round(out["zstd"]["sec_sf10"] / max(out["lz4"]["sec_sf10"], 1e-9), 2)
    result = {
        "metric": "io_codec_ab_pagerank_sf10",
        "query": QUERY,
        "load1_start": load1,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "lz4": out["lz4"],
        "zstd": out["zstd"],
        "zstd_over_lz4": ratio,
    }
    from tools.scaling_io import merge_scaling_block

    merge_scaling_block("io_codec_ab", result)
    print(json.dumps({"io_codec_ab": ratio}))


if __name__ == "__main__":
    main()
