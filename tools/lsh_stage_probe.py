"""Per-stage decomposition of embedding_lsh_near_dup at two decades.

The r12 verdict's item #2: the query's sf10_full ratio (11.91x) sits
0.09 under its own 12x linearity flag and it is the slowest
full-registry stress query — but there was no attribution showing which
stage (signature build / band shuffle+join / cosine verify) absorbs the
widened signatures' extra width in the linear-candidates regime. This
probe runs queries/llm.py:embedding_lsh_stage_telemetry (the shared-
builder replay twin, pagerank_iteration_telemetry pattern) at sf1
(20k vectors) and sf10_full (200k vectors) — band width comes from
queries/llm.py:_lsh_extra_bits (LSH_BIT_COLLISION-calibrated, so the
exact extra_bits per decade tracks that gate, not this docstring) —
and merges the result into SCALING.json under "embedding_lsh_stages".

Usage: python tools/lsh_stage_probe.py   (after tools/make_sf1.py and
       tools/make_sf1.py --sf10-full)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_sf10 import LARGE, SF1_FULL, _load1  # noqa: E402
from tracy_matdb_spark.queries.llm import embedding_lsh_stage_telemetry  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402


def main() -> None:
    load1 = _load1()
    spark = get_session("lsh_stage_probe")
    out: dict[str, dict] = {}
    for label, sf_dir in (("sf1", SF1_FULL), ("sf10", LARGE)):
        embedding_lsh_stage_telemetry(spark, sf_dir)  # warmup
        out[label] = embedding_lsh_stage_telemetry(spark, sf_dir)
        print(f"{label}: {out[label]}", flush=True)
    spark.stop()
    ratios = {
        k: round(out["sf10"][k] / max(out["sf1"][k], 1e-9), 2)
        for k in ("exec_s", "sig_s", "band_join_s", "verify_s")
    }
    ratios["n_candidates"] = round(
        out["sf10"]["n_candidates"] / max(out["sf1"]["n_candidates"], 1), 2
    )
    result = {
        "metric": "embedding_lsh_stage_decomposition_sf1_to_sf10",
        "load1_start": load1,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "sf1": out["sf1"],
        "sf10": out["sf10"],
        "stage_ratios_10x_data": ratios,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.json")
    try:
        with open(path) as fh:
            full = json.load(fh)
    except (OSError, ValueError):
        full = {}
    full["embedding_lsh_stages"] = result
    with open(path, "w") as fh:
        json.dump(full, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"embedding_lsh_stage_ratios": ratios}))


if __name__ == "__main__":
    main()
