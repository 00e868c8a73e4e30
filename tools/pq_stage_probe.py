"""Per-stage decomposition of knn_pq_embeddings at the 3rd/4th decades.

The r14 sf100 probe measured knn_pq_embeddings near-FLAT on 10x data
(sf10 200k -> sf100 2M vectors) — a sub-linear ratio that looks wrong
until attributed. The design says it should be: codebook training is
footer-gated at PQ_TRAIN_MAX (32k) vectors so train_s is
scale-constant above the gate, and only the ADC corpus scan is
corpus-linear. This probe runs queries/llm.py:pq_stage_telemetry (the
shared-builder replay twin) at sf10 and the sf100 probe tables and
merges the result into SCALING.json under "pq_stages" — either
train_s dominates at both decades while scan_s grows ~10x from a small
base (the fixed-cost-dilution story, confirmed), or scan_s is NOT the
linear stage and the flat total was luck (the find).

Usage: python tools/pq_stage_probe.py   (after tools/make_sf1.py
       --sf10-full and --sf100-probe)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_io import merge_scaling_block  # noqa: E402
from tools.scaling_sf10 import LARGE, _load1  # noqa: E402
from tools.sf100_probe import SF100P  # noqa: E402
from tracy_matdb_spark.queries.llm import pq_stage_telemetry  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402


def main() -> None:
    # match the sf100_probe rows this decomposition attributes: both
    # decades under zstd unless the caller overrides (set here, not at
    # import — see sf100_probe.main on the env-leak hazard)
    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")
    load1 = _load1()
    spark = get_session("pq_stage_probe")
    out: dict[str, dict] = {}
    for label, sf_dir in (("sf10", LARGE), ("sf100", SF100P)):
        pq_stage_telemetry(spark, sf_dir)  # warmup
        out[label] = pq_stage_telemetry(spark, sf_dir)
        print(f"{label}: {out[label]}", flush=True)
    spark.stop()
    ratios = {
        k: round(out["sf100"][k] / max(out["sf10"][k], 1e-9), 2)
        for k in ("train_s", "scan_s", "total_s")
    }
    ratios["corpus_rows"] = round(
        out["sf100"]["corpus_rows"] / max(out["sf10"]["corpus_rows"], 1), 2
    )
    result = {
        "metric": "pq_stage_decomposition_sf10_to_sf100",
        "load1_start": load1,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "io_codec": os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        "sf10": out["sf10"],
        "sf100": out["sf100"],
        "stage_ratios_10x_data": ratios,
    }
    merge_scaling_block("pq_stages", result)
    print(json.dumps({"pq_stages_ratios": ratios}))


if __name__ == "__main__":
    main()
