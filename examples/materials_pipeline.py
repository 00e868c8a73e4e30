"""End-to-end example: the materials-database workflow of the reference
(enumerate -> perturb -> split -> status), composed from the library
operators as a user deployment rather than a benchmark query.

Run locally:
    python examples/materials_pipeline.py [out_dir]

This is the Spark-first form of the reference Controller's build loop
(matdb/database/__init__.py:1585-2007): each stage below is an
oracle-verified operator; composition is lazy DataFrame plumbing, so
Catalyst plans the whole pipeline end to end.

  1. enumerate symmetry-distinct derivative structures (Hart-Forcade
     point-group reduction, operators/enumerated.py)
  2. generate distorted training cells per seed (counter-based PRNG,
     operators/generators.py)
  3. reproducible train/holdout/super split (hash-rank, operators/split.py)
  4. per-(seed, split) status rollup + parquet out, partitioned the way
     the catalog prunes (seed_id)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tracy_matdb_spark.operators.enumerated import enumerated_reduced
from tracy_matdb_spark.operators.generators import distortion_generate
from tracy_matdb_spark.operators.split import assign_split
from tracy_matdb_spark.session import get_session


def main(out_dir: str) -> None:
    spark = get_session("materials-pipeline-example")

    # 1. symmetry-distinct structures: fcc binary, sizes <= 4
    enum = enumerated_reduced(spark, "fcc", max_size=4)
    n_structs = enum.count()

    # 2. distorted training cells (deterministic per-row PRNG)
    cells = distortion_generate(spark)

    # 3. reproducible split on the distortion uid
    labeled = assign_split(cells, key="duid", train_perc=0.8)

    # 4. rollup + write
    rollup = labeled.groupBy("seed_id", "label").agg(
        F.count(F.lit(1)).alias("n_configs")
    )
    labeled.write.mode("overwrite").partitionBy("seed_id").parquet(
        f"{out_dir}/configurations"
    )
    rollup.write.mode("overwrite").parquet(f"{out_dir}/status")

    print(f"enumerated {n_structs} symmetry-distinct structures (fcc, size<=4)")
    for r in rollup.orderBy("seed_id", "label").collect():
        print(f"  {r.seed_id:>4} {r.label:>8} {r.n_configs}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/materials_pipeline_out")
