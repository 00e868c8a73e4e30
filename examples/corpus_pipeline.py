"""End-to-end example: assemble a training-corpus pipeline from the
library operators — the composition a user would actually deploy, not
a registered benchmark query.

Run locally:
    python examples/corpus_pipeline.py [sf_dir] [out_dir]

On a cluster, the same file works under spark-submit with the 100 TB
profile:
    spark-submit --master yarn $(python -c "
    from tracy_matdb_spark.session import cluster_conf
    print(' '.join(f'--conf {k}={v}' for k, v in cluster_conf().items()))
    ") examples/corpus_pipeline.py s3://bucket/corpus s3://bucket/out

Stages (each is the registered, oracle-verified operator — see
tracy_matdb_spark/queries/ for the per-stage correctness queries):
  1. load documents               (catalog.load)
  2. Gopher-style quality rules   (queries.corpus.gopher_quality_rules form)
  3. exact dedup                  (hash groupBy, first-doc-wins)
  4. MinHash-LSH near-dup pairs -> connected components -> keep cluster min
  5. per-source mixture weights for the sampler
  6. write the cleaned corpus partitioned by source
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.operators.graph import connected_components
from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.session import get_session


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_session("corpus-pipeline-example")
    registry = load_all()

    docs = load(spark, sf_dir, ("documents",))["documents"]

    # quality gate: reuse the registered rule query's keep flag
    quality = registry["gopher_quality_rules"].fn(spark, sf_dir)
    keep_ids = quality.filter(F.col("gopher_ok")).select("doc_id")

    # exact dedup: first doc per normalized-content fingerprint
    exact = registry["dedup_exact"].fn(spark, sf_dir).select(
        F.col("keep_id").alias("doc_id")
    )

    # near-dup: LSH candidate pairs -> clusters -> cluster representative
    pairs = registry["minhash_lsh_pairs"].fn(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").alias("id"))
    clusters = connected_components(
        nodes, pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    )  # (id, component); representative = the component's min doc_id
    dropped_near = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )

    cleaned = (
        docs.join(keep_ids, "doc_id", "left_semi")
        .join(exact, "doc_id", "left_semi")
        .join(dropped_near, "doc_id", "left_anti")
    )

    weights = registry["mixture_weights"].fn(spark, sf_dir)

    cleaned.write.mode("overwrite").partitionBy("source").parquet(f"{out_dir}/cleaned")
    weights.write.mode("overwrite").parquet(f"{out_dir}/mixture_weights")

    n_in, n_out = docs.count(), cleaned.count()
    print(f"documents: {n_in} -> {n_out} after quality + exact + near dedup")
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_pipeline_out"
    main(sf, out)
