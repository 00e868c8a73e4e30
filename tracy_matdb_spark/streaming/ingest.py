"""Incremental drop-directory ingest: the active-learning append pattern.

The reference's active-learning loop appends each iteration's selected
configs to the database, deduping against all history by content hash
(reference matdb/database/active.py:158-205, mtp.py:894-933). The batch
form of that loop lives in operators/active.py; this is the streaming
form from SURVEY.md §2.11's mapping: a Structured Streaming file source
watches a drop directory, and each micro-batch is upserted into the
target table with an anti-join dedupe — iteration number = streaming
batch id, replacing the reference's per-iteration pkl membership files.

At scale the drop directory becomes an object-store prefix (or Kafka)
and the anti-join's right side stays a key-only projection — the
existing-keys read is column-pruned to the hash column, so history
grows the dedupe cost only by key bytes, not record bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException
from pyspark.sql.streaming import StreamingQuery


def incremental_ingest(
    spark: SparkSession,
    drop_dir: str,
    target_path: str,
    schema: T.StructType,
    key: str = "auid",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Watch `drop_dir` for new parquet files; append never-seen-before
    rows (by `key`) to the parquet table at `target_path`, stamping each
    row with its micro-batch id as `iteration`.

    Runs with availableNow: processes everything currently in the
    directory, then stops — call again after more files land (or use a
    continuous trigger in production). The checkpoint makes re-runs skip
    already-processed files, so the same dropped file is never ingested
    twice even across restarts.
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates([key])
        try:
            seen = batch_df.sparkSession.read.parquet(target_path).select(key)
            fresh = fresh.join(seen, key, "left_anti")
        except AnalysisException:
            pass  # first batch: target does not exist yet
        (
            fresh.withColumn("iteration", F.lit(batch_id))
            .write.mode("append")
            .parquet(target_path)
        )

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        # drops arrive as whole directories (one per producer run); recurse
        # and keep only parquet parts (skips _SUCCESS markers)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(drop_dir)
    )
    writer = stream.writeStream.foreachBatch(_upsert).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
