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

    # key-only schema for the history read: the anti-join right side
    # needs just the key column, and handing the reader an explicit
    # schema skips the per-batch footer schema-inference pass (measured
    # as part of ~0.08 s/batch of driver-side plan building; the target
    # is rewritten every batch so no relation cache can help it)
    key_schema = T.StructType([schema[key]])

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df
        try:
            seen = (
                batch_df.sparkSession.read.schema(key_schema)
                .parquet(target_path)
                .select(key)
            )
            # anti-join BEFORE the dropDuplicates shuffle: membership
            # filtering commutes with pick-one-per-key (all rows of a
            # key are dropped or kept together), and the broadcast
            # anti-join is map-side — so already-seen rows never cross
            # the dedup exchange (guide §2.3, filter before shuffle)
            fresh = fresh.join(seen, key, "left_anti")
        except AnalysisException:
            pass  # first batch: target does not exist yet
        (
            fresh.dropDuplicates([key])
            .withColumn("iteration", F.lit(batch_id))
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


def incremental_atoms_h5_ingest(
    spark: SparkSession,
    drop_dir: str,
    target_path: str,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming twin of `sources.hdf5io.read_atoms_h5`: watch a drop
    directory for new ``*.h5`` config files (the reference's on-disk
    unit, one atoms.h5 per configuration — matdb/atoms.py:591-635) and
    upsert never-seen uuids into the parquet configurations table.

    This is the live form of the one-time atoms_h5_dir_to_parquet
    migration: producers (DFT runs finishing, the reference's
    `cleanup()` hooks) keep dropping .h5 files; each micro-batch
    parses only the new files (binaryFile stream source + checkpoint)
    with the same backend-dispatched byte parser (h5py or hdf5lite),
    anti-joins history on uuid, and appends. At 100 TB the drop dir is
    an object-store prefix and the history read stays pruned to the
    uuid column."""
    import pandas as pd

    from tracy_matdb_spark.sources.hdf5io import CONFIG_SCHEMA, parse_atoms_h5_bytes

    def _parse(batches):
        for pdf in batches:
            rows = [
                parse_atoms_h5_bytes(c, p) for p, c in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in CONFIG_SCHEMA.fields])

    uuid_schema = T.StructType([CONFIG_SCHEMA["uuid"]])

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        parsed = batch_df.select("path", "content").mapInPandas(_parse, CONFIG_SCHEMA)
        try:
            # key-only explicit schema: no per-batch footer inference,
            # and the anti-join runs before the dedup shuffle (§2.3)
            seen = (
                batch_df.sparkSession.read.schema(uuid_schema)
                .parquet(target_path)
                .select("uuid")
            )
            parsed = parsed.join(seen, "uuid", "left_anti")
        except AnalysisException:
            pass  # first batch: target does not exist yet
        parsed = parsed.dropDuplicates(["uuid"])
        (
            parsed.withColumn("iteration", F.lit(batch_id))
            .write.mode("append")
            .parquet(target_path)
        )

    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)  # streaming sources require one
        .option("pathGlobFilter", "*.h5")
        .option("recursiveFileLookup", "true")
        .load(drop_dir)
    )
    writer = stream.writeStream.foreachBatch(_upsert).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_warc_ingest(
    spark: SparkSession,
    drop_dir: str,
    target_path: str,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming twin of `sources.warc.read_warc`: watch a drop
    directory (in production: an object-store crawl prefix) for new
    ``*.warc.gz`` segments, parse each exactly once, dedup on
    (url, warc_date) against history, append to the parquet corpus.

    The Common Crawl live-ingest shape: the crawler keeps publishing
    ~1 GB segments; each micro-batch handles only never-seen files
    (binaryFile stream source + checkpoint tracks processed paths),
    parses them segment-per-task with the SAME byte parser the batch
    path uses, and anti-joins history on the record key so re-crawled
    URLs with identical capture dates never duplicate. At 100 TB the
    history read prunes to the two key columns."""
    import pandas as pd

    from tracy_matdb_spark.sources.warc import WARC_SCHEMA, parse_warc_bytes

    def _parse(batches):
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(c), p))
            yield pd.DataFrame(rows, columns=cols)

    warc_key_schema = T.StructType([WARC_SCHEMA["url"], WARC_SCHEMA["warc_date"]])

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        parsed = batch_df.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)
        try:
            # key-only explicit schema: no per-batch footer inference,
            # and the anti-join runs before the dedup shuffle (§2.3)
            seen = (
                batch_df.sparkSession.read.schema(warc_key_schema)
                .parquet(target_path)
                .select("url", "warc_date")
            )
            parsed = parsed.join(seen, ["url", "warc_date"], "left_anti")
        except AnalysisException:
            pass  # first batch: target does not exist yet
        parsed = parsed.dropDuplicates(["url", "warc_date"])
        parsed.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            target_path
        )

    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(drop_dir)
    )
    writer = stream.writeStream.foreachBatch(_upsert).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_ingest_bench(spark: SparkSession, sf_dir: str, n_batches: int = 4) -> dict:
    """Bench-only end-to-end run of the drop-directory incremental dedup
    at real data scale (round-5 verdict item #6): the `documents` table
    is staged as `n_batches` producer drops — each drop overlaps the
    previous one by its doc_id % 10 == 0 slice, so the anti-join dedupe
    actually rejects rows — then each drop is moved into the watched
    directory and processed by `incremental_ingest` (availableNow +
    checkpoint, exactly the production entry point). Timed section =
    the streaming runs only; staging is excluded. Returns seconds,
    rows ingested (must equal the distinct source count: overlaps
    deduped), and rows offered."""
    import os
    import shutil
    import tempfile
    import time as _t

    import os.path as _p

    from tracy_matdb_spark.catalog import _relation

    docs = _relation(spark, _p.join(sf_dir, "documents.parquet"))
    schema = docs.schema
    base = tempfile.mkdtemp(prefix="stream_ingest_bench_")
    try:
        stage = _p.join(base, "stage")
        drop = _p.join(base, "drop")
        target = _p.join(base, "target")
        ckpt = _p.join(base, "ckpt")
        os.makedirs(drop, exist_ok=True)
        offered = 0
        for i in range(n_batches):
            part = docs.where((F.col("doc_id") % n_batches) == i)
            if i:
                part = part.unionByName(
                    docs.where(
                        ((F.col("doc_id") % n_batches) == i - 1)
                        & (F.col("doc_id") % 10 == 0)
                    )
                )
            part.write.parquet(_p.join(stage, f"b{i}"))
            offered += part.count()
        t0 = _t.time()
        for i in range(n_batches):
            shutil.move(_p.join(stage, f"b{i}"), _p.join(drop, f"b{i}"))
            q = incremental_ingest(
                spark, drop, target, schema, key="doc_id", checkpoint_dir=ckpt
            )
            q.awaitTermination()
        sec = _t.time() - t0
        rows = spark.read.parquet(target).count()
        n_src = docs.count()
        return {
            "sec": round(sec, 3),
            "rows_ingested": rows,
            "rows_offered": offered,
            "rows_source": n_src,
            "batches": n_batches,
        }
    finally:
        # a failure mid-run must not leak several staged copies of the
        # documents table in /tmp across bench rounds
        shutil.rmtree(base, ignore_errors=True)
