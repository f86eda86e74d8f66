"""Incremental / streaming dedup (SURVEY.md §2.9).

The reference is batch-only; its change-detection phase
(``check_files_for_changes``, ``finddup.py:974-1005``) and resume
semantics are proto-streaming. Two incremental paths:

- :func:`incremental_exact_dedup` — batch-incremental: process only rows
  with ``warc_ts`` above the stored high-water mark (the lineage analog
  of the reference's mtime snapshot, ``finddup.py:877``), anti-joining
  new content hashes against the accumulated cluster state.
- :func:`streaming_exact_dedup` — Structured Streaming: file-source
  ``readStream`` over a growing pages directory, watermark on ``warc_ts``
  for late re-crawls, ``foreachBatch`` running the same incremental merge
  (exactly-once via the streaming checkpoint + idempotent parquet state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = "content_sha string, cluster_id long"


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "exact_state")


def read_state(spark: SparkSession, out_dir: str) -> DataFrame:
    p = _state_path(out_dir)
    if os.path.exists(p):
        return spark.read.parquet(p)
    return spark.createDataFrame([], STATE_SCHEMA)


def merge_batch(
    spark: SparkSession, batch: DataFrame, out_dir: str
) -> DataFrame:
    """Merge one micro-batch into the exact-dedup state.

    New hashes claim cluster_id = min(doc_id of batch rows with that
    hash); existing hashes keep their original cluster (first-seen wins —
    streaming-consistent min is unobtainable without reprocessing, and
    first-seen matches dedup-pipeline semantics: the earliest crawl is
    the keeper). Returns the batch's assignments.
    """
    state = read_state(spark, out_dir)
    hashed = (
        batch.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.sha2("text", 256).alias("content_sha"),
        )
    )
    assigned = hashed.join(state, "content_sha", "left")
    fresh = (
        assigned.filter(F.col("cluster_id").isNull())
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("cluster_id"))
    )
    new_state = state.unionByName(fresh)
    # idempotent overwrite (exactly-once under foreachBatch retry)
    tmp = _state_path(out_dir) + "_tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    final = _state_path(out_dir)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(final)
    out = hashed.join(spark.read.parquet(final), "content_sha").select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("keep")
    )
    return out


def incremental_exact_dedup(
    spark: SparkSession, pages_path: str, out_dir: str
) -> DataFrame:
    """Batch-incremental run: rows with warc_ts > high-water mark only."""
    os.makedirs(out_dir, exist_ok=True)
    hwm_path = os.path.join(out_dir, "hwm.txt")
    pages = spark.read.parquet(pages_path)
    if os.path.exists(hwm_path):
        hwm = open(hwm_path).read().strip()
        pages = pages.filter(F.col("warc_ts") > F.lit(hwm).cast("timestamp"))
    result = merge_batch(spark, pages, out_dir)
    new_hwm = pages.agg(F.max("warc_ts")).collect()[0][0]
    if new_hwm is not None:
        with open(hwm_path, "w") as f:
            f.write(str(new_hwm))
    return result


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = "doc_id long, url string, warc_ts timestamp, text string",
    late_threshold: str = "1 day",
):
    """Structured Streaming variant: returns the started StreamingQuery.

    Watermark bounds state for late re-crawls; foreachBatch applies the
    same merge as the batch-incremental path (stream/batch unification).
    """
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("warc_ts", late_threshold)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = merge_batch(batch.sparkSession, batch, out_dir)
        out.write.mode("append").parquet(os.path.join(out_dir, "assignments"))

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
