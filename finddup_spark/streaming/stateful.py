"""Custom stateful streaming dedup via applyInPandasWithState (§2.9).

The foreachBatch path (streaming/incremental.py) keeps its state in
parquet deltas the batch function manages itself; this module is the
OTHER Structured Streaming state idiom — engine-managed per-key state
(``applyInPandasWithState``): the stream is grouped by content hash and
each group's first-seen owner doc_id lives in the state store (RocksDB /
HDFS-backed on a cluster, checkpoint-local here), giving exactly-once
first-seen-wins assignment without any user-managed state files.

Semantics match incremental.merge_batch: within a micro-batch the owner
is the min doc_id of the group; across batches the FIRST batch's owner
wins (state is never overwritten). No timeout: a content hash's owner is
permanent for the life of the checkpoint — dedup state has no natural
expiry; a real deployment bounds it by partitioning the checkpoint by
crawl epoch (documented scale knob, not a code path here).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_sha", StringType()),
        StructField("cluster_id", LongType()),
        StructField("keep", StringType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("owner", LongType())])


def _assign(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # the owner must be known before the first output row (keep flags),
    # so the group's chunks are drained first — but only the int64
    # doc_ids are buffered (the sha is the GROUP KEY, constant for every
    # row): a pathological exact-dup flood of n docs holds 8n bytes here,
    # not n full rows
    import numpy as np

    chunks = [pdf["doc_id"].to_numpy(dtype="int64") for pdf in pdfs]
    ids = np.concatenate(chunks) if chunks else np.empty(0, dtype="int64")
    if state.exists:
        (owner,) = state.get
    else:
        owner = int(ids.min())
        state.update((owner,))
    for chunk in chunks:
        yield pd.DataFrame(
            {
                "doc_id": chunk,
                "content_sha": key[0],
                "cluster_id": np.full(len(chunk), owner, dtype="int64"),
                "keep": np.where(chunk == owner, "true", "false"),
            }
        )


def stateful_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = "doc_id long, url string, warc_ts timestamp, text string",
):
    """Start the stateful dedup stream; returns the StreamingQuery.

    Assignments append to ``out_dir``/assignments; the engine-managed
    per-content-sha state lives in the streaming checkpoint."""
    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    hashed = (
        stream.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.sha2("text", 256).alias("content_sha"),
        )
    )
    assigned = hashed.groupBy("content_sha").applyInPandasWithState(
        _assign,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        assigned.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "assignments"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
