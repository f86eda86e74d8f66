"""Multimodal binary-column plumbing (training-pipeline operator).

Images / audio / video are opaque ``binary`` columns with typed metadata;
the Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the codec step is STUBBED: the real
decoders (PIL / libav) are not in this container, so ``decode_media``
raises ``NotImplementedError`` unless the library is importable, and
:func:`fake_decode_stats` provides a deterministic header-bytes parser the
tests drive the plumbing with.

Schema:
    media(doc_id long, kind string, payload binary, meta map<string,string>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = "doc_id long, kind string, payload binary, meta map<string,string>"

_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("header_hash", LongType()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode (image → pixels): requires PIL, which this container
    does not ship. The plumbing (mapInPandas over binary, Arrow batches)
    is identical to fake_decode_stats; only the codec differs."""
    if _try_import_pil() is None:
        raise NotImplementedError(
            "media decoding requires PIL/libav — not available in this "
            "container; use fake_decode_stats for plumbing tests"
        )
    raise NotImplementedError("wire PIL decode here when the codec ships")


def fake_decode_stats(media: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder: per payload, byte stats + a hash of
    the first 16 header bytes. Exercises the exact plumbing a real codec
    uses (binary column in → Arrow batch → numpy → struct out)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..hashing import fnv1a64

        for pdf in batches:
            n_bytes, means, hh = [], [], []
            for payload in pdf["payload"].values:
                if payload is None:
                    n_bytes.append(0); means.append(0.0); hh.append(0)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_bytes.append(len(arr))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                hh.append(np.uint64(fnv1a64(bytes(payload[:16]))).view(np.int64).item())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "mean_byte": pd.Series(means, dtype="float64"),
                    "header_hash": pd.Series(hh, dtype="int64"),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(fn, _STATS_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """'Video' frame sampling plumbing: slice each payload into n evenly
    spaced fixed-width windows → (doc_id, frame_id, frame binary). The
    real version seeks keyframes via the codec; partitioning and output
    shape are identical."""
    ddl = "doc_id long, frame_id long, frame binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for did, payload in zip(pdf["doc_id"].values, pdf["payload"].values):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, (len(payload) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * step, max(0, len(payload) - frame_bytes))
                    ids.append(did); fids.append(i)
                    frames.append(bytes(payload[start : start + frame_bytes]))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_id": pd.Series(fids, dtype="int64"),
                                "frame": frames if frames else pd.Series([], dtype=object)})

    return media.select("doc_id", "payload").mapInPandas(fn, ddl)


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Adapter: treat page html as an opaque media payload (how a crawl
    pipeline feeds image/audio bytes through the same table shape)."""
    return pages.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("html").alias("kind"),
        F.col("html").alias("payload"),
        F.create_map(F.lit("url"), F.col("url")).alias("meta"),
    )
