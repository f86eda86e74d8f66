"""Multimodal binary-column operators (training-pipeline family).

Images / audio / video are opaque ``binary`` columns with typed metadata.
``decode_media`` is a REAL decoder for the uncompressed Netpbm P6 (PPM)
format — a pure-numpy header+pixel parse that needs no codec library, so
the decode path is genuinely exercised in this container; compressed
kinds (jpeg/png) dispatch to PIL when importable and degrade to
NULL-stats lineage rows otherwise. :func:`fake_decode_stats` remains the
codec-free plumbing driver (byte stats over arbitrary blobs), and
:func:`synthesize_ppm_media` generates a deterministic PPM corpus whose
stats a SQL oracle recomputes in closed form.

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
    BinaryType,
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


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _parse_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary PPM (P6) blob with pure numpy — no codec library.

    Format (public Netpbm spec): ASCII magic ``P6``, then width, height
    and maxval as whitespace-separated decimal tokens, then exactly ONE
    whitespace byte, then width*height*3 raw RGB bytes. Comments are not
    supported (the synthetic corpus never writes them)."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    idx, vals = 2, []
    while len(vals) < 3:
        while payload[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        vals.append(int(payload[start:idx]))
    idx += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if maxval != 255:
        # maxval > 255 means 2-byte samples (valid P6, different layout);
        # decoding them as single bytes would yield plausible-but-wrong
        # stats — route to the unreadable path instead
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return w, h, maxval, data


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode → per-image stats (doc_id, kind, width, height,
    n_pixels, mean_pixel).

    ``kind='ppm'`` rows are decoded with the pure-numpy Netpbm P6 parser
    (:func:`_parse_ppm`) — an uncompressed public format that needs no
    codec library, so the decode is real in this container. Other kinds
    (jpeg/png/...) dispatch to PIL when importable and fail loudly per
    row otherwise (a decode error surfaces as a NULL-stats row, the
    lineage-row analog of the reference's unreadable-file handling,
    ``finddup.py:144-149``). Plumbing: binary column → Arrow batch →
    numpy → struct rows, identical for every codec."""
    pil = _try_import_pil()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "kind", "width", "height", "n_pixels", "mean_pixel")}
            for did, kind, payload in zip(
                pdf["doc_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                w = h = npx = None
                mean = None
                try:
                    if kind == "ppm":
                        w, h, _maxval, data = _parse_ppm(bytes(payload))
                        npx = w * h
                        mean = round(float(data.mean()) if len(data) else 0.0, 6)
                    elif pil is not None:
                        import io

                        img = pil.open(io.BytesIO(bytes(payload)))
                        arr = np.asarray(img, dtype=np.uint8)
                        w, h = img.size
                        npx = w * h
                        mean = round(float(arr.mean()), 6)
                    # else: no codec for this kind → NULL-stats row
                except (ValueError, OSError):
                    w = h = npx = mean = None  # unreadable → NULL-stats row
                rows["doc_id"].append(did)
                rows["kind"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(npx)
                rows["mean_pixel"].append(mean)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "kind", "payload").mapInPandas(fn, _DECODE_SCHEMA)


def synthesize_ppm_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic synthetic PPM corpus: per doc_id, a P6 blob with
    width = 4 + id%5, height = 3 + id%4, maxval 255 and pixel byte
    i = (id*7 + i*31) % 256 — a closed form a SQL oracle can recompute
    without touching the binary. Output matches MEDIA_SCHEMA."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col].values:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                nb = w * h * 3
                data = ((did * 7 + np.arange(nb, dtype=np.int64) * 31) % 256).astype(
                    np.uint8
                )
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + data.tobytes())
                ids_.append(did)
            yield pd.DataFrame({"doc_id": pd.Series(ids_, dtype="int64"),
                                "kind": "ppm",
                                "payload": payloads})

    return ids.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        fn, out_schema
    ).select(
        "doc_id", "kind", "payload",
        F.create_map(F.lit("codec"), F.lit("ppm")).alias("meta"),
    )


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
