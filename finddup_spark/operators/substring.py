"""Substring tier (SURVEY.md §7 M6): long verbatim overlap detection.

Finds pairs of pages sharing a verbatim span of >= ``cfg.lcs_min_chars``
characters — invisible to whole-doc MinHash at the configured threshold
(the generalization of the reference's byte-equality from whole files to
shared spans).

Strategy (all public algorithms):

1. **Winnowing fingerprints** (Schleimer/Wilkerson/Aiken, SIGMOD'03):
   rolling 64-byte gram hashes, min-of-window selection with
   gram + window - 1 == lcs_min_chars, so any shared span of the target
   length is *guaranteed* to share a selected fingerprint. Vectorized
   numpy inside ``mapInPandas`` (prefix-product rolling hash).
2. **Bucket join** on fingerprint value — reuses the LSH pair machinery
   including hot-bucket salting (boilerplate spans are the same skew
   problem as hot bands).
3. **Verification**: exact longest-common-substring length per candidate
   pair via binary search over span length with rolling-hash window
   intersection + byte-exact confirmation (no trusting hashes — the
   reference's discipline, finddup.py:225).

At 100 TB the fingerprint table is the big intermediate: fingerprints
per doc ≈ 2·len/window, i.e. ~0.5% of corpus rows per unique span —
partitioned by fingerprint hash, AQE-coalesced.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..config import DEFAULT_CONFIG, DedupConfig
from ..hashing import rolling_gram_hashes, winnow
from .lsh import candidate_pairs

_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("fp", LongType())]
)


def fingerprints(
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp) winnowing fingerprints — one row per selected gram."""
    gram, window = cfg.winnow_gram, cfg.winnow_window

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[np.ndarray] = []
            fps: list[np.ndarray] = []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                sel = winnow(rolling_gram_hashes(text.encode("utf-8"), gram), window)
                if len(sel):
                    fps.append(sel.view(np.int64))
                    ids.append(np.full(len(sel), did, dtype=np.int64))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
                )
            else:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                    "fp": pd.Series([], dtype="int64")})

    valid = pages.filter(F.col(text_col).isNotNull())
    return valid.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        fn, _FP_SCHEMA
    )


def substring_candidates(
    fps: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame]:
    """Pairs sharing >=1 fingerprint. Reuses the salted LSH pair generator
    (fingerprint buckets skew exactly like hot bands)."""
    as_bands = fps.select(
        F.lit(0).alias("band_id"), F.col("fp").alias("band_hash"), "doc_id"
    )
    return candidate_pairs(as_bands, cfg)


def lcs_length(a: bytes, b: bytes) -> int:
    """Exact longest-common-substring length via binary search on span
    length; each probe intersects rolling-hash window sets and confirms
    byte-exactly. O((|a|+|b|) log min(|a|,|b|))."""
    lo, hi = 0, min(len(a), len(b))

    def shares_span(n: int) -> bool:
        if n == 0:
            return True
        if len(a) < n or len(b) < n:
            return False
        ha, hb = rolling_gram_hashes(a, n), rolling_gram_hashes(b, n)
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        for i_a, i_b in zip(ia, ib):
            if a[i_a : i_a + n] == b[i_b : i_b + n]:
                return True
        return False

    while lo < hi:
        mid = (lo + hi + 1) // 2
        if shares_span(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def verify_substring_pairs(
    pairs: DataFrame,
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """edges(src, dst, sim, method='substring') for pairs whose exact LCS
    >= cfg.lcs_min_chars; sim = lcs_len / min(len) (span coverage)."""
    texts = pages.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("__t")
    )
    joined = (
        pairs.join(texts.withColumnRenamed(id_col, "src").withColumnRenamed("__t", "t_src"), "src")
        .join(texts.withColumnRenamed(id_col, "dst").withColumnRenamed("__t", "t_dst"), "dst")
    )
    min_chars = cfg.lcs_min_chars

    out_schema = StructType(
        [
            StructField("src", LongType()),
            StructField("dst", LongType()),
            StructField("lcs_len", LongType()),
            StructField("min_len", LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, mins = [], []
            for ta, tb in zip(pdf["t_src"].values, pdf["t_dst"].values):
                ba, bb = ta.encode("utf-8"), tb.encode("utf-8")
                lens.append(lcs_length(ba, bb))
                mins.append(min(len(ba), len(bb)))
            yield pd.DataFrame(
                {"src": pdf["src"].values, "dst": pdf["dst"].values,
                 "lcs_len": pd.Series(lens, dtype="int64"),
                 "min_len": pd.Series(mins, dtype="int64")}
            )

    verified = joined.select("src", "dst", "t_src", "t_dst").mapInPandas(fn, out_schema)
    return verified.filter(F.col("lcs_len") >= min_chars).select(
        "src",
        "dst",
        (F.col("lcs_len") / F.greatest(F.col("min_len"), F.lit(1))).alias("sim"),
        F.lit("substring").alias("method"),
    )
