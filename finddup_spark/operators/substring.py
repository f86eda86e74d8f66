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
    with_lcs_len: bool = False,
) -> DataFrame:
    """edges(src, dst, sim, method='substring'[, lcs_len]) for pairs
    sharing a byte-confirmed verbatim span of >= cfg.lcs_min_chars chars.

    Predicate: the pair shares at least one ``min_chars``-byte rolling-hash
    window whose bytes compare equal — exactly "LCS >= min_chars" (the
    boolean the mirror oracle checks), without the per-pair binary-search
    LCS of :func:`lcs_length` (measured ~30x cheaper).
    ``sim`` = |shared min_chars-windows| / min(window count) — span
    coverage in [0, 1]; 1.0 for identical texts.

    ``with_lcs_len=True`` additionally emits the EXACT longest-common-
    substring length per confirmed pair (binary-search
    :func:`lcs_length`) — for callers that need span lengths (plagiarism
    spans, contamination audits); off by default because it multiplies
    per-pair cost by O(log min(len)).

    Each distinct doc in an Arrow batch is hashed ONCE (candidate pairs
    cluster around hot docs, so per-pair hashing would recompute the same
    doc many times).
    """
    texts = pages.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("__t")
    )
    # prune texts to pair participants first (same rationale as
    # lsh.verify_pairs; semi-join strategy left to AQE — see the note
    # there on why a forced broadcast is wrong at web scale)
    participants = (
        pairs.select(F.col("src").alias(id_col))
        .unionByName(pairs.select(F.col("dst").alias(id_col)))
        .distinct()
    )
    texts = texts.join(participants, id_col, "left_semi")
    joined = (
        pairs.join(texts.withColumnRenamed(id_col, "src").withColumnRenamed("__t", "t_src"), "src")
        .join(texts.withColumnRenamed(id_col, "dst").withColumnRenamed("__t", "t_dst"), "dst")
    )
    # no explicit repartition (see lsh.verify_pairs): the text-laden join
    # output stays parallel under the session's 8 MB AQE advisory
    min_chars = cfg.lcs_min_chars

    from pyspark.sql.types import DoubleType

    out_fields = [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("sim", DoubleType()),
    ]
    if with_lcs_len:
        out_fields.append(StructField("lcs_len", LongType()))
    out_schema = StructType(out_fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-doc window-hash cache: candidate pairs cluster around hot
        # docs; hash each doc once per batch, not once per pair
        def windows_of(cache: dict, did: int, text: str):
            got = cache.get(did)
            if got is None:
                enc = text.encode("utf-8")
                h = rolling_gram_hashes(enc, min_chars)
                got = (enc, h, np.sort(h))
                cache[did] = got
            return got

        for pdf in batches:
            cache: dict = {}
            n = len(pdf)
            sims = np.zeros(n, dtype=np.float64)
            lens = np.zeros(n, dtype=np.int64)
            src_v, dst_v = pdf["src"].values, pdf["dst"].values
            ts_v, td_v = pdf["t_src"].values, pdf["t_dst"].values
            for i in range(n):
                ea, ha, sa = windows_of(cache, src_v[i], ts_v[i])
                eb, hb, sb = windows_of(cache, dst_v[i], td_v[i])
                if len(sa) == 0 or len(sb) == 0:
                    continue
                common = np.intersect1d(sa, sb)  # sorted-unique both sides
                if len(common) == 0:
                    continue
                # byte-exact confirmation of at least one shared window
                # (no trusting hashes — the reference's discipline,
                # finddup.py:225); collisions are ~2^-64 so the first
                # common value almost always confirms
                confirmed = False
                for v in common:
                    ia = int(np.nonzero(ha == v)[0][0])
                    ib = int(np.nonzero(hb == v)[0][0])
                    if ea[ia : ia + min_chars] == eb[ib : ib + min_chars]:
                        confirmed = True
                        break
                if confirmed:
                    sims[i] = len(common) / min(len(sa), len(sb))
                    if with_lcs_len:
                        lens[i] = lcs_length(ea, eb)
            keep = sims > 0
            out = {"src": src_v[keep], "dst": dst_v[keep], "sim": sims[keep]}
            if with_lcs_len:
                out["lcs_len"] = lens[keep]
            yield pd.DataFrame(out)

    verified = joined.select("src", "dst", "t_src", "t_dst").mapInPandas(fn, out_schema)
    keep_cols = ["src", "dst", "sim", F.lit("substring").alias("method")]
    if with_lcs_len:
        keep_cols.append(F.col("lcs_len"))
    return verified.select(*keep_cols)
