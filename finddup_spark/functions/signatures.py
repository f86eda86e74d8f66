"""Signature computation (SURVEY.md §7 M3): shingles → MinHash + SimHash.

The scalar layer the reference never had (SURVEY.md §2.8) — all
Arrow-batched ``mapInPandas`` with numpy inner math, no per-row Python in
the hot path:

- tokenization: pandas C-level ``.str.split()``;
- token hashing: FNV-1a over the *unique* vocabulary of the batch only
  (Zipf text ⇒ |vocab| ≪ |tokens|), then gather;
- shingling: ONE global masked window op over the concatenated token-hash
  array of the whole batch (windows crossing doc boundaries masked out);
- MinHash: one (perms × N) modular matrix op + segmented min
  (``np.minimum.reduceat``) per batch;
- SimHash: segmented bit-vote matrix (``np.add.reduceat``).

uint64 values are stored reinterpreted as int64 (Spark LongType); the
mapping is bijective and applied identically in the mirror oracle, and
only equality of signatures ever matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..config import DEFAULT_CONFIG, DedupConfig
from ..hashing import (
    band_hashes,
    hash_utf8_array,
    minhash_batch,
    shingle_hashes,
    simhash_batch,
    splitmix64,
)

_I64 = np.int64


def _batch_shingles(
    texts: pd.Series, cfg: DedupConfig
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-doc (unique shingle hashes, multiplicities) for one Arrow batch.

    Fully vectorized: one global window op + one lexsort-based unique over
    (doc, shingle) pairs. Docs shorter than k get one whole-doc shingle.
    """
    tok_lists = texts.str.split()
    n_docs = len(tok_lists)
    lengths = np.array([len(t) if isinstance(t, list) else 0 for t in tok_lists])
    if lengths.sum() == 0:
        return [np.empty(0, np.uint64)] * n_docs, [np.empty(0, np.float64)] * n_docs
    flat = np.concatenate([t for t in tok_lists if isinstance(t, list) and t])
    uniq, codes = np.unique(flat, return_inverse=True)
    tok_h = hash_utf8_array(uniq, cfg.seed)[codes]  # (N,) uint64

    k = cfg.shingle_k
    doc_idx = np.repeat(np.arange(n_docs), lengths)
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])

    out_sh: list[np.ndarray] = [np.empty(0, np.uint64)] * n_docs
    out_w: list[np.ndarray] = [np.empty(0, np.float64)] * n_docs

    N = len(tok_h)
    if N >= k:
        # global polynomial window (same math as hashing.shingle_hashes)
        from ..hashing import SHINGLE_MULT

        vals = np.full(k, SHINGLE_MULT, dtype=np.uint64)
        vals[0] = np.uint64(1)
        powers = np.multiply.accumulate(vals)[::-1].copy()
        n_win = N - k + 1
        acc = np.zeros(n_win, dtype=np.uint64)
        for j in range(k):
            acc += tok_h[j : j + n_win] * powers[j]
        win_h = splitmix64(acc)
        valid = doc_idx[:n_win] == doc_idx[k - 1 :]  # window inside one doc
        w_doc = doc_idx[:n_win][valid]
        w_hash = win_h[valid]
        # segmented unique+counts via lexsort over (doc, hash)
        order = np.lexsort((w_hash, w_doc))
        sd, sh = w_doc[order], w_hash[order]
        new = np.ones(len(sd), dtype=bool)
        if len(sd) > 1:
            new[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(sd)))
        u_doc, u_hash = sd[starts], sh[starts]
        # split back per doc
        doc_starts = np.searchsorted(u_doc, np.arange(n_docs))
        doc_ends = np.searchsorted(u_doc, np.arange(n_docs), side="right")
        for d in range(n_docs):
            lo, hi = doc_starts[d], doc_ends[d]
            if hi > lo:
                out_sh[d] = u_hash[lo:hi]
                out_w[d] = counts[lo:hi].astype(np.float64)

    # short docs (0 < n < k): one whole-doc shingle (rare — small loop)
    for d in np.nonzero((lengths > 0) & (lengths < k))[0]:
        h = shingle_hashes(tok_h[offsets[d] : offsets[d] + lengths[d]], k)
        out_sh[int(d)] = h
        out_w[int(d)] = np.ones(len(h), dtype=np.float64)
    return out_sh, out_w


SIGNATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("minhash", ArrayType(LongType())),
        StructField("simhash", LongType()),
        StructField("n_shingles", LongType()),
        StructField("shingles", ArrayType(LongType())),
    ]
)


def compute_signatures(
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_shingles: bool = True,
) -> DataFrame:
    """signatures(doc_id, minhash array<long>, simhash long, n_shingles,
    shingles array<long>) for every valid page.

    ``shingles`` (sorted unique hashes) makes pair verification a pure
    JVM ``array_intersect/array_union`` — no Python at verify time. At
    100 TB you may drop it (``include_shingles=False``) and re-shingle
    inside verification instead; at bench scale carrying it wins.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh, w = _batch_shingles(pdf[text_col], cfg)
            lengths = np.array([len(s) for s in sh])
            allsh = (
                np.concatenate([s for s in sh if len(s)])
                if lengths.sum()
                else np.empty(0, np.uint64)
            )
            allw = (
                np.concatenate([x for x in w if len(x)])
                if lengths.sum()
                else np.empty(0, np.float64)
            )
            mh = minhash_batch(allsh, lengths, cfg)
            simh = simhash_batch(allsh, allw, lengths)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "minhash": [r.astype(_I64) for r in mh.view(np.uint64)],
                    "simhash": simh.view(_I64),
                    "n_shingles": lengths.astype(_I64),
                    "shingles": [
                        np.sort(s).astype(np.uint64).view(_I64) for s in sh
                    ]
                    if include_shingles
                    else [np.empty(0, _I64)] * len(sh),
                }
            )
            yield out

    valid = pages.filter(F.col(text_col).isNotNull())
    proj = valid.select(F.col(id_col).cast("long").alias(id_col), text_col)
    # ensure the UDF actually parallelizes: small/local inputs often arrive
    # as 1-2 parquet splits — spread them across the executor cores. (A
    # 100 TB input already has thousands of splits; this is a no-op there.)
    sc = pages.sparkSession.sparkContext
    if proj.rdd.getNumPartitions() < sc.defaultParallelism:
        proj = proj.repartition(sc.defaultParallelism)
    return proj.mapInPandas(fn, SIGNATURE_SCHEMA)


def make_band_hash_udf(cfg: DedupConfig = DEFAULT_CONFIG):
    """bands×rows hashing of minhash arrays (numpy matrix per batch)."""
    bands, rows = cfg.bands, cfg.rows_per_band

    @F.pandas_udf(ArrayType(LongType()))
    def band_hash_udf(minhash: pd.Series) -> pd.Series:
        if len(minhash) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in minhash]).astype(
            np.uint64
        )
        bh = band_hashes(mat, bands, rows)
        return pd.Series([row.view(np.int64) for row in bh])

    return band_hash_udf


def explode_bands(signatures: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """bands(band_id int, band_hash long, doc_id long) — the LSH index
    (SURVEY.md §1.3). ``posexplode`` plays the UDTF role (§2.10)."""
    udf = make_band_hash_udf(cfg)
    return signatures.select(
        "doc_id", F.posexplode(udf("minhash")).alias("band_id", "band_hash")
    ).select("band_id", "band_hash", "doc_id")
