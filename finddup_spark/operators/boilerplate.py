"""Corpus-level boilerplate n-gram detection (training-pipeline operator).

Web corpora carry shared boilerplate (navigation, footers, cookie
banners) that inflates near-dup candidate buckets and pollutes training
data. The standard cure is corpus-level n-gram document frequency: a
k-token shingle appearing in more than ``min_df`` documents is
boilerplate; per-document the fraction of boilerplate shingles is a
quality signal (and the shingle list a removal mask).

Everything here is JVM-side built-ins (split / transform / slice /
array_join / explode + two hash aggregations) — no UDF, full
whole-stage codegen, and the shingle strings mirror the engine's hashed
shingle semantics (signatures._batch_shingles: k-token windows over
single-space tokens; docs shorter than k take one whole-doc shingle), so
a DuckDB oracle reproduces the output exactly.

Scale shape: one explode (corpus tokens × ~1 row per token) feeding a
partial-aggregating groupBy on the shingle — the unavoidable shuffle of
a DF computation; the boilerplate set (rows with df >= min_df) is small
by construction (boilerplate is the HEAD of the df distribution) and
broadcasts back for the per-doc ratio join.

``hashed=True`` (the production DEFAULT) xxhash64-hashes each shingle
INSIDE the per-doc array, before the explode and both shuffles
(doc-distinct and df-groupBy), so every exchanged row carries an 8-byte
long instead of a ~30-60-byte k-token string — ~5-10x fewer shuffle
bytes with identical counts up to 64-bit collisions (~n²/2⁶⁴,
negligible at any df threshold). The string form (``hashed=False``) is
kept for the driver oracle query, whose DuckDB twin recomputes shingle
VALUES (xxhash64 is not ANSI-SQL-computable), and doubles as the
collision-free reference in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_shingles(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, shingle) — DISTINCT k-token shingles per document
    (single-space tokenization, whole-doc shingle when shorter than k —
    the exact semantics of signatures._batch_shingles). ``hashed=True``
    replaces each shingle string with its xxhash64 (a long) while still
    inside the per-document array — upstream of the explode and of every
    shuffle, so no exchange ever carries shingle text."""
    toks = F.split(F.col(text_col), " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    shingles = F.when(F.size(toks) >= k, windows).otherwise(
        F.array(F.array_join(toks, " "))
    )
    if hashed:
        shingles = F.transform(shingles, lambda s: F.xxhash64(s))
    # per-doc dedup INSIDE the array, before the explode: array_distinct is
    # map-side, so the (doc_id, shingle) stream needs NO distinct exchange
    # at all — the previous explode-then-distinct shuffled every shingle
    # occurrence of the corpus once just to dedup within each doc
    # (guide §2.4 "remove shuffles outright"; output is identical).
    # ensure_min_partitions: the shingle build is the compute-dense step
    # (O(tokens·k) string work per doc) — a 1-2-split local input would
    # otherwise run it on 1-2 cores (no-op on corpus-scale inputs); both
    # consumers of this function share the one exchange (ReusedExchange).
    from ..session import ensure_min_partitions

    base = ensure_min_partitions(docs.filter(F.col(text_col).isNotNull()))
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def boilerplate_shingles(
    shingles: DataFrame, min_df: int
) -> DataFrame:
    """(shingle, df) — shingles whose document frequency >= min_df."""
    return (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )


def boilerplate_ratio(
    docs: DataFrame,
    k: int = 5,
    min_df: int | None = None,
    min_df_ratio: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_ratio) — per-document
    boilerplate contamination. ``min_df`` defaults to
    max(2, floor(n_docs * min_df_ratio)) computed from the input (one
    tiny count action, mirrored in the SQL oracle as a scalar subquery).

    ``hashed=True`` (default, the production path) shuffles 8-byte
    shingle hashes instead of shingle strings — identical output up to
    negligible 64-bit collisions; pass ``hashed=False`` for the
    collision-free string form the SQL oracle can recompute.

    The boilerplate set is broadcast: by construction it is the head of
    the df distribution (|set| <= total_shingle_occurrences / min_df)."""
    sh = doc_shingles(docs, k, id_col, text_col, hashed=hashed)
    if min_df is None:
        n_docs = docs.filter(F.col(text_col).isNotNull()).count()
        min_df = max(2, int(n_docs * min_df_ratio))
    bp = boilerplate_shingles(sh, min_df).select("shingle")
    joined = sh.join(
        F.broadcast(bp).withColumn("__bp", F.lit(1)), "shingle", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce("__bp", F.lit(0))).cast("long").alias("n_boiler"),
        F.round(
            F.sum(F.coalesce("__bp", F.lit(0))) / F.count(F.lit(1)), 6
        ).alias("boiler_ratio"),
    )
