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
partial-aggregating groupBy on the shingle string — the unavoidable
shuffle of a DF computation; the boilerplate set (rows with df >=
min_df) is small by construction (boilerplate is the HEAD of the df
distribution) and broadcasts back for the per-doc ratio join. At
production scale the shingle would be hashed (xxhash64) before the
shuffle to cut bytes ~10x; the string form is kept here because the
driver oracle compares shingle VALUES (hashes are not
ANSI-SQL-computable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_shingles(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shingle) — DISTINCT k-token string shingles per document
    (single-space tokenization, whole-doc shingle when shorter than k —
    the exact semantics of signatures._batch_shingles, minus hashing)."""
    toks = F.split(F.col(text_col), " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    shingles = F.when(F.size(toks) >= k, windows).otherwise(
        F.array(F.array_join(toks, " "))
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
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
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_ratio) — per-document
    boilerplate contamination. ``min_df`` defaults to
    max(2, floor(n_docs * min_df_ratio)) computed from the input (one
    tiny count action, mirrored in the SQL oracle as a scalar subquery).

    The boilerplate set is broadcast: by construction it is the head of
    the df distribution (|set| <= total_shingle_occurrences / min_df)."""
    sh = doc_shingles(docs, k, id_col, text_col)
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
