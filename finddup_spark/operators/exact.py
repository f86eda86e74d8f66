"""Exact-duplicate tier (SURVEY.md §7 M1) — the reference's core semantics.

Reference pipeline (``finddup.py``): size blocking (``:876``) → singleton
short-circuit (``:419-421``) → progressive chunked byte-compare
(``compare_file_group``, ``:388-568``) → dup groups / uniques
(``:523-536``).

Spark re-expression (NOT a port — content is a column, so the whole
progressive-compare kernel collapses into declarative aggregation):

1. **P1 length blocking**: ``groupBy(length(text))`` keeping only lengths
   with count > 1 — only same-length docs can be byte-identical, and the
   multi-member length list is tiny → broadcast semi-join, so singleton
   docs never shuffle their text at all.
2. *(optional)* **P2 progressive prefix key**: ``xxhash64(substring(text,
   1, 256))`` — the analog of the reference's 256-byte first pass
   (``finddup.py:428``); a second cheap blocking level before full-text
   hashing. Off by default; bench decides (SURVEY.md §4 P2).
3. **A2 content grouping**: window-aggregate over ``sha2(text, 256)``
   with dual-digest verification — an independent ``xxhash64`` must also
   be constant within the sha group (simultaneous collision ~2^-192).
   Replaces the reference's pairwise chunk-equality loop
   (``finddup.py:199-236``); text itself never shuffles.
4. **A7 cluster ids**: ``cluster_id = min(doc_id)`` per group —
   deterministic, unlike the reference's insertion-order ints
   (``finddup.py:1007-1047``); only equality structure is comparable.

Every step is built-in Spark (whole-stage codegen, AQE-sized shuffles);
no UDFs anywhere in this tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, IGNORE_BASENAMES, DedupConfig


def split_ignored(pages: DataFrame, url_col: str = "url") -> tuple[DataFrame, DataFrame]:
    """F1 ignore-name filter (``finddup.py:170-174, 681-687``): rows whose
    url basename is an ignored name are excluded from ALL results — file
    clusters, uniques, and dir identity (``finddup.py:862-871``) — and
    reported separately (the report's "Ignored Files" section).

    Returns (kept, ignored)."""
    basename = F.element_at(F.split(url_col, "/"), -1)
    pred = basename.isin(list(IGNORE_BASENAMES))
    return pages.filter(~pred), pages.filter(pred)


def split_kinds(
    pages: DataFrame,
    kind_col: str = "kind",
    keep_kinds: tuple[str, ...] = ("page",),
) -> tuple[DataFrame, DataFrame]:
    """F2-F4 analogs (symlink / FIFO / socket skips,
    ``finddup.py:175-192``): rows whose ``kind`` is not a processable page
    (redirects ≈ symlinks, fetch errors ≈ sockets/FIFOs) are excluded from
    all results — clusters, uniques, dir identity — and reported in the
    unproc section (:func:`finddup_spark.operators.report_ops.unproc_report`).

    Returns (kept, skipped). A pages table without the kind column keeps
    everything (the input_hint schema has no kind; crawlers that record
    one get the filter for free)."""
    if kind_col not in pages.columns:
        return pages, None
    pred = F.col(kind_col).isin(list(keep_kinds))
    return pages.filter(pred), pages.filter(~pred)


def valid_pages(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Filter to processable rows (reference S3 skip classification,
    ``finddup.py:119-196``: unreadable → unproc). Error rows flow to the
    lineage sink instead (plans/pipeline.py)."""
    return pages.filter(F.col(text_col).isNotNull())


def error_pages(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """The complement — the reference's ``unproc_files`` (finddup.py:841,863)."""
    return pages.filter(F.col(text_col).isNull())


def exact_clusters(
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_prefix_key: bool = False,
    verify: bool = True,
) -> DataFrame:
    """Exact-dup cluster assignment for every valid page.

    Returns (id_col, url?, cluster_id, cluster_size, n_bytes, verified):
    singletons keep ``cluster_id == doc_id`` and ``cluster_size == 1``
    (reference unique_files, ``finddup.py:507-515``).
    """
    valid = valid_pages(pages, text_col)
    keep = [c for c in (id_col, "url") if c in valid.columns]
    base = valid.select(*keep, F.col(text_col).alias("__text"),
                        F.length(text_col).alias("text_len"),
                        F.octet_length(text_col).alias("n_bytes"))

    # ---- P1: broadcast semi-join on multi-member lengths ----
    block_keys = ["text_len"]
    if use_prefix_key:
        base = base.withColumn(
            "prefix_key",
            F.xxhash64(F.substring("__text", 1, cfg.prefix_key_len)),
        )
        block_keys.append("prefix_key")
    multi = (
        base.groupBy(*block_keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select(*block_keys)
        .persist()  # tiny; reused by both the semi- and anti-join
    )
    cand = base.join(F.broadcast(multi), block_keys, "left_semi")
    single = base.join(F.broadcast(multi), block_keys, "left_anti")

    # ---- A2/A7: content hash grouping + verification + min-id cluster ----
    # Hash at scan time and DROP the text before any shuffle: only ~50-byte
    # rows move. Verification is dual-digest — within a sha-256 group, an
    # independent xxhash64 must also be constant (simultaneous collision
    # ~2^-192; the reference compares raw bytes, finddup.py:225, but
    # shuffling full text twice to re-compare bytes is exactly what a
    # 100 TB run can't afford). ONE window shuffle replaces the
    # groupBy + join-back (which shuffled the text twice and scanned the
    # source twice).
    from pyspark.sql.window import Window

    hashed = cand.select(
        *keep,
        F.col("n_bytes"),
        F.sha2(F.col("__text"), 256).alias("content_sha"),
        F.xxhash64(F.col("__text")).alias("__xx"),
    )
    w = Window.partitionBy("content_sha")
    verified_col = (
        (F.min("__xx").over(w) == F.max("__xx").over(w)) if verify else F.lit(True)
    )
    clustered = hashed.select(
        *keep,
        F.min(id_col).over(w).alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.col("n_bytes"),
        verified_col.alias("verified"),
    )
    singles = single.select(
        *keep,
        F.col(id_col).alias("cluster_id"),
        F.lit(1).alias("cluster_size"),
        F.col("n_bytes"),
        F.lit(True).alias("verified"),
    )
    return clustered.unionByName(singles)


def dup_groups_report(clusters: DataFrame, member_col: str = "url") -> DataFrame:
    """The reference's report ordering (S6/O1, ``finddup.py:1183-1187``):
    duplicate groups descending by byte size, members sorted; uniques
    excluded. ``sort_array(collect_list(url))`` keeps members canonical."""
    return (
        clusters.filter(F.col("cluster_size") > 1)
        .groupBy("cluster_id")
        .agg(
            F.max("n_bytes").alias("n_bytes"),
            F.count(F.lit(1)).alias("n_members"),
            F.sort_array(F.collect_list(member_col)).alias("members"),
        )
        .orderBy(F.desc("n_bytes"), F.asc("cluster_id"))
    )


def unique_report(clusters: DataFrame, member_col: str = "url") -> DataFrame:
    """O2: uniques sorted alphabetically (``finddup.py:1199-1205``)."""
    return (
        clusters.filter(F.col("cluster_size") == 1)
        .select(member_col, "n_bytes")
        .orderBy(member_col)
    )
