"""Site-subtree duplicate rollup (SURVEY.md §7 M2) — the dir tier.

Reference semantics (``recurse_subtree``, ``finddup.py:571-627`` and
``analyze_dirs``, ``finddup.py:1049-1116``):

- a directory's identity is the **sorted multiset** of its children's
  identity strings (names ignored — renamed duplicates still match,
  ``:621-623``); duplicates kept (two copies of a file ≠ one copy);
- a ``-1`` (unprocessed/error) child contaminates every ancestor
  (``:617-620``) → "unknown" dirs (``:1093-1097``);
- ignored basenames are excluded from identity AND from size rollup
  (``:170-174`` blocks=-1, ``:862-871`` skipped before filetree insert);
- sizes sum bottom-up (``:611-615``).

Web analog: directory = url path prefix ("host/seg1/…"); file id =
exact-tier cluster_id. The recursion becomes a **driver loop over depth**
(bounded, ~<20 for real urls): at each depth one groupBy computes every
dir signature at that level from its children's rows — no trees, no
recursion, each level a single shuffle on the prefix key. Signatures are
sha256 of the comma-joined sorted child signatures, so a level's output
is constant-width regardless of fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IGNORE_BASENAMES

UNKNOWN_SIG = "-1"


def page_leaf_rows(
    pages: DataFrame,
    clusters: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Leaf (file-level) child rows: (parent, child_sig, n_bytes).

    - url → path "host/seg…/leaf" (scheme stripped);
    - child_sig = cluster_id as string for valid pages, '-1' for error
      rows (extraction failures — the unproc analog);
    - ignored basenames (F1) dropped entirely.
    """
    path = F.regexp_replace("url", r"^[a-z]+://", "")
    withp = pages.select(
        "doc_id",
        path.alias("path"),
        F.octet_length(text_col).alias("n_bytes"),
        F.col(text_col).isNull().alias("is_error"),
    ).withColumn(
        "basename", F.element_at(F.split("path", "/"), -1)
    ).withColumn(
        "parent",
        F.expr("array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"),
    )
    kept = withp.filter(~F.col("basename").isin(list(IGNORE_BASENAMES)))
    leaf = kept.join(clusters.select("doc_id", "cluster_id"), "doc_id", "left")
    return leaf.select(
        "parent",
        F.when(F.col("is_error"), F.lit(UNKNOWN_SIG))
        .otherwise(F.col("cluster_id").cast("string"))
        .alias("child_sig"),
        F.when(F.col("is_error"), F.lit(0)).otherwise(F.coalesce("n_bytes", F.lit(0))).alias("n_bytes"),
    )


def leaf_rows_from_tables(
    exact: DataFrame, clusters: DataFrame, errors: DataFrame
) -> DataFrame:
    """Leaf rows built from the exact + clusters + errors STAGE TABLES
    instead of re-scanning the pages source: ``exact`` already carries
    (doc_id, url, n_bytes) for every valid page and ``errors`` the
    failed ones — the full-text column never gets decompressed again.

    Same output contract as :func:`page_leaf_rows` EXCEPT the F1
    ignored-basename filter: inputs must already be split_ignored-
    filtered (the pipeline passes kept/exact tables, which are). Callers
    substituting this for page_leaf_rows on RAW pages would leak ignored
    rows into dir identity."""
    path = F.regexp_replace("url", r"^[a-z]+://", "")
    parent_of = F.expr(
        "array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"
    )
    valid = (
        exact.select("doc_id", path.alias("path"), "n_bytes")
        .join(clusters.select("doc_id", "cluster_id"), "doc_id")
        .select(
            parent_of.alias("parent"),
            F.col("cluster_id").cast("string").alias("child_sig"),
            F.coalesce("n_bytes", F.lit(0)).cast("long").alias("n_bytes"),
        )
    )
    errs = errors.select(path.alias("path")).select(
        parent_of.alias("parent"),
        F.lit(UNKNOWN_SIG).alias("child_sig"),
        F.lit(0).cast("long").alias("n_bytes"),
    )
    return valid.unionByName(errs)


def _level_agg(children: DataFrame) -> DataFrame:
    """One rollup level: children rows (parent, child_sig, n_bytes) →
    dir rows (path, dir_sig, n_bytes, n_children)."""
    has_unknown = F.max((F.col("child_sig") == UNKNOWN_SIG).cast("int")) == 1
    sig = F.sha2(
        F.concat_ws(",", F.sort_array(F.collect_list("child_sig"))), 256
    )
    return (
        children.groupBy(F.col("parent").alias("path"))
        .agg(
            F.when(has_unknown, F.lit(UNKNOWN_SIG)).otherwise(sig).alias("dir_sig"),
            F.sum("n_bytes").alias("n_bytes"),
            F.count(F.lit(1)).alias("n_children"),
        )
    )


def _driver_rollup(spark: SparkSession, pdf_children) -> DataFrame:
    """Small-corpus path: bottom-up rollup on the driver — the same
    cardinality-dependent strategy switch as operators/cc.py (reference
    P4, ``finddup.py:434-467``). Semantics identical to the distributed
    loop: sha256 over the sorted child-sig multiset, '-1' contamination,
    bytes summed bottom-up.

    Vectorized: per level, one pandas mergesort over (parent, child_sig)
    + numpy ``reduceat`` segmentation; python touches only one iteration
    per DIRECTORY (for the join+sha), never per child row. Both a
    row-wise dict loop and pandas groupby-join aggs measured slower at
    10^6 leaf rows."""
    import hashlib

    import numpy as np
    import pandas as pd

    if isinstance(pdf_children, pd.DataFrame):
        pend = pdf_children[["parent", "child_sig", "n_bytes"]].copy()
    else:
        pend = pd.DataFrame(
            list(pdf_children), columns=["parent", "child_sig", "n_bytes"]
        )
    out = []
    if len(pend):
        pend["n_bytes"] = pend["n_bytes"].astype("int64")
        pend["depth"] = pend["parent"].str.count("/") + 1
        max_d = int(pend["depth"].max())
        for d in range(max_d, 0, -1):
            level = pend[pend["depth"] == d]
            if len(level) == 0:
                continue
            lv = level.sort_values(["parent", "child_sig"], kind="mergesort")
            par = lv["parent"].values
            sig = lv["child_sig"].values
            nb = lv["n_bytes"].values
            new = np.ones(len(par), dtype=bool)
            new[1:] = par[1:] != par[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(par))
            nbytes = np.add.reduceat(nb, starts)
            unk = np.logical_or.reduceat(sig == UNKNOWN_SIG, starts)
            paths = par[starts]
            dir_sigs = np.empty(len(starts), dtype=object)
            for i in range(len(starts)):
                if unk[i]:
                    dir_sigs[i] = UNKNOWN_SIG
                else:
                    # same bytes the distributed path hashes:
                    # sha256(",".join(sorted(child_sigs)))
                    dir_sigs[i] = hashlib.sha256(
                        ",".join(sig[starts[i]:ends[i]]).encode()
                    ).hexdigest()
            out.append(pd.DataFrame({
                "path": paths, "depth": d, "dir_sig": dir_sigs,
                "n_bytes": nbytes, "n_children": (ends - starts),
            }))
            if d > 1:
                parents = pd.Series(paths).str.rsplit("/", n=1).str[0]
                pend = pd.concat([
                    pend[pend["depth"] < d],
                    pd.DataFrame({
                        "parent": parents.values,
                        "child_sig": dir_sigs,
                        "n_bytes": nbytes,
                        "depth": d - 1,
                    }),
                ], ignore_index=True)

    if not out:
        return spark.createDataFrame(
            [], "path string, depth int, dir_sig string, n_bytes long, n_children long"
        )
    pdf = pd.concat(out, ignore_index=True)
    pdf = pdf.astype({"depth": "int32", "n_bytes": "int64", "n_children": "int64"})
    # pandas → Arrow → JVM (one batch); a tuple list would go row-by-row
    # through py4j (~10x slower at 10^5 dirs)
    return spark.createDataFrame(pdf)


def rollup_dirs(
    spark: SparkSession,
    leaf_rows: DataFrame,
    checkpoint: bool = True,
    driver_threshold: int = 150_000,
) -> DataFrame:
    """dirs(path, depth, dir_sig, n_bytes, n_children) for every prefix.

    Driver loop from the deepest prefix level up to the host level (A4).
    Each level emits its dirs AND feeds them as child rows into the next
    level up. ``localCheckpoint`` per level keeps the plan flat (the loop
    is the reference's recursion inverted — bottom-up instead of
    post-order DFS).

    ``driver_threshold``: below it the whole rollup runs as vectorized
    pandas on the driver (a handful of Spark-job overheads beats a
    sub-second compute); above it the per-level DISTRIBUTED loop runs —
    measured 1.5-2.5x faster than the driver path already at 1M pages
    (410k dirs: the driver path's Arrow collect + pandas sort dominate)
    and, unlike the driver path, it scales with executors. The round-1
    3M threshold assumed the deepest level held ~all leaves, which is
    false for real url depth distributions (leaves spread over depths).
    """
    depth_of = F.size(F.split("parent", "/"))
    leaves = leaf_rows.withColumn("depth", depth_of)
    # limit-guarded collect (same idiom as operators/cc.py): ONE Arrow
    # action both decides the strategy and, in the common small case,
    # delivers every leaf row to the vectorized driver rollup — the
    # previous hybrid spent three actions here (count/max agg + a
    # distributed deepest-level agg + a second collect) to avoid
    # collecting ≤ driver_threshold rows ≈ 15 MB, which the Arrow path
    # moves in milliseconds. At most driver_threshold + 1 rows ever reach
    # the driver; overflow falls through to the distributed per-level
    # loop, which scales with executors.
    probe = (
        leaves.select("parent", "child_sig", "n_bytes")
        .limit(driver_threshold + 1)
        .toPandas()
    )
    if len(probe) == 0:
        return spark.createDataFrame(
            [], "path string, depth int, dir_sig string, n_bytes long, n_children long"
        )
    if len(probe) <= driver_threshold:
        return _driver_rollup(spark, probe)
    # persist the leaf rows ONCE: every level filters them by depth, and
    # without the cache each level re-runs the whole leaf chain (pages
    # scan + clusters join) — measured as both slow AND high-variance.
    leaves = leaves.persist()
    max_depth = leaves.agg(F.max("depth")).collect()[0][0]

    all_dirs = []
    # only the PARENT rows produced by the level below thread level-to-
    # level (constant-width, ~|dirs at that level|); the old growing
    # `pending` union made level d re-scan every earlier level's plan.
    parents_next: DataFrame | None = None
    for d in range(int(max_depth), 0, -1):
        level_children = leaves.filter(F.col("depth") == d).select(
            "parent", "child_sig", "n_bytes"
        )
        if parents_next is not None:
            level_children = level_children.unionByName(parents_next)
        dirs_d = _level_agg(level_children).withColumn("depth", F.lit(d))
        if checkpoint:
            dirs_d = dirs_d.localCheckpoint(eager=True)
        else:
            dirs_d = dirs_d.persist()
        all_dirs.append(dirs_d)
        if d > 1:
            # a dir becomes a child row of its own parent one level up
            parents_next = dirs_d.select(
                F.expr(
                    "array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"
                ).alias("parent"),
                F.col("dir_sig").alias("child_sig"),
                "n_bytes",
            )
        else:
            parents_next = None

    out = all_dirs[0]
    for dfr in all_dirs[1:]:
        out = out.unionByName(dfr)
    return out.select("path", "depth", "dir_sig", "n_bytes", "n_children")


def analyze_dirs(dirs: DataFrame) -> DataFrame:
    """A5 split (``finddup.py:1049-1116``): classify every dir as
    dup / unique / unknown and assign dir-cluster ids (min path per sig).

    Output: (path, depth, dir_sig, n_bytes, n_children, status,
    dir_cluster) where status ∈ {dup, unique, unknown}.
    """
    known = dirs.filter(F.col("dir_sig") != UNKNOWN_SIG)
    groups = known.groupBy("dir_sig").agg(
        F.count(F.lit(1)).alias("n_dirs"),
        F.min("path").alias("dir_cluster"),
    )
    classified = known.join(groups, "dir_sig").select(
        "path", "depth", "dir_sig", "n_bytes", "n_children",
        F.when(F.col("n_dirs") > 1, F.lit("dup")).otherwise(F.lit("unique")).alias("status"),
        "dir_cluster",
    )
    unknown = dirs.filter(F.col("dir_sig") == UNKNOWN_SIG).select(
        "path", "depth", "dir_sig", "n_bytes", "n_children",
        F.lit("unknown").alias("status"),
        F.col("path").alias("dir_cluster"),
    )
    return classified.unionByName(unknown)


def dup_dirs_report(analyzed: DataFrame) -> DataFrame:
    """O1 ordering for dirs: dup groups by descending size, members sorted,
    trailing '/' like the reference (``finddup.py:1103-1108``)."""
    return (
        analyzed.filter(F.col("status") == "dup")
        .groupBy("dir_sig")
        .agg(
            F.max("n_bytes").alias("n_bytes"),
            F.count(F.lit(1)).alias("n_members"),
            F.sort_array(F.collect_list(F.concat("path", F.lit("/")))).alias("members"),
        )
        .orderBy(F.desc("n_bytes"), F.asc("dir_sig"))
    )
