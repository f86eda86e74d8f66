"""Similarity search over embedding columns (training-pipeline operator).

- :func:`brute_force_topk` — exact cosine top-k, all JVM-side
  (``zip_with`` dot product + window top-k): the correctness baseline.
- :func:`hyperplane_buckets` / :func:`lsh_topk` — random-hyperplane LSH
  (sign sketch) bucketing: the scale path. Buckets are seeded and
  deterministic; candidates are re-ranked with exact cosine, so the
  only approximation is bucket recall (multi-probe via ``n_tables``).

At 100 TB the brute-force self-join is quadratic — it exists for oracle
checks and small query sets; the LSH variant shuffles each vector to
``n_tables`` buckets and joins within buckets only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_norm(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Project (id, vec_d: array<double>, norm)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col),
        vec_d.alias("vec_d"),
        F.sqrt(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
    )


def cosine_expr(va: str, vb: str, na: str, nb: str) -> Column:
    dot = F.aggregate(
        F.zip_with(F.col(va), F.col(vb), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col(na) * F.col(nb)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    emb: DataFrame,
    k: int = 3,
    query_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — exact top-k by cosine.

    ``query_ids`` bounds the left side (broadcast) so the join is
    |queries| × N, not N²; None means all-pairs (oracle scale only).
    """
    from ..session import ensure_min_partitions

    # the per-pair cosine fold below is the compute-dense step: spread a
    # 1-2-split local input across the cores first (no-op at scale)
    e = with_norm(ensure_min_partitions(emb), id_col, vec_col)
    q = e.select(F.col(id_col).alias("query_id"), F.col("vec_d").alias("vq"), F.col("norm").alias("nq"))
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin([int(x) for x in query_ids]))
        q = F.broadcast(q)
    c = e.select(F.col(id_col).alias("neighbor_id"), F.col("vec_d").alias("vc"), F.col("norm").alias("nc"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def hyperplane_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(table_id, bucket, vec_id) — sign-sketch LSH index.

    Signs of <v, h_i> per table pack into an int bucket key. Computed with
    a vectorized pandas UDF (one (batch × dim) @ (dim × planes) matmul per
    Arrow batch per table).
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    planes = _hyperplanes(dim, n_planes, n_tables, seed)

    def _buckets(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (B, dim)
        keys = np.zeros((m.shape[0], planes.shape[0]), dtype=np.int64)
        for t in range(planes.shape[0]):
            signs = (m @ planes[t].T) > 0  # (B, planes)
            keys[:, t] = signs.dot(1 << np.arange(signs.shape[1], dtype=np.int64))
        return pd.Series(list(keys))

    bucket_udf = F.pandas_udf(_buckets, ArrayType(LongType()))

    return emb.select(
        F.col(id_col), F.posexplode(bucket_udf(F.col(vec_col))).alias("table_id", "bucket")
    ).select("table_id", "bucket", id_col)


def ivf_topk(
    emb: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 4096,
    centroids: DataFrame | None = None,
    return_stats: bool = False,
):
    """IVF-Flat approximate top-k: coarse-quantize vectors into cells,
    probe the ``n_probe`` nearest cells per query, exact-cosine re-rank.
    Same output shape as brute_force_topk.

    The coarse quantizer here is the ``n_cells`` lowest-id vectors used
    as centroids — deterministic, trainless, and (for i.i.d. embedding
    data) equivalent to a random sample, which is a standard cheap
    alternative to k-means for the IVF coarse stage. Production swaps a
    trained quantizer into the same plumbing; everything downstream
    (assignment, cell join, probe, re-rank) is unchanged.

    Scale shape: centroids are broadcast (n_cells rows); assignment is a
    broadcast cross-join + window argmax — O(N·n_cells) compares with no
    N×N anywhere; the candidate join is an equi join on cell id, and
    per-query work is bounded by the probed cells' population (cells are
    ~N/n_cells for i.i.d. data). A SKEWED cell (pathological centroid
    attracting O(N) members) is handled like a hot LSH bucket:
    ``cell_cap`` bounds the NEIGHBOR side of each cell to its first
    ``cell_cap`` members by id (the lsh_topk ``bucket_cap`` machinery),
    so per-query candidate work is O(n_probe·cell_cap) even under a
    degenerate quantizer. No silent caps: ``return_stats=True`` also
    returns a one-row (n_cells_used, capped_cells, max_cell) DataFrame
    for the lineage sink.

    ``centroids``: optional (cell, vcent: array<double>, ncent) DataFrame
    from :func:`train_ivf_centroids` — a trained quantizer plugged into
    the same plumbing; None keeps the trainless lowest-id quantizer
    (deterministic, SQL-oracle-able).

    Assignment and probe scores are rounded to 6 decimals with ties
    broken by centroid id, so an independent SQL oracle reproduces cell
    membership bit-for-bit (float summation order differs between
    engines; unrounded argmax could flip near-ties).
    """
    e = with_norm(emb, id_col, vec_col)
    cents = centroids if centroids is not None else (
        e.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell"),
            F.col("vec_d").alias("vcent"),
            F.col("norm").alias("ncent"),
        )
    )
    scored_cells = (
        e.crossJoin(F.broadcast(cents))
        .select(
            id_col, "vec_d", "norm", "cell",
            F.round(cosine_expr("vec_d", "vcent", "norm", "ncent"), 6).alias("cs"),
        )
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("cs"), F.asc("cell"))
    assigned = (
        scored_cells.withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") == 1)
        .select(id_col, "cell")
    )
    probes = (
        scored_cells.withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") <= n_probe)
        .select(F.col(id_col).alias("query_id"), "cell")
    )
    wc = Window.partitionBy("cell").orderBy(id_col)
    capped = (
        assigned.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= cell_cap)
        .select(F.col(id_col).alias("neighbor_id"), "cell")
    )
    cand = (
        probes.join(capped, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    stats = (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_cells_used"),
            F.sum(F.when(F.col("sz") > cell_cap, 1).otherwise(0)).alias("capped_cells"),
            F.max("sz").alias("max_cell"),
        )
    )
    scored = (
        cand.join(
            e.select(F.col(id_col).alias("query_id"), F.col("vec_d").alias("vq"), F.col("norm").alias("nq")),
            "query_id",
        )
        .join(
            e.select(F.col(id_col).alias("neighbor_id"), F.col("vec_d").alias("vc"), F.col("norm").alias("nc")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return (topk, stats) if return_stats else topk


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed spherical-k-means coarse quantizer for IVF:
    (cell, vcent: array<double>, ncent) — plug into
    :func:`ivf_topk(centroids=...)`.

    Lloyd iterations entirely in DataFrame ops, sized for 100 TB: init =
    the trainless lowest-id centroids; each iteration (1) assigns every
    vector to its max-cosine centroid via a broadcast cross-join + window
    argmax (O(N·n_cells), no N×N), (2) recomputes each centroid as the
    per-dimension mean of its members via posexplode → groupBy(cell, pos)
    — a partial-aggregating shuffle of N·dim scalars, the unavoidable
    cost of k-means — and localCheckpoints the tiny (n_cells × dim)
    centroid table to truncate lineage. Cosine argmax is scale-invariant,
    so centroids are NOT normalized; their norm rides along for the
    downstream cosine. Cells that lose all members drop out (k shrinks)
    rather than being respawned — acceptable for a coarse quantizer.
    """
    e = with_norm(emb, id_col, vec_col).persist()
    cents = (
        e.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell"),
            F.col("vec_d").alias("vcent"),
            F.col("norm").alias("ncent"),
        )
    )
    for _ in range(n_iters):
        scored = e.crossJoin(F.broadcast(cents)).select(
            id_col, "vec_d", "cell",
            F.round(cosine_expr("vec_d", "vcent", "norm", "ncent"), 6).alias("cs"),
        )
        wa = Window.partitionBy(id_col).orderBy(F.desc("cs"), F.asc("cell"))
        assigned = (
            scored.withColumn("__r", F.row_number().over(wa))
            .filter(F.col("__r") == 1)
            .select("cell", "vec_d")
        )
        dims = assigned.select(
            "cell", F.posexplode("vec_d").alias("pos", "x")
        ).groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        cents = (
            dims.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("vcent")
            )
            .select(
                "cell",
                "vcent",
                F.sqrt(
                    F.aggregate(F.col("vcent"), F.lit(0.0), lambda a, x: a + x * x)
                ).alias("ncent"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return cents


def lsh_topk(
    emb: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 1024,
    return_stats: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates from shared LSH buckets, exact cosine
    re-rank. Same output shape as brute_force_topk.

    ``bucket_cap`` bounds the NEIGHBOR side of each (table, bucket): a
    degenerate bucket (near-zero vectors all hashing together) would
    otherwise pair all-against-all — O(n²) in that bucket. Capped buckets
    keep the first ``bucket_cap`` members by id, so per-bucket work is
    O(n·cap). No silent caps: pass ``return_stats=True`` to also get a
    one-row DataFrame (n_buckets, capped_buckets, max_bucket) for the
    lineage sink; recall loss only occurs in buckets wider than the cap
    (2× the typical bucket count 2^n_planes at default settings).
    """
    buckets = hyperplane_buckets(emb, dim, n_planes, n_tables, seed, id_col, vec_col)
    # ONE exchange for the whole candidate join (guide §2.4): both join
    # sides derive from the same windowed subtree, so the hyperplane UDF
    # and the (table_id, bucket) shuffle run once (ReusedExchange) and
    # the self-join needs no further exchange or sort — the window's
    # (table_id, bucket, id) sort already satisfies the join keys. The
    # previous a/b split evaluated the UDF and shuffled the bucket table
    # twice, once per side.
    wb = Window.partitionBy("table_id", "bucket").orderBy(id_col)
    wo = buckets.withColumn("__rn", F.row_number().over(wb))
    a = wo.select("table_id", "bucket", F.col(id_col).alias("query_id"))
    b = (
        wo.filter(F.col("__rn") <= bucket_cap)
        .select("table_id", "bucket", F.col(id_col).alias("neighbor_id"))
    )
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    stats = (
        buckets.groupBy("table_id", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(F.col("sz") > bucket_cap, 1).otherwise(0)).alias("capped_buckets"),
            F.max("sz").alias("max_bucket"),
        )
    )
    e = with_norm(emb, id_col, vec_col)
    scored = (
        cand.join(
            e.select(F.col(id_col).alias("query_id"), F.col("vec_d").alias("vq"), F.col("norm").alias("nq")),
            "query_id",
        )
        .join(
            e.select(F.col(id_col).alias("neighbor_id"), F.col("vec_d").alias("vc"), F.col("norm").alias("nc")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return (topk, stats) if return_stats else topk
