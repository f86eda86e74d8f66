"""Training-pipeline dedup family over a generic documents table.

Every variant returns a cluster assignment (doc_id, cluster_id) and/or a
keep-list — the operations a large-scale training-data pipeline needs
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), each a
thin composition over the engine's tiers so they inherit the blocking /
salting / verification machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, DedupConfig
from ..functions.signatures import compute_signatures, explode_bands
from .cc import connected_components
from .exact import exact_clusters
from .lsh import candidate_pairs, simhash_candidate_pairs, verify_pairs


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per byte-identical text (the min doc_id), marking the
    rest as drops: (doc_id, cluster_id, keep)."""
    cl = exact_clusters(docs, id_col=id_col, text_col=text_col)
    return cl.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


def minhash_dedup(
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup dedup at cfg.verify_jaccard: (doc_id, cluster_id, keep)."""
    sigs = compute_signatures(docs, cfg, id_col=id_col, text_col=text_col).persist()
    caches: list = [sigs]
    pairs, _stats = candidate_pairs(explode_bands(sigs, cfg), cfg, cache_handles=caches)
    edges = verify_pairs(pairs, docs, cfg, id_col=id_col, text_col=text_col)
    # vertices from the cheap id scan, NOT the signature table: CC runs
    # its actions eagerly, so the signature/band caches can be dropped
    # here — standalone calls no longer leak them until session clearCache
    cl = connected_components(
        edges, vertices=docs.select(F.col(id_col).alias("doc_id"))
    )
    for h in caches:
        h.unpersist()
    return cl.select(
        F.col("doc_id").alias(id_col),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def simhash_dedup(
    docs: DataFrame,
    hamming_radius: int = 3,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash dedup: Hamming-ball clustering via bit-chunk pigeonhole."""
    sigs = compute_signatures(
        docs, cfg, id_col=id_col, text_col=text_col, include_shingles=False
    ).persist()
    caches: list = [sigs]
    cand = simhash_candidate_pairs(
        sigs, hamming_radius=hamming_radius, cfg=cfg, cache_handles=caches
    )
    cl = connected_components(
        cand.select("src", "dst"), vertices=docs.select(F.col(id_col).alias("doc_id"))
    )
    for h in caches:
        h.unpersist()
    return cl.select(
        F.col("doc_id").alias(id_col),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def token_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    max_id_gap: int = 3,
) -> DataFrame:
    """Exact token-set (1-gram) Jaccard for a bounded candidate set:
    same-``block_col`` pairs within ``max_id_gap`` of each other.

    JVM-only (split + array_intersect/array_union) — demonstrates the
    n-gram-Jaccard dedup shape with a DuckDB-oracle-able contract; the
    unbounded version is minhash_dedup (LSH replaces the id-gap blocking).
    """
    toks = docs.select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        F.array_distinct(F.split(F.col(text_col), r"\s+")).alias("toks"),
    )
    # the id-gap bound is part of the JOIN KEY, not a post-join filter:
    # bucket = floor(id / gap); a pair within the gap lands in the same or
    # adjacent buckets, so the dst side explodes to (bucket, bucket-1) and
    # the join is a plain equi hash join on (block, bucket) — each bucket
    # holds <= gap rows per block, so the pair stream is O(N·gap), not
    # O(N²/|blocks|) with a post-join gap predicate. Exactly one of the
    # two exploded buckets matches per qualifying pair → no dedup needed.
    a = toks.select(
        F.col(id_col).alias("src"), "block", F.col("toks").alias("t_src"),
        F.floor(F.col(id_col) / max_id_gap).alias("bucket"),
    )
    b = toks.select(
        F.col(id_col).alias("dst"), "block", F.col("toks").alias("t_dst"),
        F.explode(
            F.array(
                F.floor(F.col(id_col) / max_id_gap),
                F.floor(F.col(id_col) / max_id_gap) - 1,
            )
        ).alias("bucket"),
    )
    pairs = a.join(b, ["block", "bucket"]).filter(
        (F.col("src") < F.col("dst")) & (F.col("dst") - F.col("src") <= max_id_gap)
    )
    inter = F.size(F.array_intersect("t_src", "t_dst"))
    union = F.size(F.array_union("t_src", "t_dst"))
    return pairs.select(
        "src",
        "dst",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(1.0)), 6).alias("jaccard"),
    )


def embedding_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_gap: int = 50,
) -> DataFrame:
    """Embedding near-dup clusters: pairs with cosine >= threshold → CC.

    Candidate generation here is id-gap blocked (bounded demo); at scale
    swap in the LSH bucketing from simsearch.hyperplane_buckets — the
    verify + CC stages are unchanged. The gap bound is an equi JOIN key
    (bucket = floor(id/gap), dst exploded to bucket and bucket-1), not a
    non-equi predicate: the previous ``src < dst`` join condition planned
    as a BroadcastNestedLoopJoin — O(N²) compares before any filter.
    """
    from .simsearch import with_norm, cosine_expr

    e = with_norm(embeddings, id_col=id_col, vec_col=vec_col)
    a = e.select(
        F.col(id_col).alias("src"), F.col("vec_d").alias("va"), F.col("norm").alias("na"),
        F.floor(F.col(id_col) / block_gap).alias("bucket"),
    )
    b = e.select(
        F.col(id_col).alias("dst"), F.col("vec_d").alias("vb"), F.col("norm").alias("nb"),
        F.explode(
            F.array(
                F.floor(F.col(id_col) / block_gap),
                F.floor(F.col(id_col) / block_gap) - 1,
            )
        ).alias("bucket"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("src") < F.col("dst")) & (F.col("dst") - F.col("src") <= block_gap)
    )
    sim = cosine_expr("va", "vb", "na", "nb")
    edges = pairs.select("src", "dst", sim.alias("cos")).filter(F.col("cos") >= threshold)
    verts = embeddings.select(F.col(id_col).cast("long").alias("doc_id"))
    cl = connected_components(edges.select("src", "dst"), vertices=verts)
    return cl.select(
        F.col("doc_id").alias(id_col),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )
