"""Iterative connected-components cluster resolution (SURVEY.md §7 M5).

The reference assigns one shared id per dup group by insertion order
(``create_file_ids``, ``finddup.py:1007-1047``); with fuzzy edges the dup
relation is no longer transitive-by-construction, so clusters are the
connected components of the verified-edge graph. Min-label propagation
(hash-to-min): every vertex repeatedly adopts the minimum label in its
neighborhood; converges in O(graph diameter) rounds — near-dup cluster
diameters are tiny. ``localCheckpoint`` every few rounds truncates plan
lineage (SURVEY.md §4 custom-(b)); convergence is detected with a
``changed == 0`` aggregate. For pathological web-scale components
(diameter ~ log n after star ops), swap in alternating large-star/
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public algorithm); the driver loop is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 50,
    checkpoint_every: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """clusters(doc_id, cluster_id) — cluster_id = min doc_id in component.

    ``edges``: (src, dst). ``vertices``: optional (doc_id) universe; docs
    with no edges come out as singleton clusters (cluster_id = doc_id).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    touched = sym.select(F.col("a").alias(id_col)).distinct()
    labels = touched.withColumn("label", F.col(id_col))

    for it in range(max_iters):
        nbr_min = (
            sym.join(labels.withColumnRenamed(id_col, "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("a", id_col)
        )
        new_labels = (
            labels.join(nbr_min, id_col, "left")
            .select(
                id_col,
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
                (F.col("label") != F.least(F.col("label"), F.coalesce("nbr_min", "label"))).alias("chg"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum(F.col("chg").cast("int"))).collect()[0][0] or 0
        labels = new_labels.select(id_col, "label")
        if changed == 0:
            break

    result = labels.withColumnRenamed("label", "cluster_id")
    if vertices is not None:
        singles = (
            vertices.select(F.col(id_col).cast("long").alias(id_col))
            .join(result, id_col, "left_anti")
            .withColumn("cluster_id", F.col(id_col))
        )
        result = result.unionByName(singles)
    return result
