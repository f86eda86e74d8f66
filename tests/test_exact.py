"""Exact tier (M1): cluster partition == text-equality partition, reports,
prefix-key variant, snapshot (re-crawl) semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finddup_spark.operators.exact import (
    dup_groups_report,
    error_pages,
    exact_clusters,
    unique_report,
)
from finddup_spark.sources.tables import load_pages


@pytest.fixture(scope="module")
def clustered(spark, tiny_corpus):
    pages_path, truth_path = tiny_corpus
    pages = load_pages(spark, pages_path)
    cl = exact_clusters(pages).cache()
    pdf = cl.toPandas()
    texts = pages.select("doc_id", "text").toPandas()
    return cl, pdf.merge(texts, on="doc_id"), pages


def test_partition_equals_text_equality(clustered):
    _, m, _ = clustered
    assert (m.groupby("cluster_id")["text"].nunique() == 1).all()
    assert (m.groupby("text")["cluster_id"].nunique() == 1).all()
    assert m["verified"].all()


def test_cluster_id_is_min_member(clustered):
    _, m, _ = clustered
    assert (m.groupby("cluster_id")["doc_id"].min() ==
            m.groupby("cluster_id")["doc_id"].min().index).all()


def test_truth_exact_clusters_reproduced(clustered, tiny_corpus):
    """North rule: exact clusters reproduce the known-truth assignments."""
    _, m, _ = clustered
    truth = pd.read_parquet(tiny_corpus[1])
    t = truth[truth.kind == "exact"]
    got = m.set_index("doc_id")["cluster_id"]
    # truth members present post-snapshot must share an engine cluster
    for tc, grp in t.groupby("cluster_id"):
        ids = [d for d in grp.doc_id if d in got.index]
        assert len({got[d] for d in ids}) <= 1


def test_prefix_key_variant_same_partition(spark, tiny_corpus, clustered):
    pages = load_pages(spark, tiny_corpus[0])
    a = exact_clusters(pages, use_prefix_key=True).toPandas()
    _, m, _ = clustered
    base = m.set_index("doc_id")["cluster_id"]
    alt = a.set_index("doc_id")["cluster_id"]
    assert (base.sort_index() == alt.sort_index()).all()


def test_snapshot_keeps_latest_recrawl(spark, tiny_corpus):
    raw = spark.read.parquet(tiny_corpus[0])
    pages = load_pages(spark, tiny_corpus[0])
    assert raw.count() > pages.count()  # re-crawled urls collapsed
    assert pages.groupBy("url").count().filter("count > 1").count() == 0


def test_reports(clustered):
    cl, m, pages = clustered
    rep = dup_groups_report(cl).toPandas()
    assert (rep.n_bytes.values == sorted(rep.n_bytes.values, reverse=True)).all()
    assert (rep.n_members >= 2).all()
    for mem in rep.members:
        assert list(mem) == sorted(mem)
    uniq = unique_report(cl).toPandas()
    assert (uniq.url.values == sorted(uniq.url.values)).all()
    err = error_pages(pages).count()
    assert err > 0


def test_input_order_invariance(spark, tiny_corpus, clustered):
    """Property: cluster assignment invariant to input partitioning/order."""
    pages = load_pages(spark, tiny_corpus[0]).repartition(13).orderBy(F.desc("url"))
    alt = exact_clusters(pages).toPandas().set_index("doc_id")["cluster_id"]
    _, m, _ = clustered
    base = m.set_index("doc_id")["cluster_id"]
    assert (base.sort_index() == alt.sort_index()).all()
