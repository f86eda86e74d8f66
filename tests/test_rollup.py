"""Site-subtree rollup (M2) on the web corpus: full mirrors match,
near-mirrors don't, ignored-only deltas match, error rows contaminate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finddup_spark.operators.exact import exact_clusters, split_ignored
from finddup_spark.operators.rollup import (
    UNKNOWN_SIG,
    analyze_dirs,
    dup_dirs_report,
    page_leaf_rows,
    rollup_dirs,
)
from finddup_spark.sources.tables import load_pages


@pytest.fixture(scope="module")
def analyzed(spark, tiny_corpus):
    all_pages = load_pages(spark, tiny_corpus[0])
    pages, _ignored = split_ignored(all_pages)
    clusters = exact_clusters(pages)
    leaf = page_leaf_rows(pages, clusters)
    dirs = rollup_dirs(spark, leaf)
    return analyze_dirs(dirs).toPandas()


def test_full_mirror_hosts_match(analyzed):
    """hostB (renamed leaves) and hostC (extra ignored page) must share
    hostA's signature — reference dir-dup semantics are name-insensitive
    (finddup.py:621-623) and ignore-exclusive (finddup.py:862-871)."""
    hosts = analyzed[analyzed.depth == 1].set_index("path")
    a = hosts.loc["mirror-a000.example", "dir_sig"]
    assert hosts.loc["mirror-b000.example", "dir_sig"] == a
    assert hosts.loc["mirror-c000.example", "dir_sig"] == a
    assert hosts.loc["mirror-a000.example", "status"] == "dup"


def test_near_mirror_does_not_match(analyzed):
    hosts = analyzed[analyzed.depth == 1].set_index("path")
    a = hosts.loc["mirror-a000.example", "dir_sig"]
    assert hosts.loc["mirror-d000.example", "dir_sig"] != a


def test_mirror_sizes_roll_up(analyzed):
    hosts = analyzed[analyzed.depth == 1].set_index("path")
    assert (
        hosts.loc["mirror-a000.example", "n_bytes"]
        == hosts.loc["mirror-b000.example", "n_bytes"]
        > 0
    )


def test_error_rows_contaminate_ancestors(spark, tiny_corpus, analyzed):
    """Any prefix containing an extraction-error page is unknown
    (reference -1 contamination, finddup.py:617-620)."""
    pages = load_pages(spark, tiny_corpus[0])
    err_urls = pages.filter("text is null").select("url").toPandas().url
    assert len(err_urls) > 0
    err_hosts = {u.replace("https://", "").split("/")[0] for u in err_urls}
    hosts = analyzed[analyzed.depth == 1].set_index("path")
    for h in err_hosts:
        assert hosts.loc[h, "dir_sig"] == UNKNOWN_SIG
        assert hosts.loc[h, "status"] == "unknown"


def test_multiset_semantics(spark):
    """Two copies of a file ≠ one copy (reference keeps duplicates in the
    sorted child list — finddup.py:621-623)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "url": [
                "https://h1/d/a.html",
                "https://h1/d/b.html",
                "https://h2/d/a.html",
            ],
            "text": ["same", "same", "same"],
        }
    )
    pages = spark.createDataFrame(pdf)
    clusters = exact_clusters(pages)
    dirs = rollup_dirs(spark, page_leaf_rows(pages, clusters)).toPandas()
    d1 = dirs[dirs.path == "h1/d"].dir_sig.iloc[0]
    d2 = dirs[dirs.path == "h2/d"].dir_sig.iloc[0]
    assert d1 != d2


def test_report_ordering(spark, tiny_corpus, analyzed):
    pages, _ = split_ignored(load_pages(spark, tiny_corpus[0]))
    clusters = exact_clusters(pages)
    dirs = rollup_dirs(spark, page_leaf_rows(pages, clusters))
    rep = dup_dirs_report(analyze_dirs(dirs)).toPandas()
    assert (rep.n_bytes.values == sorted(rep.n_bytes.values, reverse=True)).all()
    for mem in rep.members:
        assert list(mem) == sorted(mem)
        assert all(m.endswith("/") for m in mem)


def test_driver_and_distributed_paths_agree(spark, tiny_corpus):
    """The cardinality-switch (P4) must be invisible: driver dict rollup
    and the distributed per-level loop produce identical dir tables."""
    pages, _ = split_ignored(load_pages(spark, tiny_corpus[0]))
    clusters = exact_clusters(pages)
    leaf = page_leaf_rows(pages, clusters)
    a = (
        rollup_dirs(spark, leaf)  # driver path (tiny corpus)
        .toPandas().sort_values("path").reset_index(drop=True)
    )
    b = (
        rollup_dirs(spark, leaf, driver_threshold=0)  # force distributed
        .toPandas().sort_values("path").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a[["path", "depth", "dir_sig", "n_bytes", "n_children"]].astype(
            {"n_bytes": "int64", "n_children": "int64"}
        ),
        b[["path", "depth", "dir_sig", "n_bytes", "n_children"]].astype(
            {"n_bytes": "int64", "n_children": "int64"}
        ),
    )
