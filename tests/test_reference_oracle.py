"""Reference-as-oracle (SURVEY.md §5.2-1, north rule): run the actual
``itsayellow/finddup`` CLI on seeded file trees, parse its report, and
assert the Spark exact tier + dir rollup produce the SAME cluster
partitions (compared as partitions-of-sets — reference ids are
insertion-ordered, only equality structure is meaningful, SURVEY §2.4 A7).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from finddup_spark.operators.exact import exact_clusters, split_ignored
from finddup_spark.operators.rollup import (
    analyze_dirs,
    page_leaf_rows,
    rollup_dirs,
)

REFERENCE_SRC = "/root/reference/src"


def _install_tictoc_stub() -> None:
    """8-line timer stub so the reference runs without its one dep."""
    if "tictoc" in sys.modules:
        return
    mod = types.ModuleType("tictoc")

    class Timer:
        def start(self):
            pass

        def eltime(self):
            return 0.0

        def eltime_pr(self, *a, **k):
            pass

        def progress_pr(self, *a, **k):
            pass

    mod.Timer = Timer
    sys.modules["tictoc"] = mod


def run_reference(root: str) -> str:
    _install_tictoc_stub()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import finddup.main as refmain

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        status = refmain.main(["finddup", root])
    assert status == 0
    return buf.getvalue()


def parse_report(report: str) -> dict:
    """Parse dup groups / uniques / ignored / unknown out of the report."""
    dup_groups: list[list[str]] = []
    uniques: list[str] = []
    ignored: list[str] = []
    unknown: list[str] = []
    section = None
    cur: list[str] | None = None
    for line in report.splitlines():
        if line.startswith("Duplicate Files/Directories:"):
            section = "dup"
            continue
        if line.startswith("Unique Files/Directories:"):
            if cur:
                dup_groups.append(cur)
                cur = None
            section = "uniq"
            continue
        if line.startswith("Unprocessed Files"):
            if cur:
                dup_groups.append(cur)
                cur = None
            section = None
            continue
        if line.startswith("Ignored Files"):
            section = "ignored"
            continue
        if line.startswith("Unknown Dirs"):
            section = "unknown"
            continue
        if line.startswith("----"):
            continue
        if section == "dup":
            if line.startswith("Duplicate set ("):
                if cur:
                    dup_groups.append(cur)
                cur = []
            elif line.startswith("  ") and cur is not None:
                cur.append(line.strip())
        elif section == "uniq" and line.strip():
            uniques.append(line.strip())
        elif section == "ignored" and line.startswith("  "):
            ignored.append(line.strip())
        elif section == "unknown" and line.startswith("  "):
            unknown.append(line.strip())
    if cur:
        dup_groups.append(cur)
    return {
        "dup_groups": dup_groups,
        "uniques": uniques,
        "ignored": ignored,
        "unknown": unknown,
    }


# ---------------------------------------------------------------------------
# seeded tree generator (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def build_tree(root: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    pool = [
        ("c%04d" % i + "x" * int(rng.integers(0, 2000))).encode()
        for i in range(12)
    ]
    pool.append(b"")  # empty file content

    def write(rel: str, data: bytes) -> None:
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    # renamed duplicate files across dirs
    write("a/file1.txt", pool[0])
    write("b/renamed.txt", pool[0])
    write("a/file2.txt", pool[1])
    write("b/other.txt", pool[2])
    # fully mirrored subtree (renamed files, same data)
    write("m1/x.txt", pool[3])
    write("m1/deep/y.txt", pool[4])
    write("m2/xx.txt", pool[3])
    write("m2/deep/yy.txt", pool[4])
    # subtree differing by one byte
    write("m3/x.txt", pool[3])
    write("m3/deep/y.txt", pool[4][:-1] + b"!" if pool[4] else b"!")
    # ignored names inside otherwise-identical dirs (MUST still match)
    write("i1/f.txt", pool[5])
    write("i2/f.txt", pool[5])
    write("i2/.DS_Store", b"junk metadata")
    # same-size different-content group (exercises refine semantics)
    same = ("s" * 100).encode()
    diff = ("s" * 99 + "t").encode()
    write("sz/a.bin", same)
    write("sz/b.bin", same)
    write("sz/c.bin", diff)
    # empty files (size 0) — multiple, they are dups of each other
    write("e/empty1", b"")
    write("e/empty2", b"")
    # singleton unique files
    for i in range(6, 10):
        write(f"u/unique{i}.txt", pool[i])
    # deeper random structure with a few extra dup pairs
    for i in range(int(rng.integers(4, 9))):
        d = "/".join(
            f"d{int(rng.integers(0, 3))}" for _ in range(int(rng.integers(1, 4)))
        )
        write(f"r/{d}/f{i}.dat", pool[int(rng.integers(0, len(pool)))])


def tree_to_pages(root: str) -> pd.DataFrame:
    """Encode the tree per SURVEY §5.2-1: path → url, bytes → text."""
    rows = []
    doc_id = 0
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for name in sorted(files):
            p = os.path.join(dirpath, name)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as f:
                data = f.read()
            rows.append(
                {
                    "doc_id": doc_id,
                    "url": "https://tree/" + rel.replace(os.sep, "/"),
                    "text": data.decode("utf-8"),
                    "warc_ts": pd.Timestamp("2024-01-01"),
                    "lang": "en",
                }
            )
            doc_id += 1
    return pd.DataFrame(rows)


def _partition(groups: list[list[str]]) -> set[frozenset[str]]:
    return {frozenset(g) for g in groups}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_exact_and_dir_clusters_match_reference(spark, tmp_path, seed):
    root = str(tmp_path / f"tree{seed}")
    os.makedirs(root)
    build_tree(root, seed)
    ref = parse_report(run_reference(root))

    pages_pdf = tree_to_pages(root)
    all_pages = spark.createDataFrame(pages_pdf)
    pages, ignored_pages = split_ignored(all_pages)
    clusters = exact_clusters(pages).cache()

    # ---- file dup groups: partition equality ----
    cl = clusters.toPandas()
    cl["rel"] = cl.url.str.replace("https://tree/", "", regex=False)
    spark_file_groups = [
        sorted(g.rel) for _, g in cl[cl.cluster_size > 1].groupby("cluster_id")
    ]
    ref_file_groups = [
        [m for m in grp if not m.endswith("/")]
        for grp in ref["dup_groups"]
    ]
    ref_file_groups = [g for g in ref_file_groups if len(g) > 1]
    assert _partition(spark_file_groups) == _partition(ref_file_groups)

    # ---- dir dup groups ----
    leaf = page_leaf_rows(pages, clusters)
    dirs = rollup_dirs(spark, leaf)
    analyzed = analyze_dirs(dirs).toPandas()
    analyzed["rel"] = analyzed.path.str.replace("tree", "", regex=False).str.lstrip("/")
    sub = analyzed[analyzed.rel != ""]  # drop the root ("tree" == master_root)
    spark_dir_groups = [
        sorted(x + "/" for x in g.rel)
        for _, g in sub[sub.status == "dup"].groupby("dir_sig")
    ]
    ref_dir_groups = [
        [m for m in grp if m.endswith("/")] for grp in ref["dup_groups"]
    ]
    ref_dir_groups = [g for g in ref_dir_groups if len(g) > 1]
    assert _partition(spark_dir_groups) == _partition(ref_dir_groups)

    # ---- uniques (files + dirs) ----
    spark_uniq_files = set(cl[cl.cluster_size == 1].rel)
    spark_uniq_dirs = {x + "/" for x in sub[sub.status == "unique"].rel}
    ref_uniq = set(ref["uniques"]) - {"./"}
    assert spark_uniq_files | spark_uniq_dirs == ref_uniq

    # ---- ignored files excluded from dir identity (F1) ----
    ign = ignored_pages.toPandas()
    spark_ignored = set(ign.url.str.replace("https://tree/", "", regex=False))
    assert spark_ignored == set(ref["ignored"])
    assert any(
        {"i1/", "i2/"} <= set(g) for g in spark_dir_groups
    ), "dirs differing only by an ignored file must match"
