"""dist/finddup_spark.zip freshness gate.

The documented cluster path is `spark-submit --py-files
dist/finddup_spark.zip` (jobs/*.py); a stale zip ships old operator
behavior to every executor while the local tree runs the new one — in
round 4 the shipped zip drifted 7 modules behind the tree. This test
byte-compares every tracked module against its zip member so any drift
fails CI; `scripts/build_dist.sh` regenerates the zip.
"""

import os
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "finddup_spark.zip")


def _tree_modules() -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    pkg = os.path.join(REPO, "finddup_spark")
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, REPO).replace(os.sep, "/")
                with open(p, "rb") as fh:
                    out[rel] = fh.read()
    return out


def test_dist_zip_matches_tree():
    if not os.path.exists(ZIP):
        pytest.fail(
            "dist/finddup_spark.zip missing — run scripts/build_dist.sh"
        )
    tree = _tree_modules()
    with zipfile.ZipFile(ZIP) as z:
        members = {n for n in z.namelist() if n.endswith(".py")}
        stale = sorted(
            rel for rel in tree if rel in members and z.read(rel) != tree[rel]
        )
    missing = sorted(set(tree) - members)
    extra = sorted(members - set(tree))
    problems = []
    if stale:
        problems.append(f"stale members (content drift): {stale}")
    if missing:
        problems.append(f"modules missing from zip: {missing}")
    if extra:
        problems.append(f"zip members with no tree source: {extra}")
    assert not problems, (
        "dist/finddup_spark.zip is out of date — run scripts/build_dist.sh\n"
        + "\n".join(problems)
    )
