"""End-to-end ``spark-submit --py-files`` deployment test (north rule).

Zips the package, then drives the REAL ``spark-submit`` binary — build an
index from a transcript parquet, search it — from a scratch cwd with the
repo stripped from ``PYTHONPATH``, so the only way ``frankensearch_spark``
resolves is from the ``--py-files`` zip.  This is the north rule's
"run via spark-submit --py-files" criterion, not a simulation of it.

Slow (two JVM cold starts); kept to one build + one search.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not available"
)


def _make_zip(dest: Path) -> Path:
    zpath = dest / "fs.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "frankensearch_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return zpath


def _submit(zpath: Path, cwd: Path, *app_args: str) -> str:
    env = dict(os.environ)
    # the zip must be the ONLY route to the package
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--driver-memory", "2g",
        "--py-files", str(zpath),
        str(REPO / "scripts" / "fs_submit.py"),
        *app_args,
    ]
    proc = subprocess.run(
        cmd, cwd=str(cwd), env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    return proc.stdout


def test_spark_submit_build_then_search(spark, tmp_path):
    from frankensearch_spark.sources.transcripts import synthetic_transcripts

    src = tmp_path / "transcripts"
    synthetic_transcripts(spark, 2_000, partitions=4).write.parquet(str(src))
    zpath = _make_zip(tmp_path)
    index_dir = tmp_path / "ix"
    scratch = tmp_path / "scratch"
    scratch.mkdir()

    out = _submit(zpath, scratch, "build", "--input", str(src),
                  "--index", str(index_dir), "--segments", "4")
    assert json.loads(out.strip().splitlines()[-1]) == {"built": str(index_dir)}

    out = _submit(zpath, scratch, "search", "--index", str(index_dir),
                  "--query", "w0 w1", "--limit", "5", "--count")
    res = json.loads(out.strip().splitlines()[-1])
    assert len(res["hits"]) == 5
    assert res["total_count"] > 0
    # submitted run must agree with an in-process engine on the same index
    from frankensearch_spark.index import LexicalIndex

    local = LexicalIndex(spark, str(index_dir)).search("w0 w1", limit=5)
    assert [h["docid"] for h in res["hits"]] == list(local.hits["docid"])
