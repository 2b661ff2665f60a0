"""End-to-end `spark-submit --py-files` run (north rule's launch mode):
package alertsage_spark as a zip, submit scripts/build_and_query.py in a
fresh JVM, check manifest metrics + query hits on stdout."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_path() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("spark-submit not available")


@pytest.mark.slow
def test_spark_submit_build_and_query(tmp_path):
    submit = _spark_submit_path()
    zip_path = tmp_path / "alertsage_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "alertsage_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    index_dir = tmp_path / "idx"
    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={tmp_path}/spark-local",
        "--py-files", str(zip_path),
        os.path.join(REPO, "scripts", "build_and_query.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--index-dir", str(index_dir),
        "--n-shards", "4", "--n-groups", "2",
        "--query", "data stream merge join window",
        "--k", "5",
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = out.stdout.splitlines()
    build = [json.loads(l[6:]) for l in lines if l.startswith("BUILD ")]
    groups = [json.loads(l[6:]) for l in lines if l.startswith("GROUP ")]
    hits = [json.loads(l[4:]) for l in lines if l.startswith("HIT ")]
    assert build and build[0]["stats"]["n_docs"] == 500
    assert len(groups) == 2
    assert all(g["docs_per_sec"] > 0 for g in groups)
    assert len(hits) == 5
    assert [h["rank"] for h in hits] == [1, 2, 3, 4, 5]

    # rank-identity vs the Python oracle, cross-process
    import duckdb

    from alertsage_spark.query.oracle import BM25Oracle

    rows = duckdb.connect().execute(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    oracle = BM25Oracle(rows)
    expected = oracle.topk("data stream merge join window", k=5)
    assert [h["doc_id"] for h in hits] == [e[0] for e in expected]
    for h, e in zip(hits, expected):
        assert abs(h["score"] - e[1]) <= 1e-6


@pytest.mark.slow
def test_spark_submit_code_corpus_shape(tmp_path, spark, corpus_df):
    """spark-submit with --input-shape code_corpus: the north-rule
    (repo, path, commit, lang, content) table ingests end-to-end in a
    fresh JVM (doc_id derivation + fidelity gate + code mode default)."""
    submit = _spark_submit_path()
    zip_path = tmp_path / "alertsage_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "alertsage_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    src = tmp_path / "code_corpus_parquet"
    corpus_df.limit(60).write.parquet(str(src))
    n_docs = 60
    index_dir = tmp_path / "codeidx"
    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={tmp_path}/spark-local",
        "--py-files", str(zip_path),
        os.path.join(REPO, "scripts", "build_and_query.py"),
        "--input", str(src),
        "--input-shape", "code_corpus",
        "--index-dir", str(index_dir),
        "--n-shards", "4", "--n-groups", "1",
        "--query", "parseConfig",
        "--k", "5",
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = out.stdout.splitlines()
    build = [json.loads(l[6:]) for l in lines if l.startswith("BUILD ")]
    hits = [json.loads(l[4:]) for l in lines if l.startswith("HIT ")]
    assert build and build[0]["stats"]["n_docs"] == n_docs
    assert build[0]["stats"]["mode"] == "code"
    assert hits and [h["rank"] for h in hits][0] == 1
