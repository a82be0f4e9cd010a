"""North-rule evidence: the pipeline actually runs via
``spark-submit --py-files fugu_spark.zip`` (SURVEY.md §6 / BASELINE
north_rule), not just through an in-process SparkSession.

The jobs are copied to a neutral directory before launching so their
repo-root sys.path shim points somewhere WITHOUT the package — the only
way ``import fugu_spark`` can succeed inside the job is through the
``--py-files`` zip, which is exactly the claim being tested.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


@pytest.mark.slow
def test_spark_submit_py_files_build_and_query(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    # package the library exactly as the docstring instructs
    zip_path = str(tmp_path / "fugu_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "fugu_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # neutral cwd: the jobs' repo-root shim must NOT find the package
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    for j in ("build_index.py", "query.py"):
        shutil.copy(os.path.join(REPO, "jobs", j), jobs_dir / j)
    assert not (tmp_path / "fugu_spark").exists()

    env = os.environ.copy()
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)

    idx_dir = str(tmp_path / "idx")
    common = [submit, "--master", "local[2]", "--py-files", zip_path]
    build = subprocess.run(
        common
        + [
            str(jobs_dir / "build_index.py"),
            "--source",
            "/root/testdata/sf0.001/documents.parquet",
            "--index-dir",
            idx_dir,
            "--text-col",
            "text",
            "--n-buckets",
            "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert build.returncode == 0, f"build failed:\n{build.stdout[-2000:]}\n{build.stderr[-2000:]}"
    # the job pretty-prints one JSON object whose opening brace sits at
    # column 0 (nested objects are indented — don't anchor on those)
    lines = build.stdout.strip().splitlines()
    start = max(i for i, ln in enumerate(lines) if ln.startswith("{"))
    stats = json.loads("\n".join(lines[start:]))
    assert stats.get("n_docs") == 500, stats
    assert stats.get("n_postings", 0) > 10_000, stats

    query = subprocess.run(
        common
        + [
            str(jobs_dir / "query.py"),
            "--index-dir",
            idx_dir,
            "--query",
            "merge join",
            "--spark",
            "-k",
            "5",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert query.returncode == 0, f"query failed:\n{query.stdout[-2000:]}\n{query.stderr[-2000:]}"
    payload = json.loads(query.stdout.strip().splitlines()[-1])
    hits = payload["hits"]
    assert len(hits) == 5 and all("doc_id" in h and "score" in h for h in hits), payload


@pytest.mark.slow
def test_spark_submit_batch_query(tmp_path):
    """jobs/batch_query.py under spark-submit --py-files: a TSV of
    queries in, parquet (query_id, doc_id, score, rank) out."""
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    zip_path = str(tmp_path / "fugu_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "fugu_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    for j in ("build_index.py", "batch_query.py"):
        shutil.copy(os.path.join(REPO, "jobs", j), jobs_dir / j)

    env = os.environ.copy()
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)

    idx_dir = str(tmp_path / "idx")
    common = [submit, "--master", "local[2]", "--py-files", zip_path]
    build = subprocess.run(
        common
        + [
            str(jobs_dir / "build_index.py"),
            "--source", "/root/testdata/sf0.001/documents.parquet",
            "--index-dir", idx_dir, "--text-col", "text", "--n-buckets", "2",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    qfile = tmp_path / "queries.tsv"
    qfile.write_text("0\tmerge join\n1\tmerge AND sort\n2\ttable NOT window\n")
    out_dir = str(tmp_path / "hits")
    run = subprocess.run(
        common
        + [
            str(jobs_dir / "batch_query.py"),
            "--index-dir", idx_dir,
            "--queries-file", str(qfile),
            "--out", out_dir, "-k", "5",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert run.returncode == 0, f"{run.stdout[-2000:]}\n{run.stderr[-2000:]}"
    payload = json.loads(run.stdout.strip().splitlines()[-1])
    assert payload["n_queries"] == 3 and payload["n_hits"] > 0

    import pyarrow.parquet as pq

    tbl = pq.read_table(out_dir)
    assert set(tbl.column_names) == {"query_id", "doc_id", "score", "rank"}
    assert len({r for r in tbl.column("query_id").to_pylist()}) >= 2
