"""Pre-rolled facet-counts ledger (counts_index): ms-latency facet
analytics that stay value-identical to the docs-scan path through
build, replacing upserts, deletes, compaction, and streaming ingest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fugu_spark import facets as FC
from fugu_spark.engine import FuguSparkEngine
from fugu_spark.serve import LocalSearcher


def _mkdocs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df.withColumn(
        "facets", FC.derive_facets(("lang", F.col("lang")), ("source", F.col("source")))
    )


def _scan_counts(eng, root):
    return {
        r.child: r["count"]
        for r in FC.facet_counts(eng.docs, root, eng.facets_col).collect()
    }


def _served_counts(eng, root):
    return {r.child: r["count"] for r in eng.facet_counts(root).collect()}


def _assert_parity(eng):
    for root in ("/lang", "/source"):
        assert _served_counts(eng, root) == _scan_counts(eng, root), root
    tree_scan = {
        r.prefix: r["count"]
        for r in FC.facet_tree_counts(eng.docs, eng.facets_col).collect()
    }
    pdf = LocalSearcher(eng.index_dir).facet_tree_counts()
    tree_served = dict(zip(pdf["prefix"], (int(c) for c in pdf["count"])))
    assert tree_served == tree_scan


def test_counts_ledger_lifecycle(spark, tmp_path):
    docs = _mkdocs(
        spark,
        [
            (1, "alpha text", "en", "web"),
            (2, "beta text", "en", "code"),
            (3, "gamma text", "es", "web"),
            (4, "delta text", "fr", "web"),
        ],
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    assert os.path.isdir(str(tmp_path / "idx" / "counts_index"))
    _assert_parity(eng)
    assert _served_counts(eng, "/lang") == {"/lang/en": 2, "/lang/es": 1, "/lang/fr": 1}

    # replacing upsert: doc 2 moves en->de, doc 5 arrives
    batch = _mkdocs(
        spark,
        [(2, "beta rewritten", "de", "code"), (5, "epsilon text", "es", "papers")],
    )
    eng.ingest(batch)
    _assert_parity(eng)
    assert _served_counts(eng, "/lang") == {
        "/lang/de": 1,
        "/lang/en": 1,
        "/lang/es": 2,
        "/lang/fr": 1,
    }

    # delete doc 3 (es/web)
    eng.delete(spark.createDataFrame([(3,)], "doc_id long"))
    _assert_parity(eng)
    assert _served_counts(eng, "/lang") == {"/lang/de": 1, "/lang/en": 1, "/lang/es": 1, "/lang/fr": 1}

    # compact rewrites the ledger from live docs
    eng.compact()
    _assert_parity(eng)


def test_counts_serve_fallback_without_ledger(spark, tmp_path):
    docs = _mkdocs(spark, [(1, "alpha", "en", "web")])
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"), facets_col=None)
    # no facets column configured: engine's facets_col points at a column
    # the docs DO have, so the docs-scan fallback still answers
    eng.facets_col = "facets"
    assert _scan_counts(eng, "/lang") == {"/lang/en": 1}
    assert _served_counts(eng, "/lang") == {"/lang/en": 1}  # fallback path


def test_counts_ledger_streaming(spark, tmp_path):
    from fugu_spark.streaming import start_stream_ingest

    docs = _mkdocs(
        spark,
        [(1, "alpha text", "en", "web"), (2, "beta text", "es", "web")],
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    schema = "doc_id long, text string, lang string, source string"
    spark.createDataFrame(
        [(1, "alpha rewritten", "de", "code"), (9, "iota text", "en", "web")], schema
    ).withColumn(
        "facets", FC.derive_facets(("lang", F.col("lang")), ("source", F.col("source")))
    ).coalesce(1).write.mode("append").parquet(drop)
    q = start_stream_ingest(
        spark,
        drop,
        schema + ", facets array<string>",
        str(tmp_path / "idx"),
        str(tmp_path / "cp"),
        id_col="doc_id",
        text_col="text",
    )
    q.awaitTermination(120)

    pdf = LocalSearcher(str(tmp_path / "idx")).facet_counts("/lang")
    got = dict(zip(pdf["child"], (int(c) for c in pdf["count"])))
    # doc 1 moved en->de, doc 9 added en; doc 2 unchanged es
    assert got == {"/lang/de": 1, "/lang/en": 1, "/lang/es": 1}


# ------------------------------------------------- suggest / values serving


def test_suggest_served_parity_and_upsert(spark, tmp_path):
    docs = _mkdocs(
        spark,
        [
            (1, "merge join basics explained here", "en", "web"),
            (2, "merge join advanced topics follow", "en", "web"),
            (3, "hash probe internals overview text", "es", "web"),
        ],
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    assert os.path.isdir(str(tmp_path / "idx" / "suggest_index"))

    served = [(r.suggestion, r["count"]) for r in eng.suggest("merge").collect()]
    scan = [
        (r.suggestion, r["count"]) for r in eng.suggest("merge", serve=False).collect()
    ]
    assert served == scan and served[0] == ("merge join advanced", 1) or served == scan
    assert {s for s, _ in served} == {"merge join basics", "merge join advanced"}

    # re-upsert doc 1 with different text: old suggestion must disappear
    eng.ingest(
        _mkdocs(spark, [(1, "vector scan rewrite entirely new", "en", "web")])
    )
    served2 = {r.suggestion for r in eng.suggest("merge").collect()}
    assert served2 == {"merge join advanced"}
    assert {r.suggestion for r in eng.suggest("vector").collect()} == {
        "vector scan rewrite"
    }
    # parity with the fallback scan after the upsert
    scan2 = {r.suggestion for r in eng.suggest("merge", serve=False).collect()}
    assert served2 == scan2


def test_filter_values_served_parity(spark, tmp_path):
    docs = _mkdocs(
        spark,
        [(1, "a b c", "en", "web"), (2, "d e f", "es", "code"), (3, "g h i", "en", "web")],
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    served = [r.value for r in eng.filter_values("/lang").collect()]
    scan = [r.value for r in eng.filter_values("/lang", serve=False).collect()]
    assert served == scan == ["en", "es"]


# --------------------------------------------------- doc store serving


def test_doc_store_get_and_hydration(spark, tmp_path):
    docs = _mkdocs(
        spark,
        [(1, "alpha text here now", "en", "web"), (2, "beta text here now", "es", "code")],
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    assert os.path.isdir(str(tmp_path / "idx" / "doc_store"))

    row = eng.get(1).collect()[0]
    assert row.text == "alpha text here now" and row.lang == "en"
    # fallback path agrees
    assert eng.get(1, serve=False).collect()[0].text == row.text

    # upsert replaces; served get must return the NEW version
    eng.ingest(_mkdocs(spark, [(1, "alpha rewritten text now", "de", "web")]))
    assert eng.get(1).collect()[0].text == "alpha rewritten text now"
    assert eng.get(1).collect()[0].lang == "de"

    # delete: served get returns nothing
    eng.delete(spark.createDataFrame([(2,)], "doc_id long"))
    assert eng.get(2).count() == 0

    # include_data hydration through the sidecar, JSON-serializable
    import json

    resp = eng.search_response("alpha", k=5, include_data=True)
    assert resp["results"] and resp["results"][0]["data"]["lang"] == "de"
    json.dumps(resp)  # numpy types would raise here


def test_doc_store_null_fields_do_not_leak_across_generations(spark, tmp_path):
    """A re-upserted doc with a NULL field must serve the NEW row's null,
    not resurrect the old generation's value for that column."""
    schema = "doc_id long, text string, lang string"
    docs = spark.createDataFrame([(1, "first version text here", "en")], schema)
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"), facets_col=None)
    eng.ingest(spark.createDataFrame([(1, "second version text here", None)], schema))
    row = eng.get(1).collect()[0]
    assert row.text == "second version text here"
    assert row.lang is None  # NOT 'en' leaked from gen 0


def test_cli_sidecar_commands_run_without_jvm(spark, tmp_path):
    """jobs/query.py --suggest/--get/--facet-counts answer from sidecars
    in a bare Python subprocess (no SparkSession, no JVM)."""
    import json
    import subprocess
    import sys

    docs = _mkdocs(spark, [(1, "merge join basics here now", "en", "web")])
    idx = str(tmp_path / "idx")
    FuguSparkEngine.build(docs, index_dir=idx)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for flags, key in (
        (["--suggest", "merge"], "suggestions"),
        (["--get", "1"], "object"),
        (["--facet-counts", "/lang"], "counts"),
    ):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "query.py"), "--index-dir", idx]
            + flags,
            capture_output=True,
            text=True,
            timeout=90,
        )
        assert r.returncode == 0, r.stderr[-500:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert key in out and out[key], (flags, out)


def test_engine_sidecars_survive_tiny_and_empty_batches(spark, tmp_path):
    """One-doc build, empty-facet docs, and serving over the resulting
    sidecars must not crash or mis-serve."""
    schema = "doc_id long, text string, lang string"
    docs = spark.createDataFrame([(1, "only document here", None)], schema).withColumn(
        "facets", F.array().cast("array<string>")
    )
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    ls = LocalSearcher(str(tmp_path / "idx"))
    assert len(ls.facet_tree_counts()) == 0  # no facets -> empty ledger
    assert len(ls.facet_counts("/lang")) == 0
    assert list(ls.suggest("only")["suggestion"]) == ["only document here"]
    assert ls.get_docs([1]).iloc[0]["text"] == "only document here"
    assert ls.get_docs([99]).empty if len(ls.get_docs([99])) == 0 else False is False
    hits = ls.search("document", k=5)
    assert list(hits["doc_id"]) == [1]


# ----------------------------------------------------------- engine.load


def test_engine_load_reopens_index(spark, tmp_path):
    """Restart path: load() must reproduce a built+mutated engine's full
    behavior — search, facet filters, get, suggest — without rebuilding."""
    docs = _mkdocs(
        spark,
        [
            (1, "merge join basics here today", "en", "web"),
            (2, "hash probe internals overview", "es", "code"),
            (3, "merge sort window functions", "en", "web"),
        ],
    )
    idx = str(tmp_path / "idx")
    eng = FuguSparkEngine.build(docs, index_dir=idx)
    eng.ingest(_mkdocs(spark, [(2, "merge join rewritten doc", "de", "code")]))
    eng.delete(spark.createDataFrame([(3,)], "doc_id long"))

    re = FuguSparkEngine.load(spark, idx)
    assert {r.doc_id for r in re.docs.select("doc_id").collect()} == {1, 2}
    want = [(r.doc_id, round(r.score, 6)) for r in eng.search("merge", k=10).collect()]
    got = [(r.doc_id, round(r.score, 6)) for r in re.search("merge", k=10).collect()]
    assert got == want and {d for d, _ in got} == {1, 2}
    assert [r.doc_id for r in re.search("merge", k=10, filters=["/lang/de"]).collect()] == [2]
    assert re.get(2).collect()[0].lang == "de"
    assert {r.suggestion for r in re.suggest("merge").collect()} == {
        "merge join basics",
        "merge join rewritten",
    }
    # mutations keep working on the reopened engine
    re.ingest(_mkdocs(spark, [(9, "merge late arrival text", "fr", "web")]))
    assert {r.doc_id for r in re.search("merge", k=10).collect()} == {1, 2, 9}


def test_engine_load_requires_doc_store(spark, tmp_path):
    from fugu_spark.segments import build_segments

    d = spark.createDataFrame([(1, "bare segments only")], "doc_id long, text string")
    build_segments(d, str(tmp_path / "idx"), text_col="text")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="doc_store"):
        FuguSparkEngine.load(spark, str(tmp_path / "idx"))


def test_doc_store_partitions_scale_with_size(spark, tmp_path, monkeypatch):
    """Partition count must grow with input size (one range partition per
    FUGU_SPARK_DOC_STORE_PART_BYTES), not cap at 32 — and point lookups
    must still prune to a single file via non-overlapping range stats."""
    import glob

    import pyarrow.parquet as pq

    monkeypatch.setenv("FUGU_SPARK_DOC_STORE_PART_BYTES", "1024")
    rows = [(i, f"document number {i} with some text payload", "en", "web") for i in range(400)]
    docs = _mkdocs(spark, rows)
    eng = FuguSparkEngine.build(docs, index_dir=str(tmp_path / "idx"))
    files = sorted(glob.glob(str(tmp_path / "idx" / "doc_store" / "part-*.parquet")))
    assert len(files) > 32, f"expected >32 range partitions, got {len(files)}"

    # non-overlapping ranges: exactly one file's [min,max] covers doc 137
    covering = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index("_doc_key")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if lo <= 137 <= hi:
            covering += 1
    assert covering == 1

    assert eng.get(137).collect()[0].doc_id == 137
