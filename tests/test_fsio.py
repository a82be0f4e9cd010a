"""Object-store-safe metadata IO: the full index lifecycle must work when
index_dir is a URI (file:/…), exercising the Hadoop FileSystem route for
every marker/stats/listing call — the same code path an s3a:// root takes
(fsio dispatches on scheme, not on the specific connector)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark import fsio
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments, compact, delete_doc_ids, upsert_segments


def test_fsio_local_roundtrip(tmp_path):
    p = str(tmp_path / "a" / "b.json")
    fsio.makedirs(str(tmp_path / "a"))
    fsio.write_text_atomic(p, '{"x": 1}')
    assert fsio.exists(p)
    assert fsio.read_text(p) == '{"x": 1}'
    assert fsio.listdir(str(tmp_path / "a")) == ["b.json"]
    assert fsio.mtime_token(p) > 0
    fsio.rmtree(str(tmp_path / "a"))
    assert not fsio.exists(p)


def test_fsio_hadoop_roundtrip(spark, tmp_path):
    root = f"file:{tmp_path}/h"
    assert fsio.is_uri(root)
    fsio.makedirs(root)
    p = fsio.join(root, "marker.json")
    fsio.write_text_atomic(p, '{"stage": "s", "n": 2}')
    assert fsio.exists(p)
    assert fsio.read_text(p) == '{"stage": "s", "n": 2}'
    # overwrite is atomic-replace, not append
    fsio.write_text_atomic(p, "second")
    assert fsio.read_text(p) == "second"
    assert "marker.json" in fsio.listdir(root)
    assert fsio.mtime_token(p) > 0
    fsio.rmtree(root)
    assert not fsio.exists(p)


def test_as_local():
    assert fsio.as_local("/tmp/x") == "/tmp/x"
    assert fsio.as_local("file:/tmp/x") == "/tmp/x"
    assert fsio.as_local("file:///tmp/x") == "/tmp/x"
    with pytest.raises(ValueError):
        fsio.as_local("s3a://bucket/index")


@pytest.fixture(scope="module")
def corpus(spark):
    from fugu_spark.corpus import generate_corpus

    return (
        generate_corpus(spark, 80)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )


def test_index_lifecycle_on_uri_root(spark, corpus, tmp_path):
    """build → resume (byte-identical skip) → upsert → delete → compact →
    search, all against a file:/ URI index root."""
    idx = f"file:{tmp_path}/uri_idx"
    si = build_segments(corpus, idx, id_col="doc_id", text_col="content")
    base = [(r.doc_id, round(r.score, 9)) for r in
            search_segments(si, "merge join", k=5, docs=corpus).collect()]
    assert len(base) == 5

    # resume: all four stages must be skipped (markers via Hadoop FS)
    si2 = build_segments(corpus, idx, id_col="doc_id", text_col="content", resume=True)
    again = [(r.doc_id, round(r.score, 9)) for r in
             search_segments(si2, "merge join", k=5, docs=corpus).collect()]
    assert again == base

    batch = corpus.limit(2)
    si3 = upsert_segments(si2, batch, id_col="doc_id", text_col="content")
    assert si3.max_gen() == 1

    si4 = delete_doc_ids(si3, batch.select("doc_id"))
    si5 = compact(si4)
    assert si5.max_gen() == 0
    n_live = corpus.count() - 2
    assert si5.stats.n_docs == n_live
    hits = search_segments(si5, "merge join", k=5, docs=corpus).collect()
    assert len(hits) > 0
