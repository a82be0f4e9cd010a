"""Engine facade: the full reference API surface end-to-end on one object."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.engine import FuguSparkEngine
from fugu_spark.facets import derive_facets


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "merge join engine", "py", "ns1"),
            (2, "sort merge runner", "rs", "ns1"),
            (3, "hash table probe", "py", "ns2"),
            (4, "bad doc removed later", "go", "ns2"),
        ],
        "doc_id long, text string, lang string, ns string",
    ).withColumn(
        "facets",
        F.concat(
            derive_facets(("lang", F.col("lang"))),
            F.array(F.concat(F.lit("/namespace/"), F.col("ns"))),
        ),
    )
    return FuguSparkEngine.build(docs, str(tmp_path_factory.mktemp("eng") / "idx"))


def test_health_and_search(engine):
    h = engine.health()
    assert h["status"] == "ok" and h["n_docs"] == 4
    got = [r.doc_id for r in engine.search("merge", k=10).collect()]
    assert set(got) == {1, 2}


def test_search_with_filters_and_clamp(engine):
    got = [r.doc_id for r in engine.search("merge", k=0, filters=["/lang/py"]).collect()]
    assert got == [1]  # k clamp → 20; filter keeps py docs only


def test_point_and_list(engine):
    assert engine.get(3).first().text == "hash table probe"
    assert engine.list_objects(2).count() == 2


def test_suggest(engine):
    got = [r.suggestion for r in engine.suggest("merge").collect()]
    assert "merge join engine" in got


def test_facet_surface(engine):
    assert [r.value for r in engine.namespaces().collect()] == ["ns1", "ns2"]
    tree = engine.facet_tree()
    assert tree["children"]["lang"]["count"] == 4
    vals = [r.value for r in engine.filter_values("/lang").collect()]
    assert vals == ["go", "py", "rs"]
    pairs = {(r.parent, r.leaf) for r in engine.namespace_filters("ns1").collect()}
    assert ("/lang", "py") in pairs and ("/lang", "go") not in pairs


def test_compact_invalidates_serving_cache(spark, tmp_path):
    """Regression: search → ingest → compact → search. compact() resets to
    (gen=0, no deletes), colliding with a fresh build's cache key; a stale
    LocalSearcher would read rmtree'd segment files or pre-ingest results."""
    docs = spark.createDataFrame(
        [(1, "alpha merge"), (2, "beta join")], "doc_id long, text string"
    )
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"), facets_col=None)
    assert {r.doc_id for r in eng.search("merge", k=10).collect()} == {1}
    batch = spark.createDataFrame([(3, "gamma merge fresh")], "doc_id long, text string")
    eng.ingest(batch)
    eng.compact()
    assert {r.doc_id for r in eng.search("merge", k=10).collect()} == {1, 3}
    assert {r.doc_id for r in eng.search("fresh", k=10).collect()} == {3}


def test_ingest_delete_compact_cycle(engine, spark):
    batch = spark.createDataFrame(
        [(5, "vector merge index", "py", "ns1")], "doc_id long, text string, lang string, ns string"
    ).withColumn(
        "facets",
        F.concat(
            derive_facets(("lang", F.col("lang"))),
            F.array(F.concat(F.lit("/namespace/"), F.col("ns"))),
        ),
    )
    engine.ingest(batch)
    assert 5 in {r.doc_id for r in engine.search("vector", k=10).collect()}
    engine.delete(spark.createDataFrame([(4,)], "doc_id long"))
    assert engine.get(4).count() == 0
    engine.compact()
    assert engine.health()["generations"] == 1
    assert 5 in {r.doc_id for r in engine.search("vector", k=10).collect()}
