"""Config source (S6): YAML/JSON file by extension + FUGU_SPARK_* env
overrides, the reference's resolution order, driving real engine params.
Also covers F8 (include_data response shaping) and A9 (ingest facet
tally)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fugu_spark.config import EngineConfig, load_config
from fugu_spark.engine import FuguSparkEngine
from fugu_spark.facets import derive_facets


def test_config_file_yaml_and_json(tmp_path):
    y = tmp_path / "fugu.yaml"
    y.write_text("k1: 0.9\nb: 0.4\nn_buckets: 8\nindex_dir: /tmp/cfg_idx\n")
    cfg = EngineConfig.from_file(str(y))
    assert (cfg.k1, cfg.b, cfg.n_buckets, cfg.index_dir) == (0.9, 0.4, 8, "/tmp/cfg_idx")
    j = tmp_path / "fugu.json"
    j.write_text(json.dumps({"hot_df_threshold": 1000, "strict_validation": True}))
    cfg = EngineConfig.from_file(str(j))
    assert cfg.hot_df_threshold == 1000 and cfg.strict_validation is True
    assert cfg.k1 == 1.2  # untouched fields keep defaults


def test_config_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.json"
    f.write_text('{"k1": 1.0, "typo_key": 5}')
    with pytest.raises(ValueError, match="typo_key"):
        EngineConfig.from_file(str(f))


def test_env_overrides_beat_file(tmp_path):
    f = tmp_path / "fugu.yaml"
    f.write_text("k1: 0.9\nserve_max_postings: 10\n")
    env = {
        "FUGU_SPARK_CONFIG": str(f),
        "FUGU_SPARK_K1": "2.0",
        "FUGU_SPARK_STRICT_VALIDATION": "true",
    }
    cfg = load_config(environ=env)
    assert cfg.k1 == 2.0  # env wins over file
    assert cfg.serve_max_postings == 10  # file wins over default
    assert cfg.strict_validation is True
    # no file, pure env
    cfg2 = load_config(environ={"FUGU_SPARK_N_BUCKETS": "4"})
    assert cfg2.n_buckets == 4 and cfg2.k1 == 1.2


def test_config_drives_engine_scoring(spark, tmp_path):
    """k1/b from config must change real scores on BOTH serving paths."""
    docs = spark.createDataFrame(
        [(1, "merge join alpha"), (2, "merge merge merge beta gamma delta")],
        "doc_id long, text string",
    )
    base = FuguSparkEngine.build(docs, str(tmp_path / "i1"), facets_col=None)
    cfg = EngineConfig(k1=0.2, b=0.0)
    tuned = FuguSparkEngine.build(docs, str(tmp_path / "i2"), facets_col=None, config=cfg)
    s_base = {r.doc_id: r.score for r in base.search("merge", k=10).collect()}
    s_tuned = {r.doc_id: r.score for r in tuned.search("merge", k=10).collect()}
    assert s_base.keys() == s_tuned.keys() == {1, 2}
    assert s_base[2] != s_tuned[2]
    # distributed route must use the same k1/b (parity under a zero cap)
    tuned.serve_max_postings = 0
    s_dist = {r.doc_id: r.score for r in tuned.search("merge", k=10).collect()}
    assert s_dist == pytest.approx(s_tuned)


@pytest.fixture(scope="module")
def f8_engine(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "merge join", ["/conversation/c1", "/lang/py"]),
            (2, "merge sort", ["/organization/o1"]),
            (3, "merge hash", ["/lang/rs"]),
        ],
        "doc_id long, text string, facets array<string>",
    )
    return FuguSparkEngine.build(docs, str(tmp_path_factory.mktemp("f8") / "idx"))


def test_include_data_defaults(f8_engine):
    # plain search: include_data defaults ON, hits carry the stored object
    resp = f8_engine.search_response("merge", k=10)
    assert resp["includes_data_objects"] is True
    assert resp["targeting_conversations_or_organizations"] is False
    assert all("data" in r and r["data"]["text"] for r in resp["results"])
    # conv/org-targeting filters flip the default OFF
    resp2 = f8_engine.search_response("merge", k=10, filters=["/conversation/c1"])
    assert resp2["targeting_conversations_or_organizations"] is True
    assert resp2["includes_data_objects"] is False
    assert all("data" not in r for r in resp2["results"])
    # explicit include_data overrides the default; include_text strips text
    resp3 = f8_engine.search_response(
        "merge", k=10, filters=["conversation/c1"], include_data=True, include_text=False
    )
    assert resp3["includes_data_objects"] is True
    assert all("text" not in r["data"] for r in resp3["results"])


def test_search_response_took_and_highlights(f8_engine):
    resp = f8_engine.search_response("merge", k=10, include_highlights=True)
    assert isinstance(resp["took_ms"], int) and resp["took_ms"] >= 0
    assert all("**merge**" in r["highlights"] for r in resp["results"])


def test_ingest_facet_tally(f8_engine, spark):
    batch = spark.createDataFrame(
        [
            (10, "tally one", ["/lang/go"]),
            (11, "tally two", []),
            (12, "tally three", None),
        ],
        "doc_id long, text string, facets array<string>",
    )
    f8_engine.ingest(batch)
    assert f8_engine.last_ingest_tally == {
        "explicit_facets_count": 1,
        "generated_facets_count": 2,
    }
