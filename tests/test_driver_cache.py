"""Driver-side postings cache (r8): bit-identity with the per-query fetch
path across every query family, plus the gating contract (uncached engines,
zero budget, and over-budget vocabularies never build it)."""

import pytest

from elasticsearch_alps_spark.config import QueryConfig
from elasticsearch_alps_spark.queries.engine import SearchEngine


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def engines(spark, built_index):
    cached = SearchEngine(spark, built_index.root, QueryConfig(), cache=True)
    plain = SearchEngine(spark, built_index.root, QueryConfig(), cache=False)
    return cached, plain


def test_cache_engages_and_match_family_bit_identical(engines):
    cached, plain = engines
    queries = ["def", "import json", "parse config value", "zz_absent_term"]
    for q in queries:
        assert _rows(cached.match_query(q)) == _rows(plain.match_query(q))
        assert (_rows(cached.match_query(q, operator="and"))
                == _rows(plain.match_query(q, operator="and")))
        assert (_rows(cached.match_query(q, minimum_should_match=60))
                == _rows(plain.match_query(q, minimum_should_match=60)))
    # the cache actually served (not silently gated off)
    assert cached._dcache_store.get("main") is not None
    assert cached.last_scorer == "driver"
    # the uncached engine must never have built one
    assert not getattr(plain, "_dcache_store", None)


def test_phrase_and_slop_bit_identical(engines):
    cached, plain = engines
    for q in ["import json", "def main", "parse json config"]:
        for slop in (0, 1):
            assert (_rows(cached.match_phrase_query(q, slop=slop))
                    == _rows(plain.match_phrase_query(q, slop=slop)))


def test_fuzzy_and_bool_bit_identical(engines):
    cached, plain = engines
    for q in ["imprt", "parse jsn confg"]:
        assert _rows(cached.fuzzy_query(q)) == _rows(plain.fuzzy_query(q))
    assert (_rows(cached.bool_must_query("import json"))
            == _rows(plain.bool_must_query("import json")))


def test_wand_driver_route_bit_identical(spark, built_index):
    w_cached = SearchEngine(spark, built_index.root,
                            QueryConfig(use_wand=True), cache=True)
    w_plain = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand=True), cache=False)
    for q in ["def", "import", "def import"]:
        assert _rows(w_cached.match_query(q)) == _rows(w_plain.match_query(q))


def test_total_hits_identical(engines):
    cached, plain = engines
    for q in ["def", "import json"]:
        a = cached._response(cached.match_query(q), q, "match")
        b = plain._response(plain.match_query(q), q, "match")
        assert a["total_hits"] == b["total_hits"]
        assert a["max_score"] == b["max_score"]


def test_zero_budget_disables_cache(spark, built_index):
    eng = SearchEngine(spark, built_index.root,
                       QueryConfig(driver_postings_cache_max_rows=0),
                       cache=True)
    eng.match_query("def").collect()
    assert eng._driver_cache("main") is None


def test_row_budget_gates_cache(spark, built_index):
    # a budget below the corpus' total postings rows must refuse to build
    eng = SearchEngine(spark, built_index.root,
                       QueryConfig(driver_postings_cache_max_rows=10),
                       cache=True)
    assert eng._driver_cache("main") is None
    # and queries still serve correctly via the per-query fetch
    plain = SearchEngine(spark, built_index.root, QueryConfig(), cache=False)
    assert _rows(eng.match_query("def")) == _rows(plain.match_query("def"))


def test_overflowing_vocab_gates_cache(spark, built_index, monkeypatch):
    # vocabulary larger than the hot-dict cap → total row count unknown →
    # cache must not build (the 100-TB regime)
    monkeypatch.setattr(SearchEngine, "_HOT_DF_K", 5)
    eng = SearchEngine(spark, built_index.root, QueryConfig(), cache=True)
    assert eng._driver_cache("main") is None
