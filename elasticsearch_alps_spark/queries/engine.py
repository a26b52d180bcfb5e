"""BM25 query engine — the reference's six query types, Spark-first.

Each query type of ``/root/reference/scripts/search/search.py:141-418`` becomes
a small declarative plan over the postings tables:

    scan postings (term IN (...) pushed into parquet; term-sorted layout →
    file/row-group skipping) → broadcast-join a tiny (term, clause, weight)
    frame → per-row BM25 contribution (whole-stage-codegen SQL expression) →
    groupBy(doc_id) partial-agg → top-k (TakeOrderedAndProject)

Scoring is Lucene 8.11 BM25 (ES 7.17 default): no (k1+1) factor,
idf = ln(1 + (N−df+0.5)/(df+0.5)), dl SmallFloat-quantized, *global* collection
stats (SURVEY.md §7.0 — equivalent to the reference's fully-merged single
index / dfs_query_then_fetch; the multi-shard per-shard-stats default of ES is
a documented divergence). Ties broken by docID asc (Q10).
"""

from __future__ import annotations

import math
import os
import threading
import time
from datetime import datetime
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from elasticsearch_alps_spark.analysis.analyzers import (
    analyze, analyze_positions, fuzzy_auto_distance, is_single_word,
)
from elasticsearch_alps_spark.config import ANALYZERS, AnalyzerConfig, QueryConfig
from elasticsearch_alps_spark.indexing.builder import IndexPaths
from elasticsearch_alps_spark.oracle import phrase_freq
from elasticsearch_alps_spark.queries.highlight import format_snippets

Clause = Tuple[int, str, float]  # (clause_id, term, weight)


def _analyzer_from_name(name: str) -> AnalyzerConfig:
    for cfg in ANALYZERS.values():
        if cfg.name() == name:
            return cfg
    raise ValueError(f"unknown analyzer {name!r} in index stats")


class SearchEngine:
    """Loads an index directory written by ``build_index`` and answers queries.

    ``cache=True`` pins the postings + term_stats DataFrames in memory — the
    analog of the reference's warmed ES page cache for latency benchmarks.
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 qcfg: Optional[QueryConfig] = None, cache: bool = False):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        self.qcfg = qcfg or QueryConfig()
        self._cache = cache
        self.stats = self.paths.read_stats()
        self.k1 = self.stats["bm25"]["k1"]
        self.b = self.stats["bm25"]["b"]
        self._postings: Dict[str, DataFrame] = {}
        self._term_stats: Dict[str, DataFrame] = {}
        self._analyzers: Dict[str, AnalyzerConfig] = {}
        self._field_src: Dict[str, str] = {}
        for field, fstats in self.stats["fields"].items():
            # an aliased field (identical analyzer) shares the source tables
            src = fstats.get("alias", field)
            self._field_src[field] = src
            if src in self._postings and src != field:
                self._postings[field] = self._postings[src]
                self._term_stats[field] = self._term_stats[src]
            else:
                self._postings[field] = spark.read.parquet(self.paths.postings(src))
                self._term_stats[field] = spark.read.parquet(self.paths.term_stats(src))
                if cache:
                    self._postings[field] = self._postings[field].cache()
                    self._term_stats[field] = self._term_stats[field].cache()
            self._analyzers[field] = _analyzer_from_name(fstats["analyzer"])
        self._docs: Optional[DataFrame] = None
        self.results: List[dict] = []
        # total-hits source of the most recent query ON THIS THREAD (for the
        # reference's total_hits stat, G3) — set by every query method via
        # _set_total: an exact count when known driver-side, an Observation
        # riding the scoring aggregation (collected for free by the top-k
        # action — no second job, r2 VERDICT wrong #8), or a recount plan as
        # last resort. Thread-LOCAL so a serving tier can run concurrent
        # queries through one engine without cross-talk (Spark job submission
        # itself is thread-safe).
        self._totals = threading.local()
        # fuzzy vocab arrays may be pre-built by a background thread while
        # the driver postings cache fetch waits on the JVM — both the lock
        # and the dict must exist before any such thread starts
        self._fuzzy_vocab_cache: Dict[str, tuple] = {}
        self._fuzzy_vocab_lock = threading.Lock()

    def _set_total(self, df: Optional[DataFrame] = None,
                   count: Optional[int] = None, obs=None) -> None:
        """Reset ALL total-hits sources (a stale count from the previous
        query must never leak into the next response)."""
        self._totals.df = df
        self._totals.count = count
        self._totals.obs = obs

    @property
    def _last_total_df(self):
        return getattr(self._totals, "df", None)

    @_last_total_df.setter
    def _last_total_df(self, v):
        self._totals.df = v

    @property
    def _last_total_count(self):
        return getattr(self._totals, "count", None)

    @_last_total_count.setter
    def _last_total_count(self, v):
        self._totals.count = v

    @property
    def _last_total_obs(self):
        return getattr(self._totals, "obs", None)

    @_last_total_obs.setter
    def _last_total_obs(self, v):
        self._totals.obs = v

    # ------------------------------------------------------------------ utils

    @property
    def docs(self) -> DataFrame:
        if self._docs is None:
            self._docs = self.spark.read.parquet(self.paths.docs)
        return self._docs

    def _fstat(self, field: str) -> Tuple[int, float]:
        fs = self.stats["fields"][field]
        return fs["n_docs"], fs["avgdl"]

    def idf(self, field: str, df: int) -> float:
        n, _ = self._fstat(field)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _df_lookup(self, field: str, terms: Sequence[str]) -> Dict[str, int]:
        """df for each query term. The cached top-K-by-df dictionary
        (_hot_dfs) answers exactly for any term it contains — and when it
        holds the WHOLE vocabulary, for absent terms too (df = 0) — so the
        common case costs no Spark job; only terms outside the hot set fall
        through to a tiny scan of the (term-sorted, min/max-pruned)
        term_stats table."""
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            return {}
        # consult the hot-term cache only if some OTHER path already paid to
        # build it (the hybrid scorer's budget check does) — a fresh engine
        # with the driver path disabled must not trade a tiny pruned lookup
        # for a top-50k collect it will never amortize
        cached = getattr(self, "_hot_df_cache", None) or {}
        hot, ceiling = cached.get(field, ({}, -1))
        if ceiling == -1:
            # no cache yet: from the SECOND lookup on this field onward,
            # build the top-K dictionary so repeated serving stops paying a
            # pruned-scan job per query (r8 — the fused scorer now takes df
            # driver-side). The first lookup stays a tiny pruned scan, so a
            # single-query engine never trades it for a top-K collect.
            cnt = getattr(self, "_ts_lookups", None)
            if cnt is None:
                cnt = self._ts_lookups = {}
            cnt[field] = cnt.get(field, 0) + 1
            if cnt[field] >= 2:
                hot, ceiling = self._hot_dfs(field)
        out = {t: hot[t] for t in uniq if t in hot}
        missing = [t for t in uniq if t not in hot]
        if missing and ceiling != 0:
            rows = (self._term_stats[field]
                    .filter(F.col("term").isin(missing))
                    .select("term", "df").collect())
            out.update({r["term"]: r["df"] for r in rows})
        # ceiling == 0 → hot holds the full vocabulary: absent terms have
        # df 0 and are correctly left out (callers use dfs.get(t, 0))
        return out

    def _norms_enabled(self, field: str) -> bool:
        return self.stats["fields"][field].get("norms", True)

    def _tf_norm_col(self, field: str):
        freq = F.col("freq").cast("double")
        if not self._norms_enabled(field):
            # Lucene BM25Similarity's norms == null branch (the url field,
            # index_config_with_url_english.json:87): no length
            # normalization — tf / (tf + k1); docs-only fields store tf ≡ 1
            return freq / (freq + F.lit(self.k1))
        _, avgdl = self._fstat(field)
        dl = F.col("dl").cast("double")
        return freq / (freq + F.lit(self.k1) *
                       (F.lit(1.0 - self.b) + F.lit(self.b) * dl / F.lit(avgdl)))

    def _empty_hits(self) -> DataFrame:
        self._set_total(count=0)
        # Built once and reused, and from a one-row LOCAL relation + limit(0)
        # rather than createDataFrame([], ddl) (r8): the empty-list form is
        # RDD-backed and schedules defaultParallelism EMPTY tasks per
        # collect — measured 0.35 s/collect on local[32] vs 5 ms for the
        # local-relation plan. Schema is identical.
        df = getattr(self, "_empty_hits_df", None)
        if df is None:
            df = self._empty_hits_df = self.spark.createDataFrame(
                [(0, 0.0)], "doc_id long, score double").limit(0)
        return df

    # Driver-side top-K-by-df term dictionary cap. 400k × ~50 B ≈ 20 MB —
    # an ES data node keeps a comparable terms index in heap per shard.
    # Raised 50k → 400k in r8: when the cap covers the WHOLE vocabulary
    # (ceiling == 0) the fuzzy expansion runs driver-side with no Spark job
    # (see _fuzzy_expand_local), and a 60k-doc code corpus already carries
    # ~300k distinct terms. At 100-TB vocabularies the dict simply holds
    # the hottest 400k terms and routing behaves as before.
    _HOT_DF_K = 400_000
    # which scorer served the last match-family query: "driver" | "fused" |
    # "exhaustive" | "wand" (diagnostics + use_wand="auto" tests)
    last_scorer: Optional[str] = None

    def _postings_view(self, field: str) -> str:
        """Register (once) the postings DataFrame as a temp view so driver
        queries go through one spark.sql() call."""
        views = getattr(self, "_views", None)
        if views is None:
            views = self._views = {}
        if field not in views:
            name = f"alps_postings_{abs(id(self))}_{field}"
            self._postings[field].createOrReplaceTempView(name)
            views[field] = name
        return views[field]

    def _hot_dfs(self, field: str) -> Tuple[Dict[str, int], int]:
        """(top-K terms by df → df, ceiling df for every other term) — one
        job at first use, then free per query."""
        cached = getattr(self, "_hot_df_cache", None)
        if cached is None:
            cached = self._hot_df_cache = {}
        if field not in cached:
            # Arrow transfer (toPandas), not collect(): a row-object
            # collect of a few 100k terms costs ~0.5 s of py4j
            # deserialization; the Arrow path is ~10× cheaper (r8)
            pdf = (self._term_stats[field]
                   .orderBy(F.desc("df"), F.asc("term"))
                   .limit(self._HOT_DF_K).select("term", "df").toPandas())
            hot = dict(zip(pdf["term"].tolist(),
                           (int(d) for d in pdf["df"].tolist())))
            ceiling = min(hot.values()) if len(hot) >= self._HOT_DF_K else 0
            # ceiling==0 means the dict holds the WHOLE vocabulary
            cached[field] = (hot, ceiling)
        return cached[field]

    def _driver_cache(self, field: str) -> Optional[dict]:
        """Term-sliced numpy postings for ``cache=True`` engines (r8): ONE
        full fetch (term, doc_id, freq, dl, positions) sorted into contiguous
        per-term slices, so every subsequent under-budget driver-path query
        assembles its working set with zero Spark jobs. Built lazily on the
        first driver-path query; returns None (permanently, per field) when
        the engine is uncached, the budget is 0, the vocabulary overflows the
        hot-dict cap (total row count then unknown — the 100-TB regime), or
        the exact total exceeds driver_postings_cache_max_rows."""
        budget = self.qcfg.driver_postings_cache_max_rows
        if not self._cache or budget <= 0:
            return None
        store = getattr(self, "_dcache_store", None)
        if store is None:
            store = self._dcache_store = {}
        src = self._field_src.get(field, field)
        if src in store:
            return store[src]
        hot, ceiling = self._hot_dfs(field)
        if ceiling != 0 or sum(hot.values()) > budget:
            store[src] = None
            return None
        # overlap the fuzzy vocab-matrix build (~0.5 s of pure numpy over
        # the same hot dict; it was the whole first-fuzzy-query latency
        # tail) with the Arrow fetch below, whose JVM-side work releases
        # the GIL (guide §2.6 — fill otherwise-idle wait with independent
        # work). _fuzzy_vocab_arrays is idempotent under its lock.
        warm = threading.Thread(target=self._fuzzy_vocab_arrays,
                                args=(field,), daemon=True)
        warm.start()
        pdf = self.spark.sql(
            f"SELECT term, doc_id, freq, dl, positions FROM "
            f"{self._postings_view(field)}").toPandas()
        codes, uniques = pd.factorize(pdf["term"], sort=True)
        order = np.argsort(codes, kind="stable")
        starts = np.searchsorted(codes[order], np.arange(len(uniques)))
        ends = np.append(starts[1:], len(codes))
        store[src] = {
            "slices": {t: (int(s), int(e))
                       for t, s, e in zip(uniques, starts, ends)},
            "doc_id": pdf["doc_id"].to_numpy()[order],
            "freq": pdf["freq"].to_numpy()[order],
            "dl": pdf["dl"].to_numpy()[order],
            "positions": pdf["positions"].to_numpy()[order],
        }
        return store[src]

    @staticmethod
    def _dcache_frame(cache: dict, terms, with_positions: bool) -> pd.DataFrame:
        """Assemble the frame the term-IN fetch would have returned, from the
        cache's per-term slices. Row order differs from a Spark fetch (term-
        blocked here), which is immaterial: every driver scorer is row-order
        invariant — at most one posting row per (doc, term), the score fold
        reorders by jidx / sorts internally, and dl is constant per doc."""
        sl = cache["slices"]
        present = [t for t in dict.fromkeys(terms) if t in sl]
        segs = [sl[t] for t in present]
        if segs:
            idx = np.concatenate([np.arange(s, e) for s, e in segs])
            term_col = np.repeat(np.asarray(present, dtype=object),
                                 [e - s for s, e in segs])
        else:
            idx = np.empty(0, dtype=np.int64)
            term_col = np.empty(0, dtype=object)
        data = {"term": term_col,
                "doc_id": cache["doc_id"][idx],
                "freq": cache["freq"][idx],
                "dl": cache["dl"][idx]}
        if with_positions:
            data["positions"] = cache["positions"][idx]
        return pd.DataFrame(data)

    def _score_clauses_driver(self, field: str,
                              clause_mults: List[Tuple[int, str, float]],
                              required: int, size: int) -> Optional[DataFrame]:
        """Hybrid serving path: ONE incremental Spark fetch of the term-pruned
        postings (positions column never read), then BM25 + top-k in plain
        Python on the driver — the same closed-form the oracle uses, so
        scores are bit-identical to it. Returns None when the postings exceed
        qcfg.driver_score_max_postings (caller falls back to the distributed
        plan — the path a 10^9-df hot term takes at scale)."""
        import numpy as np
        budget = self.qcfg.driver_score_max_postings
        if budget <= 0 or not clause_mults:
            return None
        terms = list({t for _, t, _ in clause_mults})
        # O(1) budget check: upper-bound Σdf from the cached hot-term df dict
        # (any term absent from the top-k dict has df ≤ the k-th df) — no
        # Spark job spent deciding the path
        hot, ceiling = self._hot_dfs(field)
        est = sum(hot.get(t, ceiling) for t in terms)
        if est > budget:
            return None
        cache = self._driver_cache(field)
        if cache is not None:
            pdf = self._dcache_frame(cache, terms, with_positions=False)
        else:
            # one SQL string (single py4j round trip, vs ~100 ms of
            # Column-API chatter) + Arrow transfer
            tl = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
            pdf = self.spark.sql(
                f"SELECT term, doc_id, freq, dl FROM "
                f"{self._postings_view(field)} "
                f"WHERE term IN ({tl})").toPandas()
        self.last_scorer = "driver"
        if not len(pdf):
            return self._empty_hits()
        n, _ = self._fstat(field)
        # df is exact: the fetch was complete (budget not tripped)
        df_by_term = pdf["term"].value_counts()
        clause_terms: Dict[int, set] = {}
        jmap = self._canon_jidx(clause_mults)
        wrows = []
        for cid, t, mult in clause_mults:
            dfv = int(df_by_term.get(t, 0))
            idf = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
            wrows.append((t, mult * idf, jmap[(cid, t)]))
            clause_terms.setdefault(cid, set()).add(t)
        return self._driver_score_pdf(field, pdf, wrows, clause_terms,
                                      required, size)

    def _driver_score_pdf(self, field: str, pdf: pd.DataFrame, wrows,
                          clause_terms: Dict[int, set], required: int,
                          size: int) -> DataFrame:
        """Vectorized driver-side BM25 fold over a fetched postings frame —
        the shared tail of the match-family and WAND driver serving paths
        (``wrows`` = (term, final weight, jidx) per clause)."""
        import numpy as np
        _, avgdl = self._fstat(field)
        k1, b = self.k1, self.b
        one_minus_b = 1.0 - b
        # ADVICE r6 #4: one contribution element per (posting row, clause) —
        # the exact multiset the distributed _grouped_score folds. Collapsing
        # duplicate-term clause weights into one (w1+w2)·tf element would
        # diverge by an ulp from the distributed w1·tf + w2·tf fold whenever
        # a future query type carries unequal per-clause weights for the
        # same term; the merge below keeps the paths bit-identical for ANY
        # weights. (Duplicate terms across clauses are rare, so the expanded
        # frame is the same size as pdf in the common case.)
        pdf = pdf.merge(pd.DataFrame(wrows, columns=["term", "w", "jidx"]),
                        on="term", how="inner")
        n_elems = len(wrows)
        w = pdf["w"].to_numpy(dtype=np.float64)
        freq = pdf["freq"].to_numpy(dtype=np.float64)
        if self._norms_enabled(field):
            dl = pdf["dl"].to_numpy(dtype=np.float64)
            contrib = w * (freq / (freq + k1 * (one_minus_b + b * dl / avgdl)))
        else:  # norms-free field: tf / (tf + k1), mirroring _tf_norm_col
            contrib = w * (freq / (freq + k1))
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        terms_arr = pdf["term"].to_numpy()
        # canonical fold order (r6 find, r7 rework — see _grouped_score):
        # reorder rows so each doc's contributions accumulate in fixed
        # (clause_id, term) jidx order from 0.0 — np.add.at is sequential per
        # slot, so per-doc addition order is the row order restricted to that
        # doc. Missing jidx slots simply don't add (the distributed fold adds
        # an exact + 0.0 there), so scores are bit-identical across index
        # layouts AND to the fused/exhaustive/WAND folds. Above DET_SUM_MAX
        # pairs, the same ascending-by-value fallback as _grouped_score.
        if n_elems > 1:
            if n_elems <= self.DET_SUM_MAX:
                order_ix = np.argsort(pdf["jidx"].to_numpy(), kind="stable")
            else:
                order_ix = np.argsort(contrib, kind="stable")
            docs, contrib = docs[order_ix], contrib[order_ix]
            terms_arr = terms_arr[order_ix]
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        if required > 1:
            nmatch = np.zeros(len(uniq), dtype=np.int32)
            term_ser = pd.Series(terms_arr)
            for cid, cterms in clause_terms.items():
                mask = term_ser.isin(cterms).to_numpy()
                hit = np.zeros(len(uniq), dtype=bool)
                hit[inv[mask]] = True
                nmatch += hit
            keep = nmatch >= required
            uniq, scores = uniq[keep], scores[keep]
        self._set_total(count=int(len(uniq)))
        order = np.lexsort((uniq, -scores))[:size]
        return self._local_hits_df(uniq[order], scores[order])

    def _local_hits_df(self, doc_ids, scores) -> DataFrame:
        """Materialize a driver-computed top-k as a DataFrame through the
        Arrow fast path — createDataFrame from a typed pandas frame is ~7×
        cheaper than the pickled list+DDL route (38 ms vs 267 ms measured
        for 50 rows), which was the DOMINANT cost of a warm hybrid query."""
        import numpy as np
        pdf = pd.DataFrame({
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "score": np.asarray(scores, dtype=np.float64)})
        if not len(pdf):
            return self._empty_hits()
        return self.spark.createDataFrame(pdf)

    def _score_clauses_fused(self, field: str, clause_mults: List[Tuple[int, str, float]],
                             required: int, size: int) -> DataFrame:
        """Distributed scorer with idf computed INSIDE the plan (JVM ln — the
        provenance the r7 bit-exactness trail pins; a driver-side math.log
        would risk 1-ulp divergence vs the fused history).

        r8: when every clause carries a distinct term (the whole match
        family), the clause frame collapses to literal CASE WHEN mappings
        term → (weight, jidx) with the df values fetched driver-side
        (_df_lookup: hot-dict hit or one tiny pruned term_stats scan) — the
        plan is then a single pruned postings scan + project + aggregate,
        with NO broadcast exchange and NO term_stats subtree. Measured on
        the bench mixed section: 4 Spark jobs → 2, 0.57–0.63 s → 0.18–0.22 s
        per query, scores bit-identical (the idf expression tree is
        unchanged — same JVM StrictMath.log — only its df input moves from a
        scanned column to a literal). Duplicate terms across clauses (bool
        queries can produce them) keep the broadcast-join form, where each
        posting row legitimately fans out to several clause rows."""
        if not clause_mults:
            return self._empty_hits()
        self.last_scorer = "fused"
        terms = list({t for _, t, _ in clause_mults})
        n, _ = self._fstat(field)
        jmap = self._canon_jidx(clause_mults)

        def idf_of(df_col):
            return F.log(F.lit(1.0) + (F.lit(float(n)) - df_col + F.lit(0.5))
                         / (df_col + F.lit(0.5)))

        if (len(terms) == len(clause_mults)
                and not getattr(self, "_force_join_clause_frame", False)):
            # one clause per term: literal term→(weight, jidx[, clause_id])
            # projection instead of a broadcast join (≤ DET_SUM_MAX branches
            # on the conditional-sum path; bool fan-outs above that are rare
            # and still bounded by the query's clause count).
            # r8 batch 6: the three CASE chains are built as ONE SQL string
            # each via F.expr instead of chained F.when Column calls —
            # measured ~40-50 ms of py4j round trips PER CLAUSE on the
            # Column path (plan construction 0.14-0.27 s of a ~0.5 s fused
            # query). The SQL parses to the IDENTICAL expression tree
            # (CaseWhen with no else; D-suffixed double literals; ln ==
            # F.log), so Catalyst's constant folding produces bit-identical
            # weights — every fused-path oracle gate re-verified green.
            dfs = self._df_lookup(field, terms)

            def lit_s(t: str) -> str:
                # backslash BEFORE quote: Spark SQL treats \ as an escape
                return "'" + t.replace("\\", "\\\\").replace("'", "''") + "'"

            w_arms, j_arms, c_arms = [], [], []
            nf = float(n)
            for cid, t, mult in clause_mults:
                cond = f"term = {lit_s(t)}"
                dff = float(dfs.get(t, 0))
                w = (f"{float(mult)!r}D * ln({1.0!r}D + ({nf!r}D - {dff!r}D"
                     f" + {0.5!r}D) / ({dff!r}D + {0.5!r}D))")
                w_arms.append(f"WHEN {cond} THEN {w}")
                j_arms.append(f"WHEN {cond} THEN {jmap[(cid, t)]}")
                if required > 1:
                    c_arms.append(f"WHEN {cond} THEN {cid}")
            j = (self._postings[field]
                 .filter(F.col("term").isin(terms))
                 .withColumn("jidx", F.expr("CASE " + " ".join(j_arms) + " END"))
                 .withColumn("s", F.expr("CASE " + " ".join(w_arms) + " END")
                             * self._tf_norm_col(field)))
            if required > 1:
                j = j.withColumn(
                    "clause_id", F.expr("CASE " + " ".join(c_arms) + " END"))
        else:
            cdf = self.spark.createDataFrame(
                [(cid, t, mult, jmap[(cid, t)]) for cid, t, mult in clause_mults],
                "clause_id int, term string, mult double, jidx int")
            wdf = (self._term_stats[field]
                   .filter(F.col("term").isin(terms)).select("term", "df")
                   .join(F.broadcast(cdf), "term")
                   .select("term", "clause_id", "jidx",
                           (F.col("mult")
                            * idf_of(F.col("df").cast("double"))).alias("weight")))
            j = (self._postings[field]
                 .filter(F.col("term").isin(terms))
                 .join(F.broadcast(wdf), "term")
                 .withColumn("s", F.col("weight") * self._tf_norm_col(field)))
        agg = self._grouped_score(j, len(clause_mults), required > 1)
        if required > 1:
            agg = agg.filter(F.col("nmatch") >= required)
        agg, obs = self._observe_total(agg)
        return (agg.select("doc_id", "score")
                   .orderBy(F.desc("score"), F.asc("doc_id")).limit(size))

    # (clause, term) pairs above which the clause-order fold falls back to
    # the r6 ascending-value collect_list fold: the conditional-sum
    # projection widens the agg buffer by one double per pair, so very fat
    # expansions (≫ typical fuzzy-multiword) keep the compact path
    DET_SUM_MAX = 64

    @staticmethod
    def _canon_jidx(clause_rows) -> Dict[Tuple[int, str], int]:
        """Canonical fold position for every (clause_id, term) pair: rank in
        the (clause_id, term)-sorted order — a pure function of the QUERY
        (independent of expansion-collection order and of index layout),
        mirroring Lucene's fixed clause-iteration determinism."""
        pairs = sorted((cid, t) for cid, t, *_ in clause_rows)
        if len(set(pairs)) != len(pairs):
            # ValueError, not assert (ADVICE r7): the no-duplicate contract
            # must hold under python -O too — a silent collapse here would
            # break the cross-path bit-identical fold
            raise ValueError("duplicate (clause_id, term) pair — callers "
                             "must pre-merge weights")
        return {p: i for i, p in enumerate(pairs)}

    def _grouped_score(self, j: DataFrame, m: int,
                       with_nmatch: bool) -> DataFrame:
        """Per-doc score with a canonical fold order (r6 find, r7 rework —
        VERDICT r6 next #2): fold the ≤ m contributions in fixed
        (clause_id, term) order. Each (doc, jidx) has AT MOST ONE posting
        row (postings are unique per (term, doc); the clause frame is unique
        per (clause_id, term)), so every per-jidx ``sum(when(jidx=i, s))``
        aggregates a single element — order-free — and the left-associated
        projection sum over jidx 0..m−1 is deterministic. Missing clauses
        contribute an exact ``+ 0.0`` (IEEE: x + 0.0 ≡ x for x ≥ 0), so the
        fold equals the driver/WAND fold of only-present contributions in
        jidx order, bit for bit. Unlike the r6 ascending-value
        collect_list fold this keeps streaming ``partial_sum`` map-side
        combines and whole-stage codegen (the r6 fold shipped every
        contribution double through an ObjectHashAggregate — forced-
        exhaustive hot-term queries ran ~4× slower). Above DET_SUM_MAX
        pairs the compact ascending-value fold returns (both are
        layout-invariant; the driver path switches on the same constant so
        cross-path bit-identity holds per query)."""
        # nmatch (countDistinct) only when the caller will FILTER on it
        # (required > 1) — r8: Spark rewrites a distinct aggregate into an
        # Expand + two aggregation passes (a second shuffle), and the
        # CollectMetrics observe node blocks Catalyst from pruning the
        # unused nmatch away; a required==1 query paid ~3x for a column it
        # dropped (measured 0.93 s -> 0.29 s on a hot single-term query).
        nm = ([F.countDistinct("clause_id").alias("nmatch")]
              if with_nmatch else [])
        if m <= 1:
            return j.groupBy("doc_id").agg(
                F.sum("s").alias("score"), *nm)
        if m <= self.DET_SUM_MAX:
            sums = [F.sum(F.when(F.col("jidx") == i, F.col("s"))).alias(f"_s{i}")
                    for i in range(m)]
            agg = j.groupBy("doc_id").agg(*sums, *nm)
            score = F.coalesce(F.col("_s0"), F.lit(0.0))
            for i in range(1, m):
                score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
            return agg.select("doc_id", score.alias("score"),
                              *(["nmatch"] if with_nmatch else []))
        return j.groupBy("doc_id").agg(
            F.aggregate(F.array_sort(F.collect_list("s")),
                        F.lit(0.0), lambda acc, x: acc + x).alias("score"),
            *nm)

    def _observe_total(self, matches: DataFrame) -> Tuple[DataFrame, "object"]:
        """Attach a row-count Observation to the full-match plan: the top-k
        action (TakeOrderedAndProject consumes every aggregated row — and,
        unlike a range exchange, runs no sampling pass that would double-
        count) fills it for free, so _response needs no second job for
        total_hits. The unobserved plan is kept as a recount fallback."""
        obs = Observation()
        observed = matches.observe(obs, F.count(F.lit(1)).alias("n"))
        self._set_total(df=matches, obs=obs)
        return observed, obs

    def _score_clauses(self, field: str, clauses: List[Clause],
                       required: int, size: int) -> DataFrame:
        """Disjunctive scoring: per-doc score = Σ weight·tf_norm over matched
        clause terms; keep docs matching ≥ ``required`` distinct clauses."""
        if not clauses:
            return self._empty_hits()
        self.last_scorer = "exhaustive"
        terms = list({t for _, t, _ in clauses})
        jmap = self._canon_jidx(clauses)
        cdf = self.spark.createDataFrame(
            [(cid, t, w, jmap[(cid, t)]) for cid, t, w in clauses],
            "clause_id int, term string, weight double, jidx int")
        j = (self._postings[field]
             .filter(F.col("term").isin(terms))  # pushed into the parquet scan
             .join(F.broadcast(cdf), "term")
             .withColumn("s", F.col("weight") * self._tf_norm_col(field)))
        agg = self._grouped_score(j, len(clauses), required > 1)
        if required > 1:
            agg = agg.filter(F.col("nmatch") >= required)
        agg, obs = self._observe_total(agg)
        return (agg.select("doc_id", "score")
                   .orderBy(F.desc("score"), F.asc("doc_id")).limit(size))

    # --------------------------------------------------- the six query types

    def match_query(self, text: str, operator: str = "or",
                    minimum_should_match: Optional[int] = None,
                    size: Optional[int] = None,
                    field: str = "main") -> DataFrame:
        """Q1/Q2/Q3 (search.py:141-172): analyzed OR/AND match, top `size` by
        BM25, minimum_should_match as a percentage for OR. ``field`` selects
        the analyzed field (the reference's queries are field-parametric,
        search.py:151: "main" = text, or any ExtraField name, e.g. "url" —
        analyzed with THAT field's analyzer and scored with its norms
        setting)."""
        size = size or self.qcfg.size_match
        terms = analyze(text, self._analyzers[field])
        if not terms:
            return self._empty_hits()
        mult: Dict[str, int] = {}
        for t in terms:
            mult[t] = mult.get(t, 0) + 1
        if operator == "and":
            required = len(mult)
        elif minimum_should_match is not None:
            # ES rounds positive percentages DOWN (Q3), clamped ≥ 1
            required = max(1, int(math.floor(minimum_should_match / 100.0 * len(mult))))
        else:
            required = 1
        clause_mults = [(i, t, float(k)) for i, (t, k) in enumerate(mult.items())]
        use_wand = self._resolve_use_wand(field, list(mult))
        if not use_wand:
            hits = self._score_clauses_driver(field, clause_mults, required, size)
            if hits is not None:
                return hits
        if self.qcfg.fused_stats and not use_wand:
            return self._score_clauses_fused(field, clause_mults, required, size)
        dfs = self._df_lookup(field, list(mult))
        clauses = [(i, t, k * self.idf(field, dfs.get(t, 0)))
                   for i, (t, k) in enumerate(mult.items())]
        if use_wand:
            # match-query clauses are one-per-distinct-term, so the WAND
            # conjunctive/msm extension applies to AND and msm too (r2)
            return self._wand(field, clauses, size, required)
        return self._score_clauses(field, clauses, required, size)

    def _resolve_use_wand(self, field: str, terms: List[str]) -> bool:
        """``use_wand="auto"`` (r4, VERDICT r3 next #2): pick WAND per query
        when the LARGEST clause df reaches qcfg.wand_auto_min_df — pruning
        pays exactly where posting lists get long (measured crossover,
        BENCH/BASELINE.md r3: df≈6×10⁴ loses, ≈10⁵ parity, ≈10⁶ wins) — else
        the fused exhaustive scorer. The decision is O(1) from the hot-term
        cache except in one regime — every query term outside the top-K dict
        while the K-th df itself clears the threshold — where a pruned
        term_stats lookup resolves it exactly (ADVICE r4: assuming the
        ceiling there misrouted all rare-term queries to WAND on corpora
        whose 50k-th term is that hot). WAND also needs the packed blocks
        on disk."""
        mode = self.qcfg.use_wand
        src = self._field_src.get(field, field)
        packed = self.paths.packed(src)
        has_packed = "://" in packed or os.path.exists(packed)
        if mode != "auto":
            # ADVICE r6 #2: an explicit use_wand=True must not sail past the
            # auto-mode guards — WAND needs the packed blocks on disk, and
            # its max-score bounds use the norms/dl BM25 formula, which is
            # WRONG for a norms-free field (ExtraField builds both ways:
            # build_packed=False, norms=False).
            if mode and not self._norms_enabled(field):
                raise ValueError(
                    f"use_wand=True is invalid for field {field!r}: norms "
                    "are disabled (docs-only scoring), and WAND's max-score "
                    "bounds assume the norms/dl BM25 formula. Use "
                    "use_wand=False or 'auto' (auto never picks WAND here).")
            if mode and not has_packed:
                raise ValueError(
                    f"use_wand=True but field {field!r} has no packed "
                    f"blocks at {packed} (index built with "
                    "build_packed=False?). Rebuild with build_packed=True "
                    "or use use_wand=False / 'auto'.")
            return bool(mode)
        if not has_packed or not self._norms_enabled(field):
            return False
        thresh = self.qcfg.wand_auto_min_df
        if thresh is None:  # env pin → build-time sidecar → process probe
            from elasticsearch_alps_spark.queries.calibrate import (
                resolve_min_df,
            )
            thresh = resolve_min_df(self.spark, self.paths.lineage_dir)
        hot, ceiling = self._hot_dfs(field)
        if any(hot.get(t, 0) >= thresh for t in terms):
            return True  # exact: a hot term alone clears the bar
        missing = [t for t in terms if t not in hot]
        if not missing or ceiling < thresh:
            # hot answers exactly (ceiling==0 → full vocabulary: absent
            # terms have df 0), or no absent term can reach the threshold
            return False
        # ambiguous regime (ADVICE r4): the 50k-th df is ≥ the threshold, so
        # "absent ⇒ ceiling" would misroute every rare-term query to WAND —
        # resolve with the tiny pruned term_stats lookup instead
        dfs = self._df_lookup(field, missing)
        return any(dfs.get(t, 0) >= thresh for t in missing)

    def _wand(self, field: str, clauses: List[Clause], size: int,
              required: int = 1) -> DataFrame:
        """Block-max WAND over the packed blocks (M6) — result-identical to
        the exhaustive scorer (pruning is lossless; asserted in tests)."""
        from elasticsearch_alps_spark import fsio
        from elasticsearch_alps_spark.queries.wand import wand_topk
        self.last_scorer = "wand"
        _, avgdl = self._fstat(field)
        src = self._field_src.get(field, field)
        cached = getattr(self, "_packed_cache", None)
        if cached is None:
            cached = self._packed_cache = {}
        if src not in cached:
            df = self.spark.read.parquet(self.paths.packed(src))
            if self._cache:
                df = df.cache()
            meta = fsio.read_json(os.path.join(self.paths.field_dir(src),
                                               "packed_meta.json"), self.spark)
            cached[src] = (df, meta["n_buckets"])
        packed_df, n_buckets = cached[src]
        # WAND prunes, so the scoring job can't observe the full match count.
        # Keep an UNOBSERVED positions-free recount plan as the lazy fallback
        # (r2 VERDICT wrong #4 / ADVICE): _response only pays for it when a
        # response row is actually assembled — ad-hoc top-k calls never run it.
        # WAND clauses are one-per-distinct-term (see wand_topk), so
        # nmatch == countDistinct(term). Guard the assumption (ADVICE r3): a
        # future caller passing duplicate-term or multi-clause-same-term
        # expansions (e.g. fuzzy) would silently miscount against `required`.
        terms = list({t for _, t, _ in clauses})
        if len(terms) != len(clauses):
            raise ValueError(
                "_wand requires one clause per distinct term "
                f"(got {len(clauses)} clauses over {len(terms)} terms); "
                "the total_hits recount counts distinct terms per doc")
        recount = (self._postings[field]
                   .filter(F.col("term").isin(terms))
                   .groupBy("doc_id")
                   .agg(F.countDistinct("term").alias("nmatch")))
        if required > 1:
            recount = recount.filter(F.col("nmatch") >= required)
        self._set_total(df=recount.select("doc_id"))
        # canonical clause-order fold (r7, see _grouped_score): WAND folds
        # each doc's contributions in the same (clause_id, term) jidx order
        # as the DataFrame scorers, so pruned results stay bit-identical
        jmap = self._canon_jidx(clauses)
        term_order = ({t: jmap[(cid, t)] for cid, t, _ in clauses}
                      if len(clauses) <= self.DET_SUM_MAX else None)
        hits = self._wand_driver(field, clauses, terms, size, required)
        if hits is not None:
            return hits
        return wand_topk(self.spark, self.paths.packed(src),
                         self.paths.field_dir(src), clauses, size,
                         self.k1, self.b, avgdl, required,
                         packed_df=packed_df, n_buckets=n_buckets,
                         term_order=term_order)

    def _wand_driver(self, field: str, clauses, terms, size: int,
                     required: int) -> Optional[DataFrame]:
        """Hybrid serving path for the WAND route (r8): when the query's
        estimated Σdf fits the driver budget (the same O(1) hot-cache check
        the match-family driver scorer makes), serve it with ONE term-pruned
        postings fetch + the shared vectorized driver fold instead of the
        distributed packed-block plan — whose shuffle + one-python-task-per-
        bucket costs ~1 s of fixed overhead at small working sets (measured:
        0.14 s to scan+collect the pruned data vs 1.1 s end-to-end). Under
        the budget, pruning buys nothing: the whole working set transfers in
        one job and the numpy fold beats a per-doc Python WAND walk (the
        same machine-property crossover queries/calibrate.py measures).
        Results are bit-identical — the r7 canonical (clause_id, term)
        fold order makes the driver and WAND folds agree bit-for-bit
        (cross-path identity is pytest-asserted). An over-budget query (the
        100-TB hot-term regime) returns None and takes the distributed
        block-max WAND exactly as before."""
        budget = self.qcfg.driver_score_max_postings
        if budget <= 0:
            return None
        hot, ceiling = self._hot_dfs(field)
        if sum(hot.get(t, ceiling) for t in terms) > budget:
            return None
        cache = self._driver_cache(field)
        if cache is not None:
            pdf = self._dcache_frame(cache, terms, with_positions=False)
        else:
            tl = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
            pdf = self.spark.sql(
                f"SELECT term, doc_id, freq, dl FROM "
                f"{self._postings_view(field)} "
                f"WHERE term IN ({tl})").toPandas()
        if not len(pdf):
            # keep the recount plan set by _wand (count == 0 either way)
            return self._empty_hits()
        jmap = self._canon_jidx(clauses)
        wrows = [(t, w, jmap[(cid, t)]) for cid, t, w in clauses]
        clause_terms = {cid: {t} for cid, t, _ in clauses}
        return self._driver_score_pdf(field, pdf, wrows, clause_terms,
                                      required, size)

    def _phrase_driver(self, field: str, terms, offsets, uniq, dfs,
                       idf_sum: float, slop: int,
                       size: int) -> Optional[DataFrame]:
        """Hybrid serving path for phrases (r2): ONE fetch of the term-pruned
        postings WITH positions, then candidate filtering + phrase_freq +
        BM25 in Python on the driver — the same closed form the oracle and
        the distributed pfreq UDF use, so results are identical. Returns
        None over budget (exact Σdf — already fetched for idf)."""
        budget = self.qcfg.driver_score_max_postings
        if budget <= 0 or sum(dfs[t] for t in uniq) > budget:
            return None
        from elasticsearch_alps_spark.indexing.postings import decode_positions
        tl = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
        n_terms = len(uniq)
        view = self._postings_view(field)
        min_df = min(dfs[t] for t in uniq)
        sum_df = sum(dfs[t] for t in uniq)
        # Two-fetch only when the hot∧rare asymmetry actually pays (r8):
        # the second job's fixed cost (~0.1 s) buys skipping ~sum_df −
        # n_terms·min_df position blobs. For balanced mid-df phrases that
        # saving is ~nothing, so one fetch with positions wins a whole job;
        # both variants feed the identical scorer → identical results.
        two_fetch_pays = sum_df > max(32_000, 4 * n_terms * min_df)
        cache = self._driver_cache(field)
        if cache is not None:
            # driver postings cache hit: the working set is already local, so
            # the two-fetch transfer optimization is moot — assemble the one-
            # fetch frame (identical scorer input → identical results; both
            # fetch variants were already asserted result-equal)
            pdf = self._dcache_frame(cache, uniq, with_positions=True)
            counts = pdf.groupby("doc_id")["term"].nunique()
            cand_ids = set(counts.index[counts == n_terms])
            sub = pdf[pdf["doc_id"].isin(cand_ids)]
        elif (min_df <= self.qcfg.phrase_driver_candidate_fetch_max
                and two_fetch_pays):
            # two-fetch variant (mirrors the distributed two-phase plan): a
            # positions-FREE fetch finds conjunction candidates (≤ min df of
            # the phrase terms), then positions transfer only for those docs
            # — a hot∧rare phrase skips the hot term's position blobs
            light = self.spark.sql(
                f"SELECT term, doc_id, freq, dl FROM {view} "
                f"WHERE term IN ({tl})").toPandas()
            counts = light.groupby("doc_id")["term"].nunique()
            cand_ids = set(int(d) for d in counts.index[counts == n_terms])
            if not cand_ids:
                return self._empty_hits()
            il = ", ".join(str(d) for d in sorted(cand_ids))
            pos_pdf = self.spark.sql(
                f"SELECT term, doc_id, positions FROM {view} "
                f"WHERE term IN ({tl}) AND doc_id IN ({il})").toPandas()
            sub = light[light["doc_id"].isin(cand_ids)].merge(
                pos_pdf, on=["term", "doc_id"])
        else:
            pdf = self.spark.sql(
                f"SELECT term, doc_id, freq, dl, positions "
                f"FROM {view} WHERE term IN ({tl})").toPandas()
            counts = pdf.groupby("doc_id")["term"].nunique()
            cand_ids = set(counts.index[counts == n_terms])
            sub = pdf[pdf["doc_id"].isin(cand_ids)]
        _, avgdl = self._fstat(field)
        k1, b = self.k1, self.b
        if slop == 0:
            # vectorized exact-phrase scoring (r8): the per-candidate-doc
            # pandas loop below costs ~150 µs/doc (sub-frame + per-row
            # decode + phrase_freq) — ~2.3 s for a mid-df two-term phrase
            # at bench scale. phrase_freq(slop=0) counts anchor positions
            # p of terms[0] with p+offsets[i] present for every other
            # occurrence, which is a pure key-set intersection:
            # key = doc·2³² + (pos − offset). Same BM25 expression tree →
            # bit-identical scores (asserted by the cross-path pytest).
            doc_ids, scores = self._phrase_freqs_vec(
                sub, terms, offsets, idf_sum, k1, b, avgdl)
            self._set_total(count=int(len(doc_ids)))
            order = np.lexsort((doc_ids, -scores))[:size]
            return self._local_hits_df(doc_ids[order], scores[order])
        scored = []
        for doc_id, g in sub.groupby("doc_id"):
            pos = {}
            dl = 0.0
            for t, p, d in zip(g["term"], g["positions"], g["dl"]):
                pos[t] = (decode_positions(bytes(p))
                          if isinstance(p, (bytes, bytearray)) else list(p))
                dl = float(d)
            freq = phrase_freq(terms, pos, slop, offsets)
            if freq > 0.0:
                tf = freq / (freq + k1 * (1.0 - b + b * dl / avgdl))
                scored.append((int(doc_id), idf_sum * tf))
        self._set_total(count=len(scored))
        scored.sort(key=lambda x: (-x[1], x[0]))
        top = scored[:size]
        return self._local_hits_df([d for d, _ in top], [s for _, s in top])

    @staticmethod
    def _phrase_freqs_vec(sub: pd.DataFrame, terms, offsets, idf_sum: float,
                          k1: float, b: float, avgdl: float):
        """Exact-phrase (slop=0) frequencies + BM25 scores for candidate
        rows, whole-frame numpy. Returns (doc_ids, scores) for docs with
        freq > 0. Equivalent to phrase_freq(slop=0) per doc: positions are
        unique per (term, doc), so each occurrence's adjusted key set is
        unique and np.intersect1d(assume_unique) is the anchor count."""
        import numpy as np
        from elasticsearch_alps_spark.indexing.postings import varint_decode_np
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if not len(sub):
            return empty
        row_doc = sub["doc_id"].to_numpy(dtype=np.int64)
        row_dl = sub["dl"].to_numpy(dtype=np.float64)
        pos_col = sub["positions"].tolist()
        if pos_col and isinstance(pos_col[0], (bytes, bytearray)):
            # one varint decode for ALL rows' blobs; per-row streams are
            # [count, deltas...] so row boundaries derive from the counts
            flat = varint_decode_np(b"".join(bytes(p) for p in pos_col))
            starts = []
            i = 0
            for _ in range(len(pos_col)):
                starts.append(i)
                i += 1 + int(flat[i])
            starts = np.asarray(starts, dtype=np.int64)
            row_len = flat[starts]
            deltas = np.delete(flat, starts)
        else:  # raw int-array positions (already absolute, delta of cumsum)
            row_len = np.fromiter((len(p) for p in pos_col), np.int64,
                                  len(pos_col))
            absolute = (np.concatenate([np.asarray(p, dtype=np.int64)
                                        for p in pos_col])
                        if row_len.sum() else np.empty(0, dtype=np.int64))
            seg0 = np.concatenate(([0], np.cumsum(row_len)[:-1]))
            deltas = np.empty_like(absolute)
            if len(absolute):
                deltas[0] = absolute[0]
                deltas[1:] = absolute[1:] - absolute[:-1]
                nz = seg0[row_len > 0]
                deltas[nz] = absolute[nz]
        # segmented cumsum → absolute positions per row
        seg_start = np.concatenate(([0], np.cumsum(row_len)[:-1]))
        cs = np.cumsum(deltas)
        nonzero = row_len > 0
        base = np.zeros(len(row_len), dtype=np.int64)
        base[nonzero] = cs[seg_start[nonzero]] - deltas[seg_start[nonzero]]
        flat_pos = cs - np.repeat(base, row_len)
        flat_doc = np.repeat(row_doc, row_len)
        # per-row term code aligned to the flattened positions
        term_code = {t: i for i, t in enumerate(dict.fromkeys(terms))}
        row_code = sub["term"].map(term_code).to_numpy(dtype=np.int64)
        flat_code = np.repeat(row_code, row_len)
        SHIFT = np.int64(1) << np.int64(32)
        inter = None
        for occ, t in enumerate(terms):
            sel = flat_code == term_code[t]
            keys = flat_doc[sel] * SHIFT + (flat_pos[sel]
                                            - np.int64(offsets[occ]))
            inter = keys if inter is None else np.intersect1d(
                inter, keys, assume_unique=True)
            if not len(inter):
                return empty
        docs_hit, freq = np.unique(inter // SHIFT, return_counts=True)
        # dl per doc (identical across a doc's rows): first row wins
        uniq_docs, first_ix = np.unique(row_doc, return_index=True)
        dl = row_dl[first_ix[np.searchsorted(uniq_docs, docs_hit)]]
        freq = freq.astype(np.float64)
        tf = freq / (freq + k1 * (1.0 - b + b * dl / avgdl))
        return docs_hit, idf_sum * tf

    def match_phrase_query(self, text: str, slop: int = 0,
                           size: Optional[int] = None) -> DataFrame:
        """Q4 (search.py:174-205): all terms present, positions form the phrase
        (± slop); scored as BM25 with tf = phrase frequency and the summed idf
        of the phrase terms (Lucene PhraseWeight)."""
        size = size or self.qcfg.size_match
        # analyzed positions, stopword gaps preserved (Lucene phrase semantics)
        tp = analyze_positions(text, self._analyzers["main"])
        if not tp:
            return self._empty_hits()
        terms = [t for t, _ in tp]
        offsets = [p - tp[0][1] for _, p in tp]
        if len(terms) == 1:
            return self.match_query(text, "or", size=size)
        uniq = list(dict.fromkeys(terms))
        dfs = self._df_lookup("main", uniq)
        if any(dfs.get(t, 0) == 0 for t in uniq):
            return self._empty_hits()
        # Lucene PhraseWeight sums idf per term occurrence
        idf_sum = sum(self.idf("main", dfs[t]) for t in terms)
        hits = self._phrase_driver("main", terms, offsets, uniq, dfs, idf_sum,
                                   slop, size)
        if hits is not None:
            return hits
        # Two-phase candidate plan (r2 rework — VERDICT r1 wrong #1): the r1
        # plan collect_list'ed positions for EVERY doc containing ANY phrase
        # term, so one frequent term shuffled the corpus's position blobs.
        # Phase 1 finds conjunction candidates from a positions-free scan
        # (count == n distinct terms; postings are unique per (term, doc)).
        post = self._postings["main"].filter(F.col("term").isin(uniq))
        cand_ids = (post.select("doc_id")
                    .groupBy("doc_id").agg(F.count("*").alias("nmatch"))
                    .filter(F.col("nmatch") == len(uniq))
                    .select("doc_id"))
        # Phase 2 re-scans postings WITH positions for the candidate set only.
        # |candidates| ≤ min df over the phrase terms; broadcast the id set
        # when that bound is small (positions then never cross an exchange
        # pre-aggregation), else fall back to a shuffle semi-join.
        min_df = min(dfs[t] for t in uniq)
        ids = cand_ids if min_df > self.qcfg.phrase_broadcast_max_candidates \
            else F.broadcast(cand_ids)
        cand = (post.join(ids, "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(F.collect_list(F.struct("term", "positions")).alias("plists"),
                     F.first("dl").alias("dl")))

        qterms, qslop, qoffsets = list(terms), slop, list(offsets)

        @F.pandas_udf("double")
        def pfreq(plists: pd.Series) -> pd.Series:
            from elasticsearch_alps_spark.indexing.postings import decode_positions

            def one(lst):
                pos = {}
                for e in lst:
                    p = e["positions"]
                    pos[e["term"]] = (decode_positions(bytes(p))
                                      if isinstance(p, (bytes, bytearray))
                                      else list(p))
                return phrase_freq(qterms, pos, qslop, qoffsets)
            return plists.map(one)

        scored = (cand.withColumn("freq", pfreq("plists"))
                      .filter(F.col("freq") > 0.0)
                      .withColumn("score", F.lit(idf_sum) * self._tf_norm_col("main")))
        scored, obs = self._observe_total(scored)
        return (scored.select("doc_id", "score")
                      .orderBy(F.desc("score"), F.asc("doc_id")).limit(size))

    def term_query_exact(self, text: str, size: Optional[int] = None) -> DataFrame:
        """Q5 (search.py:207-242): single-word gate; manual lowercase only (the
        reference does NOT asciifold the query side — quirk, search.py:224);
        exact-analyzer postings, BM25-scored."""
        size = size or self.qcfg.size_term
        if not is_single_word(text) or "exact" not in self._postings:
            return self._empty_hits()
        term = text.strip().lower()
        hits = self._score_clauses_driver("exact", [(0, term, 1.0)], 1, size)
        if hits is not None:
            return hits
        if self.qcfg.fused_stats:
            return self._score_clauses_fused("exact", [(0, term, 1.0)], 1, size)
        dfs = self._df_lookup("exact", [term])
        if not dfs:
            return self._empty_hits()
        clauses = [(0, term, self.idf("exact", dfs[term]))]
        return self._score_clauses("exact", clauses, 1, size)

    def wildcard_query(self, text: str, size: Optional[int] = None) -> DataFrame:
        """Q6 (search.py:244-279): single-word gate; ``*word*`` over the exact
        field's term dictionary; ES default constant-score rewrite → score 1.0,
        docID-ordered."""
        size = size or self.qcfg.size_wildcard
        if not is_single_word(text) or "exact" not in self._postings:
            return self._empty_hits()
        needle = text.strip().lower()
        matched = (self._term_stats["exact"]
                   .filter(F.col("term").contains(needle)).select("term"))
        all_hits = (self._postings["exact"]
                    .join(F.broadcast(matched), "term", "left_semi")
                    .select("doc_id").distinct()
                    .withColumn("score", F.lit(1.0)))
        all_hits, obs = self._observe_total(all_hits)
        return all_hits.orderBy(F.asc("doc_id")).limit(size)

    def _term_len_col(self, field: str):
        """Stored term_len when the index has it (r3 — a stored column makes
        the fuzzy length band a PUSHED parquet predicate with row-group
        min/max skipping), else computed length (pre-r3 indexes)."""
        ts = self._term_stats[field]
        return F.col("term_len") if "term_len" in ts.columns \
            else F.length("term")

    def _fuzzy_expand_df(self, field: str, word: str) -> DataFrame:
        """Expansion plan for one word: term-dictionary scan with JVM-side
        levenshtein; top max_expansions by (boost desc, term asc) like
        Lucene's TopTermsRewrite queue. boost = 1 − ed/min(len(term),
        len(word))."""
        max_d = fuzzy_auto_distance(word)
        ts = self._term_stats[field]
        tlen = self._term_len_col(field)
        return (ts.filter(
                    (tlen >= len(word) - max_d)
                    & (tlen <= len(word) + max_d))
                  .withColumn("ed", F.levenshtein(F.col("term"), F.lit(word)))
                  .filter(F.col("ed") <= max_d)
                  .withColumn("boost", F.when(F.col("ed") == 0, F.lit(1.0)).otherwise(
                      F.lit(1.0) - F.col("ed").cast("double")
                      / F.least(F.length("term"), F.lit(len(word))).cast("double")))
                  .orderBy(F.desc("boost"), F.asc("term"))
                  .limit(self.qcfg.fuzzy_max_expansions)
                  .select("term", "boost", "df"))

    def _fuzzy_expand(self, field: str, word: str) -> List[Tuple[str, float]]:
        local = self._fuzzy_expand_local(field, [word])
        if local is not None:
            return local[0]
        cand = self._fuzzy_expand_df(field, word).collect()
        return [(r["term"], r["boost"], r["df"]) for r in cand]

    def _fuzzy_vocab_arrays(self, field: str):
        """Driver-side term dictionary as numpy arrays sorted by
        (term_len, term): (lens, terms, dfs, padded char-code matrix).
        Built once per field from the full-vocabulary hot-df cache; only
        valid when that cache holds the WHOLE dictionary (ceiling == 0)."""
        with self._fuzzy_vocab_lock:
            return self._fuzzy_vocab_arrays_locked(field,
                                                   self._fuzzy_vocab_cache)

    def _fuzzy_vocab_arrays_locked(self, field: str, cached: dict):
        if field not in cached:
            hot, _ = self._hot_dfs(field)
            if hot:
                # r8.2: numpy end to end — np.lexsort over a fixed-width
                # UTF-32 ("U") array gives the same (len, term) order as the
                # Python sort (numpy U-comparison is codepoint order, == str
                # comparison), and the U<width> buffer already IS the
                # null-padded char-code matrix, so the scatter-fill
                # disappears. Build time 1.1 s → ~0.5 s at 300k terms
                # (this was the whole first-fuzzy-query latency tail).
                tu = np.array(list(hot.keys()), dtype="U")
                dfs_u = np.fromiter(hot.values(), dtype=np.int64,
                                    count=len(hot))
                lens_u = np.char.str_len(tu)
                order = np.lexsort((tu, lens_u))
                terms = tu[order]
                dfs = dfs_u[order]
                lens = lens_u[order].astype(np.int64)
                width = int(lens[-1])
                # pad is 0 (U-dtype null padding) instead of the old -1:
                # tokens never contain NUL, and the DP answer only reads
                # columns ≤ term_len, so the pad value is inert either way
                mat = (np.ascontiguousarray(terms.astype(f"U{width}"))
                       .view(np.uint32).reshape(len(terms), width)
                       .astype(np.int32))
                # hashed char-count signature (26+ buckets): one edit
                # changes at most two bucket counts by 1 each, so
                # L1(sig_a, sig_b) ≤ 2d is NECESSARY for edit distance ≤ d —
                # a cheap vectorized prefilter that empties the
                # ~|vocab|-sized DP band a long rare word would otherwise
                # pay (measured ~0.8 s → ~0.1 s)
                rows_idx = np.repeat(np.arange(len(terms)), lens)
                sig = np.bincount(rows_idx * 32 + (mat[mat > 0] % 32),
                                  minlength=len(terms) * 32
                                  ).reshape(len(terms), 32).astype(np.int16)
            else:
                terms = np.zeros(0, dtype="U1")
                dfs = np.zeros(0, dtype=np.int64)
                lens = np.zeros(0, dtype=np.int64)
                mat = np.zeros((0, 0), dtype=np.int32)
                sig = np.zeros((0, 32), dtype=np.int16)
            cached[field] = (lens, terms, dfs, mat, sig)
        return cached[field]

    @staticmethod
    def _levenshtein_vec(word: str, mat: np.ndarray,
                         tlens: np.ndarray) -> np.ndarray:
        """Exact Levenshtein distance of ``word`` against every row of the
        padded char-code matrix (classic DP, vectorized across candidates —
        same distance Spark's ``levenshtein`` computes)."""
        n, width = mat.shape
        prev = np.tile(np.arange(width + 1, dtype=np.int32), (n, 1))
        for i, ch in enumerate(word, 1):
            wc = ord(ch)
            cur = np.empty_like(prev)
            cur[:, 0] = i
            for j in range(1, width + 1):
                sub = prev[:, j - 1] + (mat[:, j - 1] != wc)
                cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                                  cur[:, j - 1] + 1), sub)
            prev = cur
        return prev[np.arange(n), tlens]

    def _fuzzy_expand_local(self, field: str,
                            words: List[str]) -> Optional[Dict[int, list]]:
        """Driver-side expansion (r8): when the hot-df cache already holds
        the ENTIRE term dictionary (ceiling == 0 — always true once
        |vocab| ≤ _HOT_DF_K and the driver serving path is active), the
        banded scan + levenshtein + top-k runs in numpy on the driver with
        no Spark job at all — one job per fuzzy query instead of two.
        Result-identical to _fuzzy_expand_df: same band, same distance,
        same boost expression, same (boost desc, term asc) top-k cut.
        Returns None when the dictionary exceeds the cache (the 100-TB
        regime) or the driver path is disabled — callers then run the
        distributed expansion plan exactly as before."""
        if self.qcfg.driver_score_max_postings <= 0:
            return None
        hot, ceiling = self._hot_dfs(field)
        if ceiling != 0:
            return None
        lens, terms, dfs, mat, sig = self._fuzzy_vocab_arrays(field)
        out: Dict[int, list] = {}
        for wi, word in enumerate(words):
            max_d = fuzzy_auto_distance(word)
            lo = np.searchsorted(lens, len(word) - max_d, side="left")
            hi = np.searchsorted(lens, len(word) + max_d, side="right")
            if hi <= lo:
                out[wi] = []
                continue
            # char-signature prefilter (see _fuzzy_vocab_arrays): keeps only
            # candidates whose hashed char counts are within 2·max_d moves —
            # a superset of the ed ≤ max_d set, so the DP result is exact
            qsig = np.zeros(32, dtype=np.int16)
            np.add.at(qsig, np.array([ord(c) % 32 for c in word],
                                     dtype=np.int64), 1)
            l1 = np.abs(sig[lo:hi] - qsig).sum(axis=1)
            band_ix = lo + np.flatnonzero(l1 <= 2 * max_d)
            if not len(band_ix):
                out[wi] = []
                continue
            # DP width bounded by the band's longest candidate, not the
            # whole vocabulary's (a 255-char outlier token would otherwise
            # widen every row's DP table ~10×)
            wmax = int(lens[band_ix].max())
            ed = self._levenshtein_vec(word, mat[band_ix][:, :wmax],
                                       lens[band_ix])
            keep = np.flatnonzero(ed <= max_d)
            cand = []
            for k in keep.tolist():
                t = str(terms[band_ix[k]])  # np.str_ → plain str for callers
                e = int(ed[k])
                boost = (1.0 if e == 0
                         else 1.0 - float(e) / float(min(len(t), len(word))))
                cand.append((t, boost, int(dfs[band_ix[k]])))
            cand.sort(key=lambda c: (-c[1], c[0]))
            out[wi] = cand[:self.qcfg.fuzzy_max_expansions]
        return out

    def _fuzzy_expand_multi_df(self, field: str, words: List[str]) -> DataFrame:
        """Expansion plan for several words in ONE term-dictionary scan (join
        with a broadcast words frame + per-word rank window) instead of a
        Spark job per word."""
        from pyspark.sql import Window
        wrows = [(i, w, fuzzy_auto_distance(w), len(w)) for i, w in enumerate(words)]
        wdf = self.spark.createDataFrame(
            wrows, "widx int, word string, maxd int, wlen int")
        ts = self._term_stats[field]
        tlen = self._term_len_col(field)
        # literal envelope over ALL words' bands — join conditions can't push
        # into the scan, but this pre-filter can (pushed parquet predicate)
        lo = min(len(w) - d for _, w, d, _ in wrows)
        hi = max(len(w) + d for _, w, d, _ in wrows)
        cand = (ts.filter((tlen >= lo) & (tlen <= hi))
                .join(F.broadcast(wdf),
                      (tlen >= F.col("wlen") - F.col("maxd"))
                      & (tlen <= F.col("wlen") + F.col("maxd")))
                .withColumn("ed", F.levenshtein(F.col("term"), F.col("word")))
                .filter(F.col("ed") <= F.col("maxd"))
                .withColumn("boost", F.when(F.col("ed") == 0, F.lit(1.0)).otherwise(
                    F.lit(1.0) - F.col("ed").cast("double")
                    / F.least(F.length("term"), F.col("wlen")).cast("double"))))
        w = Window.partitionBy("widx").orderBy(F.desc("boost"), F.asc("term"))
        return (cand.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= self.qcfg.fuzzy_max_expansions)
                    .select("widx", "term", "boost", "df"))

    def _fuzzy_expand_multi(self, field: str, words: List[str]) -> Dict[int, list]:
        local = self._fuzzy_expand_local(field, words)
        if local is not None:
            return local
        top = self._fuzzy_expand_multi_df(field, words).collect()
        out: Dict[int, list] = {i: [] for i in range(len(words))}
        for r in top:
            out[r["widx"]].append((r["term"], r["boost"], r["df"]))
        return out

    def fuzzy_query(self, text: str, size: Optional[int] = None) -> DataFrame:
        """Q7 (search.py:282-349). Single word: term-level fuzzy (NO analysis of
        the query value, matching ES), expansions scored boost·BM25 and summed.
        Multi-word: multi_match fuzziness=AUTO fallback, operator or,
        minimum_should_match 60%."""
        size = size or self.qcfg.size_fuzzy
        if is_single_word(text):
            word = text.strip()
            if not word:
                return self._empty_hits()
            exp = self._fuzzy_expand("main", word)
            # hybrid driver path first (r2): expansion boosts are exactly the
            # idf multiplier the driver scorer applies — result-identical
            hits = self._score_clauses_driver(
                "main", [(0, t, boost) for t, boost, _ in exp], 1, size)
            if hits is not None:
                return hits
            clauses = [(0, t, boost * self.idf("main", df)) for t, boost, df in exp]
            return self._score_clauses("main", clauses, 1, size)
        words = analyze(text, self._analyzers["main"])
        if not words:
            return self._empty_hits()
        uniq = list(dict.fromkeys(words))
        pct = int(self.qcfg.fuzzy_multiword_minimum_should_match.rstrip("%"))
        required = max(1, int(math.floor(pct / 100.0 * len(uniq))))
        expansions = self._fuzzy_expand_multi("main", uniq)
        clause_mults: List[Clause] = []
        for ci in range(len(uniq)):
            for t, boost, df in expansions[ci]:
                clause_mults.append((ci, t, boost))
        hits = self._score_clauses_driver("main", clause_mults, required, size)
        if hits is not None:
            return hits
        dfs = {t: df for e in expansions.values() for t, _, df in e}
        clauses = [(ci, t, boost * self.idf("main", dfs[t]))
                   for ci, t, boost in clause_mults]
        return self._score_clauses("main", clauses, required, size)

    def bool_must_query(self, text: str, size: Optional[int] = None) -> DataFrame:
        """Q8 (search.py:352-418): whitespace-split words (NOT analyzed as a
        whole), each word a match clause; AND limits to bool_must_max_words and
        requires all; OR uses all words with optional minimum_should_match;
        single word is duplicated (search.py:358/387)."""
        size = size or self.qcfg.size_match
        op = self.qcfg.bool_must_operator.lower()
        if op == "and":
            words = text.split()[: self.qcfg.bool_must_max_words]
            if len(words) < 2:
                words = [text, text]
        else:
            words = text.split()
            if len(words) < 2:
                words = [text, text]
        clause_terms: List[List[str]] = []
        for w in words:
            clause_terms.append(analyze(w, self._analyzers["main"]))
        if op == "and" and any(not ts for ts in clause_terms):
            return self._empty_hits()  # zero-term must clause matches nothing
        clause_mults: List[Clause] = []
        for ci, ts in enumerate(clause_terms):
            mult: Dict[str, int] = {}
            for t in ts:
                mult[t] = mult.get(t, 0) + 1
            for t, k in mult.items():
                clause_mults.append((ci, t, float(k)))
        if op == "and":
            required = len(clause_terms)
        elif self.qcfg.bool_must_minimum_should_match is not None:
            # ES computes minimum_should_match over ALL should clauses —
            # zero-term clauses (stopword-only words) still count toward the
            # requirement and can never match (matches oracle.py bool OR path)
            pct = int(str(self.qcfg.bool_must_minimum_should_match).rstrip("%"))
            required = max(1, int(math.floor(pct / 100.0 * len(words))))
        else:
            required = 1
        hits = self._score_clauses_driver("main", clause_mults, required, size)
        if hits is not None:
            return hits
        if self.qcfg.fused_stats:
            return self._score_clauses_fused("main", clause_mults, required, size)
        dfs = self._df_lookup("main", [t for _, t, _ in clause_mults])
        clauses = [(ci, t, k * self.idf("main", dfs.get(t, 0)))
                   for ci, t, k in clause_mults]
        return self._score_clauses("main", clauses, required, size)

    def match_all(self, size: int = 1) -> DataFrame:
        """Q11 (merge.py:151-155): all docs, constant score 1.0 — the
        reference uses it as a searchability health probe."""
        # total = every indexed doc (known from stats; no counting job)
        self._set_total(count=self.stats["fields"]["main"]["n_docs"])
        return (self.docs.select("doc_id")
                .withColumn("score", F.lit(1.0))
                .orderBy("doc_id").limit(size))

    # --------------------------------------------- response assembly (Q12/13)

    def _response(self, hits_df: DataFrame, text: str, query_type: str,
                  fragment_size: int = 150, number_of_fragments: int = 3) -> dict:
        """Build the reference's per-query result row
        (search.py:525-555 + 594-614): total_hits capped at 10,000 (ES 7
        track_total_hits default, G3), max_score, top-5 snippets."""
        t0 = time.time()
        rows = hits_df.collect()
        total = len(rows)
        if total > 0 and self._last_total_count is not None:
            total = self._last_total_count
        elif total > 0 and self._last_total_obs is not None:
            # the observation rode the scoring aggregation and was filled by
            # the collect() above — the full match count costs no second job
            n = self._last_total_obs.get.get("n")
            total = int(n) if n is not None else total
        elif total > 0 and self._last_total_df is not None:
            # the result was limit()ed — the reference reports the full match
            # count, capped at 10,000 (ES 7 track_total_hits default, G3)
            total = self._last_total_df.count()
        top = rows[:100]
        # join back to the doc store for _source (J4) — broadcast the k-row side
        snippets = ""
        max_score = max((r["score"] for r in rows), default=0) or 0
        if top:
            ids = [r["doc_id"] for r in top]
            src = {d["doc_id"]: d for d in
                   self.docs.filter(F.col("doc_id").isin(ids)).collect()}
            text_col = self.stats.get("text_col", "content")
            hits = [{"doc_id": r["doc_id"], "score": r["score"],
                     "content": src[r["doc_id"]][text_col] if r["doc_id"] in src
                     else ""} for r in top]
            # term/wildcard queries hit text.exact and the reference
            # highlights with require_field_match: true (search.py:224-236,
            # 262-273) — so their query terms analyze with the EXACT-field
            # analyzer, not the stemming main analyzer (r2, VERDICT missing #5)
            hfield = ("exact" if query_type.startswith(("term_query",
                                                        "wildcard_query"))
                      and "exact" in self._analyzers else "main")
            qterms = analyze(text, self._analyzers[hfield])
            snippets = format_snippets(hits, qterms, self._analyzers[hfield],
                                       fragment_size, number_of_fragments)
        return {
            "timestamp": datetime.now().isoformat(),
            "segment_text": text,
            "query_type": query_type,
            "query_time_ms": round((time.time() - t0) * 1000, 2),
            "total_hits": min(total, self.qcfg.track_total_hits),
            "max_score": max_score,
            "timed_out": False,
            "error": None,
            "top_5_hits": snippets,
        }

    def run_all_queries(self, segment_text: str) -> List[dict]:
        """Mirror of search.py:557-634: run every enabled query type, collect
        result rows with timings."""
        q = self.qcfg
        methods = []
        if q.execute_match_query:
            for op in q.match_query_operator:
                name = "match_query" if (op == "or" and len(q.match_query_operator) == 1) \
                    else f"match_query_{op}"
                methods.append((name, lambda t, op=op: self.match_query(t, op)))
        if q.execute_match_phrase_query:
            for slop in q.match_phrase_slop:
                name = "match_phrase_query" if slop == 0 \
                    else f"match_phrase_query_slop_{slop}"
                methods.append((name, lambda t, s=slop: self.match_phrase_query(t, s)))
        if q.execute_term_query_exact:
            methods.append(("term_query_exact", self.term_query_exact))
        if q.execute_wildcard_query:
            methods.append(("wildcard_query", self.wildcard_query))
        if q.execute_fuzzy_query:
            methods.append(("fuzzy_query", self.fuzzy_query))
        if q.execute_bool_must_query:
            methods.append(("bool_must_query", self.bool_must_query))

        out = []
        for name, fn in methods:
            t0 = time.time()
            try:
                hits = fn(segment_text)
                frag, nfrag = (200, 5) if name in ("term_query_exact",
                                                   "wildcard_query") else (150, 3)
                row = self._response(hits, segment_text, name, frag, nfrag)
                row["query_time_ms"] = round((time.time() - t0) * 1000, 2)
            except Exception as e:  # mirror search.py:617-632 error rows
                row = {"timestamp": datetime.now().isoformat(),
                       "segment_text": segment_text, "query_type": name,
                       "query_time_ms": round((time.time() - t0) * 1000, 2),
                       "total_hits": 0, "max_score": 0, "timed_out": False,
                       "error": str(e), "top_5_hits": ""}
            out.append(row)
            self.results.append(row)
        return out

    def summary_stats(self) -> dict:
        """Per-query-type summary (G5, search.py:803-881)."""
        import statistics
        by_type: Dict[str, List[dict]] = {}
        for r in self.results:
            by_type.setdefault(r["query_type"], []).append(r)
        stats_by_type = {}
        for qt, rows in by_type.items():
            ok = [r for r in rows if r["error"] is None]
            times = [r["query_time_ms"] for r in ok] or [0]
            hits = [r["total_hits"] for r in ok] or [0]
            stats_by_type[qt] = {
                "total_queries": len(ok),
                "avg_query_time_ms": round(statistics.mean(times), 2),
                "median_query_time_ms": round(statistics.median(times), 2),
                "min_query_time_ms": round(min(times), 2),
                "max_query_time_ms": round(max(times), 2),
                "avg_hits": round(statistics.mean(hits), 2),
                "total_hits": sum(hits),
                "errors": len(rows) - len(ok),
            }
        return {
            "overview": {
                "total_queries": len(self.results),
                "successful_queries": len([r for r in self.results if r["error"] is None]),
                "failed_queries": len([r for r in self.results if r["error"] is not None]),
            },
            "query_type_stats": stats_by_type,
        }

    def close(self) -> None:
        """Release session-global resources this engine registered: its
        postings temp views and any cached/pinned DataFrames (``cache=True``
        postings/term_stats, the WAND packed-scan cache). A long-running
        serving session that cycles engines should close retired ones —
        temp views and pinned cache blocks otherwise accumulate for the
        application lifetime. NB Spark's cache manager is PLAN-keyed: another
        live engine over the same index directory shares the cache entries
        and falls back to disk reads (correctness unaffected) after this
        unpersists them."""
        for name in getattr(self, "_views", {}).values():
            self.spark.catalog.dropTempView(name)
        self._views = {}
        if self._cache:
            for df in list(self._postings.values()) + \
                    list(self._term_stats.values()):
                df.unpersist()
            for df, _ in getattr(self, "_packed_cache", {}).values():
                df.unpersist()
        self._packed_cache = {}

    def register_views(self, prefix: str = "alps") -> Dict[str, str]:
        """Expose the index as SQL views (``{prefix}_docs``,
        ``{prefix}_postings_<field>``, ``{prefix}_term_stats_<field>``) so
        ad-hoc analytics run through plain ``spark.sql`` — the declarative
        surface the engine itself plans against (term-sorted postings keep
        their min/max pruning under SQL too)."""
        names = {}
        self.docs.createOrReplaceTempView(f"{prefix}_docs")
        names["docs"] = f"{prefix}_docs"
        for field in self._postings:
            self._postings[field].createOrReplaceTempView(
                f"{prefix}_postings_{field}")
            self._term_stats[field].createOrReplaceTempView(
                f"{prefix}_term_stats_{field}")
            names[f"postings_{field}"] = f"{prefix}_postings_{field}"
            names[f"term_stats_{field}"] = f"{prefix}_term_stats_{field}"
        return names

    # ------------------------------------------------------------- invariant

    def materialize_hits(self, hits_df: DataFrame) -> DataFrame:
        """Join top-k hits back to the doc store (J4) — broadcast the k-row
        hit side; carries content + content_sha256 for the per-row invariant."""
        return self.docs.join(F.broadcast(hits_df), "doc_id", "inner")

    def verify_hits_sha256(self, hits_df: DataFrame, source_df: DataFrame,
                           id_cols: Sequence[str], text_col: str = "content") -> bool:
        """BASELINE.json invariant: sha256(content) of every hit equals the
        source table's (content hashed pre-truncation at index time)."""
        mat = self.materialize_hits(hits_df)
        src = source_df.select(
            *id_cols, F.sha2(F.col(text_col), 256).alias("_src_sha"))
        joined = mat.join(src, list(id_cols), "inner")
        bad = joined.filter(F.col("content_sha256") != F.col("_src_sha")).count()
        missing = mat.count() - joined.count()
        return bad == 0 and missing == 0
