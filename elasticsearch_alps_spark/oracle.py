"""Golden oracle: a pure-Python, Lucene-faithful BM25 engine over a small corpus.

Stands in for "the reference Elasticsearch results" (no ES in this sandbox —
repo:FIXTURES.md §4). Shares the *same* analyzer module as the Spark engine, so
tokenization cannot diverge; everything else (postings, stats, BM25, the six
query types of ``/root/reference/scripts/search/search.py:141-418``) is
implemented independently and naively, then the distributed engine is asserted
rank-identical with scores equal to ~1e-9 relative.

Documented approximations vs real Lucene (mirrored exactly by the engine, and
flagged in SURVEY.md §7.2):
- sloppy-phrase matching/freq (Q4): anchor-based, freq += 1/(1+distance)
- fuzzy scoring (Q7): per-expanded-term boost = 1 - ed/min(len), score summed
  disjunctively (Lucene uses a blended rewrite)
- wildcard (Q6): constant score 1.0 (ES default constant-score rewrite)
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from elasticsearch_alps_spark.analysis.analyzers import (
    analyze, analyze_positions, fuzzy_auto_distance, is_single_word,
)
from elasticsearch_alps_spark.analysis.smallfloat import quantize_length
from elasticsearch_alps_spark.config import IndexConfig

Hit = Tuple[int, float]  # (doc_id, score)


def levenshtein(a: str, b: str, cap: int = 3) -> int:
    """Plain DP edit distance with early-exit cap."""
    if a == b:
        return 0
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


class _Field:
    """Postings + stats for one analyzed field (text / text.exact)."""

    def __init__(self):
        self.postings: Dict[str, Dict[int, List[int]]] = defaultdict(dict)
        self.doc_len: Dict[int, int] = {}
        self.cf_total = 0

    def add(self, doc_id: int, stream: List[Tuple[str, int]]):
        self.doc_len[doc_id] = len(stream)
        self.cf_total += len(stream)
        for term, pos in stream:
            self.postings[term].setdefault(doc_id, []).append(pos)

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return self.cf_total / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))


class OracleIndex:
    def __init__(self, docs: List[Tuple[int, str]], cfg: Optional[IndexConfig] = None):
        self.cfg = cfg or IndexConfig()
        self.main = _Field()
        self.exact = _Field() if self.cfg.exact_analyzer else None
        for doc_id, text in docs:
            if text is None or not text.strip():
                continue  # P1 filter (index.py:395-396)
            if len(text) > self.cfg.truncate_chars:  # P4 (index.py:421-422)
                text = text[: self.cfg.truncate_chars] + "... [TRUNCATED]"
            self.main.add(doc_id, analyze_positions(text, self.cfg.analyzer))
            if self.exact is not None:
                self.exact.add(doc_id, analyze_positions(text, self.cfg.exact_analyzer))

    # ---- BM25 (Lucene 8.11: no (k1+1) factor; SmallFloat-quantized dl) ----

    def _dl(self, field: _Field, doc_id: int) -> float:
        dl = field.doc_len[doc_id]
        return float(quantize_length(dl)) if self.cfg.quantize_norms else float(dl)

    def idf(self, field: _Field, term: str) -> float:
        df = field.df(term)
        n = field.n_docs
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _tf_norm(self, field: _Field, doc_id: int, freq: float) -> float:
        k1, b = self.cfg.bm25.k1, self.cfg.bm25.b
        dl = self._dl(field, doc_id)
        return freq / (freq + k1 * (1.0 - b + b * dl / field.avgdl))

    def bm25(self, field: _Field, term: str, doc_id: int, freq: float) -> float:
        return self.idf(field, term) * self._tf_norm(field, doc_id, freq)

    # ---- query types (search.py:141-418) ----

    @staticmethod
    def _topk(scores: Dict[int, float], size: int) -> List[Hit]:
        # ES orders by _score desc then docID asc (Q10)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:size]

    def _match_scores(self, terms: List[str], operator: str = "or",
                      minimum_should_match: Optional[int] = None) -> Dict[int, float]:
        scores: Dict[int, float] = defaultdict(float)
        nmatch: Dict[int, int] = defaultdict(int)
        # a repeated query term is a repeated BooleanQuery clause → its BM25
        # contribution is multiplied by its multiplicity
        mult: Dict[str, int] = defaultdict(int)
        for t in terms:
            mult[t] += 1
        for term, k in mult.items():
            for doc_id, positions in self.main.postings.get(term, {}).items():
                scores[doc_id] += k * self.bm25(self.main, term, doc_id, float(len(positions)))
                nmatch[doc_id] += 1
        n_required = len(mult) if operator == "and" else (minimum_should_match or 1)
        return {d: s for d, s in scores.items() if nmatch[d] >= min(n_required, len(mult))}

    def match_query(self, text: str, operator: str = "or", size: int = 50) -> List[Hit]:
        terms = analyze(text, self.cfg.analyzer)
        if not terms:
            return []
        return self._topk(self._match_scores(terms, operator), size)

    def match_query_msm(self, text: str, pct: int, size: int = 50) -> List[Hit]:
        """minimum_should_match as a percentage — ES rounds DOWN for positive
        percentages, clamped to ≥1."""
        terms = analyze(text, self.cfg.analyzer)
        if not terms:
            return []
        uniq = len(set(terms))
        required = max(1, int(math.floor(pct / 100.0 * uniq)))
        return self._topk(self._match_scores(terms, "or", required), size)

    def match_phrase_query(self, text: str, slop: int = 0, size: int = 50) -> List[Hit]:
        # Lucene phrase queries keep the *analyzed positions* of the query —
        # a removed stopword leaves a gap the document must reproduce
        # ("import numpy as np" expects np at +3, not +2)
        tp = analyze_positions(text, self.cfg.analyzer)
        if not tp:
            return []
        terms = [t for t, _ in tp]
        offsets = [p - tp[0][1] for _, p in tp]
        if len(terms) == 1:
            return self.match_query(text, "or", size)
        doc_sets = [set(self.main.postings.get(t, {})) for t in set(terms)]
        cands = set.intersection(*doc_sets) if doc_sets else set()
        scores: Dict[int, float] = {}
        # Lucene PhraseWeight sums idf per term OCCURRENCE (duplicates count)
        idf_sum = sum(self.idf(self.main, t) for t in terms)
        for doc_id in cands:
            pos = {t: self.main.postings[t][doc_id] for t in set(terms)}
            freq = phrase_freq(terms, pos, slop, offsets)
            if freq > 0:
                scores[doc_id] = idf_sum * self._tf_norm(self.main, doc_id, freq)
        return self._topk(scores, size)

    def term_query_exact(self, text: str, size: int = 100) -> List[Hit]:
        # single-word gate + manual lowercase only (search.py:210-224 quirk:
        # no asciifolding applied to the query side)
        if not is_single_word(text) or self.exact is None:
            return []
        term = text.strip().lower()
        scores = {
            doc_id: self.bm25(self.exact, term, doc_id, float(len(p)))
            for doc_id, p in self.exact.postings.get(term, {}).items()
        }
        return self._topk(scores, size)

    def wildcard_query(self, text: str, size: int = 100) -> List[Hit]:
        if not is_single_word(text) or self.exact is None:
            return []
        needle = text.strip().lower()
        docs = set()
        for term, posting in self.exact.postings.items():
            if needle in term:  # *word* (search.py:258)
                docs.update(posting.keys())
        # constant-score rewrite → 1.0, tie-broken by docID
        return sorted(((d, 1.0) for d in docs), key=lambda kv: kv[0])[:size]

    def _fuzzy_expand(self, word: str, field: _Field, max_expansions: int = 50):
        """[(term, boost)] for terms within AUTO edit distance; top-N by
        (boost desc, term asc) like Lucene's TopTermsRewrite priority queue."""
        max_d = fuzzy_auto_distance(word)
        out = []
        for term in field.postings:
            if abs(len(term) - len(word)) > max_d:
                continue
            d = levenshtein(term, word, cap=max_d)
            if d <= max_d:
                boost = 1.0 if d == 0 else 1.0 - d / min(len(term), len(word))
                out.append((term, boost))
        out.sort(key=lambda tb: (-tb[1], tb[0]))
        return out[:max_expansions]

    def fuzzy_query(self, text: str, size: int = 50,
                    multiword_msm_pct: int = 60) -> List[Hit]:
        if is_single_word(text):
            # ES `fuzzy` is a term-level query: the raw value is matched against
            # indexed terms with NO analysis (search.py:326-335 passes text as-is
            # — an uppercase query will therefore miss lowercase index terms).
            word = text.strip()
            if not word:
                return []
            scores: Dict[int, float] = defaultdict(float)
            for term, boost in self._fuzzy_expand(word, self.main):
                for doc_id, positions in self.main.postings[term].items():
                    scores[doc_id] += boost * self.bm25(
                        self.main, term, doc_id, float(len(positions)))
            return self._topk(scores, size)
        # multi-word fallback: multi_match fuzziness AUTO, operator or,
        # max_expansions 50, minimum_should_match 60% (search.py:295-323)
        words = analyze(text, self.cfg.analyzer)
        if not words:
            return []
        uniq = list(dict.fromkeys(words))
        required = max(1, int(math.floor(multiword_msm_pct / 100.0 * len(uniq))))
        scores = defaultdict(float)
        nmatch: Dict[int, int] = defaultdict(int)
        for w in uniq:
            clause: Dict[int, float] = defaultdict(float)
            for term, boost in self._fuzzy_expand(w, self.main):
                for doc_id, positions in self.main.postings[term].items():
                    clause[doc_id] += boost * self.bm25(
                        self.main, term, doc_id, float(len(positions)))
            for doc_id, s in clause.items():
                scores[doc_id] += s
                nmatch[doc_id] += 1
        return self._topk({d: s for d, s in scores.items() if nmatch[d] >= required}, size)

    def bool_must_query(self, text: str, operator: str = "and",
                        max_words: int = 3,
                        minimum_should_match: Optional[str] = None,
                        size: int = 50) -> List[Hit]:
        # whitespace split, NOT analyzed, per search.py:356/385
        if operator == "and":
            words = text.split()[:max_words]
            if len(words) < 2:
                words = [text, text]  # search.py:358 duplicates single word
            clause_scores = []
            for w in words:
                terms = analyze(w, self.cfg.analyzer)
                if not terms:
                    return []  # zero-term must clause → no hits
                clause_scores.append(self._match_scores(terms, "or"))
            docs = set(clause_scores[0])
            for cs in clause_scores[1:]:
                docs &= set(cs)
            scores = {d: sum(cs[d] for cs in clause_scores) for d in docs}
            return self._topk(scores, size)
        words = text.split()
        if len(words) < 2:
            words = [text, text]
        required = 1
        if minimum_should_match is not None:
            pct = int(str(minimum_should_match).rstrip("%"))
            required = max(1, int(math.floor(pct / 100.0 * len(words))))
        scores = defaultdict(float)
        nmatch: Dict[int, int] = defaultdict(int)
        for w in words:
            terms = analyze(w, self.cfg.analyzer)
            if not terms:
                continue
            cs = self._match_scores(terms, "or")
            for d, s in cs.items():
                scores[d] += s
                nmatch[d] += 1
        return self._topk({d: s for d, s in scores.items() if nmatch[d] >= required}, size)


def phrase_freq(terms: List[str], positions: Dict[str, List[int]], slop: int,
                offsets: Optional[List[int]] = None) -> float:
    """Phrase frequency. ``offsets`` are the analyzed query positions relative
    to the first term (stopword gaps preserved — Lucene semantics); defaults
    to 0..n-1. slop=0: exact occurrences (term i at anchor + offset_i).
    slop>0: anchor-based approximation — every later term must appear within
    ±slop of its expected position with total displacement ≤ slop; freq
    contribution 1/(1+distance) (Lucene SloppyPhraseScorer's sloppyFreq).

    Shared by oracle and engine (imported by the phrase-scoring UDF) so the
    approximation cannot diverge between them."""
    if offsets is None:
        offsets = list(range(len(terms)))
    first = positions.get(terms[0], [])
    if slop == 0:
        pos_sets = [set(positions.get(t, [])) for t in terms]
        freq = 0
        for p in first:
            if all((p + offsets[i]) in pos_sets[i] for i in range(1, len(terms))):
                freq += 1
        return float(freq)
    freq = 0.0
    pos_lists = [sorted(positions.get(t, [])) for t in terms]
    for p in first:
        total = 0
        ok = True
        for i in range(1, len(terms)):
            want = p + offsets[i]
            best = None
            for q in pos_lists[i]:
                d = abs(q - want)
                if best is None or d < best:
                    best = d
            if best is None or best > slop or total + best > slop:
                ok = False
                break
            total += best
        if ok:
            freq += 1.0 / (1.0 + total)
    return freq
