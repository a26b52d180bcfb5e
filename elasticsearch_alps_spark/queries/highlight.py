"""Highlighting / snippet extraction (Q12/Q13 of SURVEY.md §2.7).

Reproduces what the reference consumes from ES highlights
(``/root/reference/scripts/search/search.py:158-169`` request,
``search.py:420-523`` consumption): best fragments of ~``fragment_size`` chars,
up to ``number_of_fragments`` per hit, matched terms wrapped in
``<MATCH>``/``</MATCH>``. Runs driver-side over the ≤100 top-k hit texts only
(never distributed — matches the reference's per-query hit post-processing).
"""

from __future__ import annotations

from typing import List

from elasticsearch_alps_spark.analysis.analyzers import (
    _CJK_UNIGRAM_RE, _FORMAT_STRIP_RE, _TOKEN_RE, _split_cjk, analyze,
)
from elasticsearch_alps_spark.analysis.porter import porter_stem
from elasticsearch_alps_spark.config import AnalyzerConfig


def _is_match(tok: str, qset: set, cfg: AnalyzerConfig) -> bool:
    norm = tok.lower()
    candidates = {norm}
    if cfg.english_stemmer:
        candidates.add(porter_stem(norm))
    candidates.update(analyze(tok, cfg))
    return bool(candidates & qset)


def highlight(text: str, query_terms: List[str], cfg: AnalyzerConfig,
              fragment_size: int = 150, number_of_fragments: int = 3) -> List[str]:
    """Return up to N highlighted fragments for one document."""
    qset = set(query_terms)
    # locate matching word occurrences by running each surface token through
    # the same normalization the index terms went through; the surface scan
    # uses the SAME UAX#29 token regex as the index (r3 — a bare \w+ scan
    # could never match joined terms like `example.com` or `it's`), and CJK
    # runs are split into the same unigram pieces the index emits so a CJK
    # query term wraps only the matching character, not the whole run
    # (ADVICE r3, r4). The index strips UAX#29 WB4 Format chars BEFORE
    # tokenizing ("a⁠b" indexes as "ab"), so the surface scan must too
    # (ADVICE r4) — scan the stripped text and map span offsets back to the
    # original through an offset table, so the wrapped surface word keeps
    # its invisible joiners intact in the rendered fragment.
    if _FORMAT_STRIP_RE.search(text):
        parts, offmap, last = [], [], 0
        for fm in _FORMAT_STRIP_RE.finditer(text):
            parts.append(text[last:fm.start()])
            offmap.extend(range(last, fm.start()))
            last = fm.end()
        parts.append(text[last:])
        offmap.extend(range(last, len(text)))
        offmap.append(len(text))  # end sentinel for spans ending at EOS
        scan = "".join(parts)
    else:
        scan, offmap = text, None

    def _orig(s: int, e: int):
        return (s, e) if offmap is None else (offmap[s], offmap[e - 1] + 1)

    spans = []
    for m in _TOKEN_RE.finditer(scan):
        tok = m.group()
        if not tok.isascii() and _CJK_UNIGRAM_RE.search(tok):
            off = m.start()
            for piece in _split_cjk(tok):
                if _is_match(piece, qset, cfg):
                    spans.append(_orig(off, off + len(piece)))
                off += len(piece)
        elif _is_match(tok, qset, cfg):
            spans.append(_orig(m.start(), m.end()))
        if len(spans) >= 64:
            break
    if not spans:
        return []
    # Build ALL non-overlapping candidate windows left-to-right, then SELECT
    # the best-scoring number_of_fragments and emit them in text order —
    # mirroring ES's unified highlighter, which picks the top-scoring
    # passages but (without order:"score", which the reference never sets,
    # search.py:158-169) returns them in document order. Score = (distinct
    # matched query terms, total matches), ties broken by position, so
    # uniform-density texts degrade to the first-N behavior.
    candidates = []  # (n_distinct, n_matches, start, rendered)
    used_until = -1
    for start, end in spans:
        if start <= used_until:
            continue
        half = max(0, (fragment_size - (end - start)) // 2)
        lo = max(0, start - half)
        hi = min(len(text), end + half)
        # wrap every matching span inside this window
        out = []
        cursor = lo
        n_matches = 0
        distinct = set()
        for s, e in spans:
            if s >= lo and e <= hi:
                out.append(text[cursor:s])
                out.append("<MATCH>" + text[s:e] + "</MATCH>")
                cursor = e
                n_matches += 1
                distinct.add(text[s:e].lower())
        out.append(text[cursor:hi])
        candidates.append((len(distinct), n_matches, start, "".join(out)))
        used_until = hi
    best = sorted(candidates,
                  key=lambda c: (-c[0], -c[1], c[2]))[:number_of_fragments]
    return [c[3] for c in sorted(best, key=lambda c: c[2])]


def format_snippets(hits: List[dict], query_terms: List[str], cfg: AnalyzerConfig,
                    fragment_size: int, number_of_fragments: int,
                    max_hits: int = 5) -> str:
    """Format the top-5 snippet block exactly like the reference's
    ``extract_hit_snippets_fineweb`` (``search.py:455-488``): one line per hit
    with score, ids and ``|``-joined highlighted fragments."""
    lines = []
    for i, hit in enumerate(hits[:max_hits]):
        frags = highlight(hit.get("content", "") or "", query_terms, cfg,
                          fragment_size, number_of_fragments)
        if frags:
            snippet = " | ".join(frags)
            src = "HIGHLIGHTED"
        else:
            t = hit.get("content", "") or ""
            snippet = t[:300] + ("..." if len(t) > 300 else "")
            src = "SOURCE_TEXT"
        snippet = " ".join(snippet.split())
        lines.append(
            f"Hit {i + 1} (Score: {hit['score']:.3f}, "
            f"Document_ID: {hit['doc_id']}, Type: {src}): {snippet}")
    return "\n".join(lines)
