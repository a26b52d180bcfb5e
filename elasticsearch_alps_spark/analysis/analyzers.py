"""The analyzer chain — pure-Python, shared verbatim by the golden oracle and the
vectorized Arrow UDFs so engine and oracle can never diverge on tokenization.

Reproduces the semantics the reference *selects* in its ES config
(``/root/reference/index_config/index_config_1.json:10-46``):
char_filter html_strip → standard tokenizer → lowercase → asciifolding →
english_stop → english_stemmer.

Known, documented approximations vs Lucene:
- ``standard`` tokenizer implements the UAX#29 word-boundary rules Lucene's
  StandardTokenizer applies to alphanumeric text (r3 — the r2 ``\\w+``
  approximation split ``3.14``/``it's``): base runs are ``\\w+`` (ExtendNumLet
  ``_`` joins ``snake_case``), a single MidLetter/MidNumLet ``'``/``.``
  between LETTERS joins (``it's``, ``example.com``), a single MidNum/
  MidNumLet ``.``/``,`` between DIGITS joins (``3.14``, ``1,000``), and
  Han/Hiragana characters are emitted as unigrams while Katakana runs stay
  whole (WB13), and word-boundary-transparent Format characters (WB4: word
  joiner, soft hyphen, ZWNJ — general category Cf minus the *breaking*
  U+200B) are stripped mid-word (r4). Still approximate at the long tail
  (combining marks across scripts, regional indicators) — the divergence
  inventory in tests/test_analysis.py::TestTokenizerDivergences is current
  (empty as of r4).
- ``html_strip`` is a regex approximation of Lucene's HTMLStripCharFilter
  (tags removed, script/style/comment content dropped, entities decoded).
"""

from __future__ import annotations

import html as _html
import os
import re
import unicodedata
from typing import List, Tuple

from elasticsearch_alps_spark.analysis.porter import porter_stem
from elasticsearch_alps_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from elasticsearch_alps_spark.config import AnalyzerConfig

# UAX#29 word boundaries as Lucene's StandardTokenizer applies them to
# alphanumerics (r3): \w+ base runs, plus a SINGLE MidLetter/MidNumLet
# separator between letters (WB6/7: ' ’ . : ·) or a SINGLE MidNum/MidNumLet
# separator between digits (WB11/12: . , ;). Double separators never join
# (x..y and std::vector split — only lone separators are word-internal).
# Han/Hiragana/Katakana have Word_Break ≠ ALetter, so MidLetter joining must
# NOT apply next to them (hypothesis-found: "A'速" is two tokens) — hence the
# extra negative lookarounds on the letter-side rule.
_NOJOIN_CJK = "぀-ヿ㐀-䶿一-鿿豈-﫿" \
    "\U00020000-\U0003ffff"
_TOKEN_RE = re.compile(
    r"\w+(?:(?:(?<=[^\W\d_])(?<![" + _NOJOIN_CJK + r"])['’.:·]"
    r"(?=[^\W\d_])(?![" + _NOJOIN_CJK + r"])|(?<=\d)[.,;](?=\d))\w+)*",
    re.UNICODE)
# Han + Hiragana have no UAX#29 joining rules → unigram tokens (what ES's
# `standard` tokenizer emits); Katakana runs stay whole (WB13) and are
# matched by \w, so they are simply NOT in this class. Supplementary Han
# (Extensions B–H + Compatibility Supplement, U+20000–U+3FFFF) included r4
# (ADVICE r3) — unassigned codepoints in that span don't match \w, so the
# over-wide range is harmless.
_CJK_UNIGRAM_RE = re.compile(
    "[\u3040-\u309f"   # Hiragana
    "\u3400-\u4dbf"    # CJK Unified Ideographs Extension A
    "\u4e00-\u9fff"    # CJK Unified Ideographs
    "\uf900-\ufaff"    # CJK Compatibility Ideographs
    "\U00020000-\U0003ffff]")  # Extensions B–H + Compat Supplement (r4)
# UAX#29 WB4: Format (and Extend) characters are ignored for word-boundary
# decisions, so a word joiner / soft hyphen / ZWNJ inside a word must not
# split it — Lucene emits "ab" for "a\u2060b"; we strip them before
# tokenizing (r4, closes the last pinned Lucene divergence). The class is
# general-category Cf *minus* U+200B ZERO WIDTH SPACE, whose UAX#29
# Word_Break class is Other (it BREAKS: ["a","b"] for "a\u200bb") — a
# naive category-Cf strip would wrongly join across it. Combining marks
# (WB-class Extend, category Mn/Mc) are NOT stripped: they stay inside the
# token, as in Lucene, and asciifolding folds them later.
_FORMAT_STRIP_RE = re.compile(
    "[\u00ad"                    # soft hyphen
    "\u0600-\u0605\u061c\u06dd\u070f\u0890\u0891\u08e2"  # Arabic signs
    "\u180e"                     # Mongolian vowel separator
    "\u200c-\u200f"             # ZWNJ ZWJ LRM RLM (NOT U+200B: it breaks)
    "\u202a-\u202e"             # bidi embedding controls
    "\u2060-\u2064\u2066-\u206f"  # word joiner, invisible ops, isolates
    "\ufeff\ufff9-\ufffb"      # ZWNBSP/BOM, interlinear annotation
    "\U000110bd\U000110cd\U00013430-\U0001343f"   # Kaithi/Egyptian fmt
    "\U0001bca0-\U0001bca3\U0001d173-\U0001d17a"  # shorthand/music fmt
    "\U000e0001\U000e0020-\U000e007f]")            # tag characters
_SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9_]+")
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"</?[a-zA-Z!][^>]*>")
# camelCase / digit boundaries for code-aware sub-token splitting
_CODE_BOUNDARY_RE = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[0-9])(?=[A-Za-z])|(?<=[A-Za-z])(?=[0-9])|_+"
)


def html_strip(text: str) -> str:
    """Approximation of Lucene's html_strip char filter
    (``index_config_1.json:14-16``): drop script/style/comment content, remove
    tags, decode entities. Replaced regions become a space so token boundaries
    survive."""
    if "<" not in text and "&" not in text:
        return text
    text = _SCRIPT_RE.sub(" ", text)
    text = _COMMENT_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    if "&" in text:
        text = _html.unescape(text)
    return text


def ascii_fold(text: str) -> str:
    """Lucene asciifolding (``index_config_1.json:20``): fold accented Latin to
    ASCII; characters with no ASCII decomposition are kept unchanged (unlike a
    bare NFKD+ascii-ignore, which would delete CJK)."""
    if text.isascii():
        return text
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(folded if folded.isascii() and folded else ch)
    return "".join(out)


def _split_long(tok: str, max_len: int) -> List[str]:
    if len(tok) <= max_len:
        return [tok]
    return [tok[i:i + max_len] for i in range(0, len(tok), max_len)]


def _split_cjk(tok: str) -> List[str]:
    """Emit Han/Hiragana chars as unigrams, keep other runs whole — what
    ES's `standard` tokenizer does (no UAX#29 joining rules for them)."""
    out: List[str] = []
    buf: List[str] = []
    for ch in tok:
        if _CJK_UNIGRAM_RE.match(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def tokenize_standard(text: str, max_token_length: int = 255) -> List[str]:
    """UAX#29 word segmentation as Lucene's standard tokenizer applies it
    (``index_config_1.json:17``; see module docstring for the covered rules).
    Over-long tokens split at max_token_length."""
    # ASCII fast path: one isascii() (O(n) in C) covers the dominant
    # source-code case — no Cf char and no CJK char is ASCII
    if text.isascii():
        has_cjk = False
    else:
        # WB4: Format chars are word-boundary-transparent → strip them so
        # "a⁠b" tokenizes as "ab" like Lucene (see _FORMAT_STRIP_RE)
        text = _FORMAT_STRIP_RE.sub("", text)
        has_cjk = _CJK_UNIGRAM_RE.search(text)
    toks: List[str] = []
    for m in _TOKEN_RE.finditer(text):
        pieces = _split_cjk(m.group()) if has_cjk else (m.group(),)
        for p in pieces:
            toks.extend(_split_long(p, max_token_length))
    return toks


def code_subtokens(token: str) -> List[str]:
    """Code-aware sub-tokens: split snake_case / camelCase / digit boundaries.
    north_star extension for the source-code payload (not in the reference)."""
    parts = [p for p in _CODE_BOUNDARY_RE.split(token) if p]
    return parts


def analyze_positions(text: str, cfg: AnalyzerConfig) -> List[Tuple[str, int]]:
    """Full chain → [(term, position)], position gaps preserved across removed
    stopwords (Lucene stop filter keeps position increments)."""
    if text is None:
        return []
    if cfg.tokenizer == "simple":
        toks = _SIMPLE_TOKEN_RE.findall(text.lower())
        return list(zip(toks, range(len(toks))))
    if cfg.tokenizer == "keyword":
        # A10: keyword field with ignore_above — whole value as one token iff
        # length ≤ max_token_length (index_config_1.json:63-66)
        if len(text) > cfg.max_token_length:
            return []
        t = text.lower() if cfg.lowercase else text
        return [(t, 0)] if t else []
    if cfg.tokenizer == "url_email":
        # A9: url_analyzer — uax_url_email tokenizer + lowercase +
        # pattern_replace [/\-_.] → ' '
        # (index_config_with_url_english.json:36-58). DOCUMENTED DIVERGENCE
        # (ADVICE r6 #3, COVERAGE.md §3.4): ES's url_path_tokenizer is a
        # pattern_replace token FILTER over [/\-_.] only — it substitutes
        # characters inside the single uax_url_email token without
        # re-splitting it; this implementation SPLITS into separate tokens
        # (so each path piece is independently matchable, which is what the
        # match query needs) and additionally breaks on the URL structural
        # delimiters [:?#=&]. The ft_url_match gate's DuckDB oracle mirrors
        # this same approximation — it validates the implementation's
        # self-consistency, not ES tokenization parity.
        toks: List[Tuple[str, int]] = []
        pos = -1
        for unit in text.split():
            pos += 1
            u = unit.lower() if cfg.lowercase else unit
            for piece in re.split(r"[/\-_.:?#=&]+", u):
                if piece:
                    toks.append((piece, pos))
        return toks
    if cfg.html_strip:
        text = html_strip(text)
    raw = tokenize_standard(text, cfg.max_token_length)
    # code-aware sub-tokens split on the ORIGINAL casing inside _postprocess
    # (camelCase boundaries vanish after lowercasing); stopword removal
    # leaves position gaps (Lucene stop filter keeps position increments)
    return _postprocess(raw, cfg)


def analyze(text: str, cfg: AnalyzerConfig) -> List[str]:
    """Full chain → terms only (query-side analysis)."""
    return [t for t, _ in analyze_positions(text, cfg)]


# Per-config memo of the token-filter chain: raw token → tuple of emitted
# terms. Token frequencies are Zipfian, so the chain (case fold, asciifold,
# stop, stem, code subtokens) runs once per DISTINCT token instead of once
# per occurrence (r3 — profiled 2× on the analyzer stage, the build's only
# Python-bound cost). Deterministic: output depends only on (token, cfg).
# Size-capped per config; UDF workers are separate processes, each with its
# own memo (driver-side concurrent readers are GIL-safe — worst case is a
# benign recompute).
_TOKEN_FILTER_MEMO: dict = {}
_TOKEN_FILTER_MEMO_MAX = 1 << 18
# A/B switch for benchmarking the memo's end-to-end effect
# (tools/analyzer_memo_bench.py, r4): ALPS_TOKEN_MEMO=0 disables. Read at
# import time in each UDF worker process (local-mode workers inherit the
# driver environment).
_TOKEN_FILTER_MEMO_ENABLED = os.environ.get("ALPS_TOKEN_MEMO", "1") != "0"


def _filter_token(tok: str, cfg: AnalyzerConfig) -> Tuple[str, ...]:
    emitted_raw = [tok]
    if cfg.code_split:
        subs = code_subtokens(tok)
        if len(subs) > 1:
            emitted_raw.extend(subs)
    seen = set()
    out: List[str] = []
    for rt in emitted_raw:
        t = rt
        if cfg.lowercase:
            t = t.lower()
        if cfg.asciifolding and not t.isascii():
            t = ascii_fold(t)
        if cfg.english_stop and t in ENGLISH_STOP_WORDS:
            continue
        if cfg.english_stemmer:
            t = porter_stem(t)
        if t and t not in seen:
            seen.add(t)
            out.append(t)
    return tuple(out)


def _postprocess(raw: List[str], cfg: AnalyzerConfig) -> List[Tuple[str, int]]:
    """Token-filter chain over already-tokenized input (shared-preprocessing
    path of analyze_positions_multi)."""
    if not _TOKEN_FILTER_MEMO_ENABLED:
        out0: List[Tuple[str, int]] = []
        for pos0, tok in enumerate(raw):
            for t in _filter_token(tok, cfg):
                out0.append((t, pos0))
        return out0
    memo = _TOKEN_FILTER_MEMO.get(cfg)
    if memo is None:
        memo = _TOKEN_FILTER_MEMO[cfg] = {}
    out: List[Tuple[str, int]] = []
    pos = -1
    for tok in raw:
        pos += 1
        terms = memo.get(tok)
        if terms is None:
            if len(memo) >= _TOKEN_FILTER_MEMO_MAX:
                memo.clear()  # vocabulary overflow: reset, keep O(1) memory
            terms = memo[tok] = _filter_token(tok, cfg)
        for t in terms:
            out.append((t, pos))
    return out


def analyze_positions_multi(text: str, cfgs: List[AnalyzerConfig]
                            ) -> List[List[Tuple[str, int]]]:
    """Run several analyzer chains over one text, sharing the char-filter +
    tokenizer work when every config agrees on it (the index build runs the
    main and exact chains together — reference indexes `text` and
    `text.exact` from the same input, index_config_1.json:56-72)."""
    if text is None:
        return [[] for _ in cfgs]
    shareable = (len({(c.html_strip, c.tokenizer, c.max_token_length)
                      for c in cfgs}) == 1 and cfgs[0].tokenizer == "standard")
    if not shareable:
        return [analyze_positions(text, c) for c in cfgs]
    t = html_strip(text) if cfgs[0].html_strip else text
    raw = tokenize_standard(t, cfgs[0].max_token_length)
    return [_postprocess(raw, c) for c in cfgs]


def is_single_word(text: str) -> bool:
    """The reference's single-word gate for term/wildcard/fuzzy queries
    (``scripts/search/search.py:95-101``): ``\\b\\w+\\b`` count == 1."""
    return len(re.findall(r"\b\w+\b", text.strip())) == 1


def fuzzy_auto_distance(word: str) -> int:
    """ES ``fuzziness: AUTO`` (``search.py:331``): 0 for len<3, 1 for 3-5, 2 for 6+."""
    n = len(word)
    if n < 3:
        return 0
    if n <= 5:
        return 1
    return 2
