"""Unit goldens for the analyzer chain (SURVEY.md §2.3 A1-A11) — no Spark."""

import pytest

from elasticsearch_alps_spark.analysis.analyzers import (
    analyze, analyze_positions, ascii_fold, code_subtokens, fuzzy_auto_distance,
    html_strip, is_single_word, tokenize_standard,
)
from elasticsearch_alps_spark.analysis.porter import porter_stem
from elasticsearch_alps_spark.analysis.smallfloat import (
    byte4_to_int, int_to_byte4, quantize_length,
)
from elasticsearch_alps_spark.config import (
    EXACT_MATCH_ANALYZER, CODE_CONTENT_ANALYZER, SIMPLE_ANALYZER,
    WEB_CONTENT_ANALYZER,
)


class TestHtmlStrip:
    def test_tags_removed(self):
        assert "bold" in html_strip("<b>bold</b>")
        assert "<b>" not in html_strip("<b>bold</b>")

    def test_script_content_dropped(self):
        out = html_strip("before <script>var x = evil;</script> after")
        assert "evil" not in out and "before" in out and "after" in out

    def test_entities_decoded(self):
        assert "&" in html_strip("a &amp; b")
        assert "amp" not in html_strip("a &amp; b")

    def test_plain_text_unchanged(self):
        assert html_strip("no markup here") == "no markup here"


class TestAsciiFold:
    def test_accents(self):
        assert ascii_fold("café") == "cafe"
        assert ascii_fold("naïve résumé") == "naive resume"

    def test_ascii_passthrough(self):
        assert ascii_fold("plain") == "plain"

    def test_unfoldable_kept(self):
        # CJK has no ASCII decomposition — must NOT be deleted
        assert ascii_fold("中文") == "中文"


class TestTokenizer:
    def test_snake_case_one_token(self):
        # UAX#29 ExtendNumLet: '_' joins — Lucene standard tokenizer behavior
        assert tokenize_standard("snake_case_token") == ["snake_case_token"]

    def test_punctuation_splits(self):
        # r3 UAX#29: lone '.' between letters joins (MidNumLet); ','/';'
        # split between letters (MidNum applies to digits only)
        assert tokenize_standard("a.b,c;d") == ["a.b", "c", "d"]
        assert tokenize_standard("a!b?c d") == ["a", "b", "c", "d"]

    def test_max_token_length_splits(self):
        toks = tokenize_standard("x" * 600)
        assert [len(t) for t in toks] == [255, 255, 90]


class TestTokenizerDivergences:
    """UAX#29 conformance goldens vs Lucene's StandardTokenizer (VERDICT r2
    missing #3). r3 upgraded the r2 \\w+ approximation with the MidLetter/
    MidNum/MidNumLet joining rules and Han/Hiragana unigrams, turning the
    formerly-pinned divergences (3.14, it's, 1,000, v1.2.3, example.com,
    CJK) into AGREEMENTS. Each case asserts OUR behavior — a regression or a
    silent semantic change both fail here; `lucene` records what the
    reference's ES 7.17 would emit (not executed)."""

    # (input, ours, lucene)
    CASES = [
        # MidNum/MidNumLet between digits: decimal numbers stay whole
        ("pi is 3.14", ["pi", "is", "3.14"], ["pi", "is", "3.14"]),
        ("1,000 rows", ["1,000", "rows"], ["1,000", "rows"]),
        ("v1.2.3", ["v1.2.3"], ["v1.2.3"]),
        # MidLetter/MidNumLet between letters: apostrophes, host dots, colon
        ("it's fine", ["it's", "fine"], ["it's", "fine"]),
        ("O'Neil said", ["O'Neil", "said"], ["O'Neil", "said"]),
        ("user@example.com", ["user", "example.com"],
         ["user", "example.com"]),  # '@' splits; host dots join (MidNumLet)
        ("key:value", ["key:value"], ["key:value"]),  # ':' is MidLetter
        # DOUBLE separators never join (only lone ones are word-internal)
        ("std::vector<int>", ["std", "vector", "int"],
         ["std", "vector", "int"]),
        ("x..y", ["x", "y"], ["x", "y"]),
        # mixed letter.digit is neither WB6 nor WB11: splits
        ("a.4", ["a", "4"], ["a", "4"]),
        # Han unigrams; Katakana runs whole (WB13); ExtendNumLet '_' joins
        ("速度测试", ["速", "度", "测", "试"], ["速", "度", "测", "试"]),
        ("スパーク テスト", ["スパーク", "テスト"], ["スパーク", "テスト"]),
        ("snake_case", ["snake_case"], ["snake_case"]),
        ("well-known", ["well", "known"], ["well", "known"]),
        # WB4 (r4): Format chars are word-boundary-transparent — word joiner,
        # soft hyphen and ZWNJ inside a word are stripped, so the token joins
        ("a⁠b", ["ab"], ["ab"]),
        ("co­operate", ["cooperate"], ["cooperate"]),
        ("a‌b", ["ab"], ["ab"]),
        # ...but U+200B ZERO WIDTH SPACE has Word_Break=Other: it BREAKS
        ("a​b", ["a", "b"], ["a", "b"]),
        # Supplementary Han (Extension B, ADVICE r3): unigrams like BMP Han
        ("𠀀𠀁", ["𠀀", "𠀁"],
         ["𠀀", "𠀁"]),
    ]

    @pytest.mark.parametrize("text,ours,lucene", CASES,
                             ids=[c[0] for c in CASES])
    def test_pinned_behavior(self, text, ours, lucene):
        assert tokenize_standard(text) == ours

    def test_divergence_inventory_is_current(self):
        """Every case marked divergent must actually still diverge — a
        further tokenizer upgrade must update this inventory (and the
        analyzers.py module docstring) in the same change."""
        diverging = [c for c in self.CASES if c[1] != c[2]]
        assert [c[0] for c in diverging] == []  # empty as of r4 (WB4 closed)


class TestPorter:
    # goldens from the published algorithm description
    @pytest.mark.parametrize("word,stem", [
        ("caresses", "caress"), ("ponies", "poni"), ("caress", "caress"),
        ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
        ("plastered", "plaster"), ("bled", "bled"), ("motoring", "motor"),
        ("sing", "sing"), ("conflated", "conflat"), ("troubled", "troubl"),
        ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
        ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
        ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
        ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
        ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
        ("digitizer", "digit"), ("conformabli", "conform"),
        ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
        ("analogousli", "analog"), ("vietnamization", "vietnam"),
        ("predication", "predic"), ("operator", "oper"), ("feudalism", "feudal"),
        ("decisiveness", "decis"), ("hopefulness", "hope"),
        ("callousness", "callous"), ("formaliti", "formal"),
        ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
        ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
        ("electriciti", "electr"), ("electrical", "electr"),
        ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
        ("allowance", "allow"), ("inference", "infer"), ("airliner", "airlin"),
        ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
        ("defensible", "defens"), ("irritant", "irrit"),
        ("replacement", "replac"), ("adjustment", "adjust"),
        ("dependent", "depend"), ("adoption", "adopt"), ("homologou", "homolog"),
        ("communism", "commun"), ("activate", "activ"), ("angulariti", "angular"),
        ("homologous", "homolog"), ("effective", "effect"), ("bowdlerize", "bowdler"),
        ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
        ("controll", "control"), ("roll", "roll"),
    ])
    def test_goldens(self, word, stem):
        assert porter_stem(word) == stem

    def test_short_unchanged(self):
        assert porter_stem("is") == "is"
        assert porter_stem("def") == "def"


class TestSmallFloat:
    def test_small_values_exact(self):
        for i in range(24):
            assert int_to_byte4(i) == i
            assert quantize_length(i) == i

    def test_roundtrip_idempotent_and_monotone(self):
        prev = -1
        for i in list(range(0, 4096)) + [10**5, 10**6, 2**31 - 1]:
            q = quantize_length(i)
            assert q <= i
            assert quantize_length(q) == q  # idempotent
            b = int_to_byte4(i)
            assert 0 <= b <= 255
            assert b >= prev
            prev = b

    def test_known_values(self):
        assert int_to_byte4(40) == 40
        assert byte4_to_int(40) == 40
        assert quantize_length(100) == 96   # 100-24=76 → top4(76)=72 → 24+72


class TestHighlightJoinedTokens:
    def test_dotted_and_numeric_terms_highlight(self):
        """r3: the highlight surface scan uses the UAX#29 token regex, so
        joined index terms (example.com, 3.14, it's) can be wrapped."""
        from elasticsearch_alps_spark.queries.highlight import highlight
        text = "visit example.com for 3.14 of it's glory"
        assert highlight(text, ["example.com"], EXACT_MATCH_ANALYZER) == \
            ["visit <MATCH>example.com</MATCH> for 3.14 of it's glory"]
        assert "<MATCH>3.14</MATCH>" in highlight(
            text, ["3.14"], EXACT_MATCH_ANALYZER)[0]
        assert "<MATCH>it's</MATCH>" in highlight(
            text, ["it's"], EXACT_MATCH_ANALYZER)[0]


class TestHighlightGoldens:
    """Hand-computed fragment goldens (VERDICT r3 next #6): pins the exact
    fragment windowing, wrapping, and span-selection semantics of
    queries/highlight.py (the reference consumes ES highlights with
    fragment_size/number_of_fragments, ``scripts/search/search.py:158-169``).
    Every expected string was computed by hand from the documented algorithm:
    window = match ± (fragment_size - match_len)//2, clamped to the text;
    every span fully inside the window is wrapped; overlapping windows are
    coalesced via used_until."""

    def _hl(self, text, terms, cfg=EXACT_MATCH_ANALYZER, **kw):
        from elasticsearch_alps_spark.queries.highlight import highlight
        return highlight(text, terms, cfg, **kw)

    def test_single_term_short_text(self):
        assert self._hl("the quick brown fox", ["quick"]) == \
            ["the <MATCH>quick</MATCH> brown fox"]

    def test_multi_term_one_fragment(self):
        assert self._hl("quick brown fox", ["quick", "fox"]) == \
            ["<MATCH>quick</MATCH> brown <MATCH>fox</MATCH>"]

    def test_case_folding_and_span_coalescing(self):
        # both occurrences land in the first window → ONE fragment wraps
        # both; the second span is then inside used_until and opens no new
        # fragment
        assert self._hl("Spark and spark again", ["spark"]) == \
            ["<MATCH>Spark</MATCH> and <MATCH>spark</MATCH> again"]

    def test_stemmed_surface_form_wraps(self):
        # query side analyzed "running"→"run"; surface token "running" must
        # still be found via its own analyzed form
        assert self._hl("running fast", ["run"], WEB_CONTENT_ANALYZER) == \
            ["<MATCH>running</MATCH> fast"]

    def test_asciifolded_surface_form_wraps(self):
        assert self._hl("café costs", ["cafe"]) == \
            ["<MATCH>café</MATCH> costs"]

    def test_joined_token_whole_span(self):
        assert self._hl("see example.com for docs", ["example.com"]) == \
            ["see <MATCH>example.com</MATCH> for docs"]

    def test_cjk_unigram_piece_not_whole_run(self):
        # ADVICE r3 (closed r4): index/query side emits Han unigrams, so the
        # surface scan must wrap ONLY the matching character of the run
        assert self._hl("速度测试", ["度"]) == ["速<MATCH>度</MATCH>测试"]

    def test_window_arithmetic_exact(self):
        # len("spark")=5, fragment_size=11 → half=(11-5)//2=3 → window is
        # exactly [start-3, end+3) = "aa spark bb"
        text = "aaaaaaaaaa spark bbbbbbbbbb"
        assert self._hl(text, ["spark"], fragment_size=11) == \
            ["aa <MATCH>spark</MATCH> bb"]

    def test_number_of_fragments_cap(self):
        # three separated matches, cap 2 → first two windows only; with
        # fragment_size=9, half=2 → each window is "…x <MATCH>spark</MATCH> y…"
        text = "spark " + "x" * 30 + " spark " + "y" * 30 + " spark"
        assert self._hl(text, ["spark"], fragment_size=9,
                        number_of_fragments=2) == \
            ["<MATCH>spark</MATCH> x", "x <MATCH>spark</MATCH> y"]

    def test_best_fragment_selected_not_first(self):
        # r4: selection is by score (distinct terms, then match count),
        # output in text order — a later window with BOTH query terms beats
        # an earlier single-match window (what ES's unified highlighter's
        # passage scoring does)
        text = "spark intro " + "x" * 40 + " spark lucene core"
        got = self._hl(text, ["spark", "lucene"], fragment_size=20,
                       number_of_fragments=1)
        assert len(got) == 1
        assert "<MATCH>spark</MATCH> <MATCH>lucene</MATCH>" in got[0]

    def test_selected_fragments_keep_text_order(self):
        # two 2-distinct windows beat the middle 1-match window; emitted in
        # text order even though selection is by score
        text = ("spark lucene " + "a" * 40 + " spark only " + "b" * 40
                + " lucene spark")
        got = self._hl(text, ["spark", "lucene"], fragment_size=24,
                       number_of_fragments=2)
        assert len(got) == 2
        assert "<MATCH>spark</MATCH> <MATCH>lucene</MATCH>" in got[0]
        assert "<MATCH>lucene</MATCH> <MATCH>spark</MATCH>" in got[1]

    def test_stopword_not_wrapped(self):
        assert self._hl("the fox", ["fox"], WEB_CONTENT_ANALYZER) == \
            ["the <MATCH>fox</MATCH>"]

    def test_no_match_empty(self):
        assert self._hl("nothing here", ["absent"]) == []

    def test_format_char_joined_word_wraps_whole_surface(self):
        # ADVICE r4: "data⁠base" indexes as the joined token "database"
        # (WB4 Format strip); the surface scan must find it too and wrap the
        # WHOLE surface word, invisible joiner included
        assert self._hl("a data⁠base here", ["database"]) == \
            ["a <MATCH>data⁠base</MATCH> here"]

    def test_format_char_offsets_stay_exact_after_strip(self):
        # a soft hyphen BEFORE the match must not shift the wrapped span
        assert self._hl("co­op and spark", ["spark"]) == \
            ["co­op and <MATCH>spark</MATCH>"]
        # ZWSP is WB-class Other (breaks): "a​b" stays two tokens, so
        # "ab" must NOT match across it
        assert self._hl("a​b here", ["ab"]) == []


class TestChain:
    def test_web_content_analyzer(self):
        # html_strip + standard + lowercase + asciifolding + stop + porter
        out = analyze("<b>The RUNNING cafés</b> are beautiful", WEB_CONTENT_ANALYZER)
        assert out == ["run", "cafe", "beauti"]

    def test_position_gaps_from_stopwords(self):
        out = analyze_positions("the quick fox", WEB_CONTENT_ANALYZER)
        # "the" removed at position 0 → gap preserved
        assert out == [("quick", 1), ("fox", 2)]

    def test_exact_analyzer_no_stop_no_stem(self):
        out = analyze("The RUNNING cafés", EXACT_MATCH_ANALYZER)
        assert out == ["the", "running", "cafes"]

    def test_simple_analyzer(self):
        out = analyze("Hello, World_99! Café", SIMPLE_ANALYZER)
        assert out == ["hello", "world_99", "caf"]  # é breaks the simple token

    def test_code_split(self):
        assert code_subtokens("camelCaseToken") == ["camel", "Case", "Token"]
        assert code_subtokens("snake_case_token") == ["snake", "case", "token"]
        assert code_subtokens("HTTPServer2") == ["HTTP", "Server", "2"]
        out = analyze("camelCaseToken", CODE_CONTENT_ANALYZER)
        assert "camelcasetoken" in out and "camel" in out and "token" in out

    def test_single_word_gate(self):
        assert is_single_word("hello")
        assert not is_single_word("hello world")
        assert not is_single_word("can't")  # two \w+ runs — reference quirk

    def test_url_analyzer(self):
        from elasticsearch_alps_spark.config import URL_ANALYZER
        out = analyze_positions("Visit https://Example.COM/a-b/c_d.html now",
                                URL_ANALYZER)
        terms = [t for t, _ in out]
        assert "example" in terms and "com" in terms
        assert "a" in terms and "b" in terms and "html" in terms
        # one position per whitespace unit
        assert {p for _, p in out} == {0, 1, 2}

    def test_keyword_analyzer_ignore_above(self):
        from elasticsearch_alps_spark.config import KEYWORD_ANALYZER
        assert analyze_positions("Some Exact Value", KEYWORD_ANALYZER) == \
            [("Some Exact Value", 0)]
        assert analyze_positions("x" * 513, KEYWORD_ANALYZER) == []

    def test_multi_matches_single(self):
        from elasticsearch_alps_spark.analysis.analyzers import analyze_positions_multi
        from elasticsearch_alps_spark.config import (
            EXACT_MATCH_ANALYZER, WEB_CONTENT_ANALYZER)
        text = "<b>The RUNNING cafés</b> are beautiful"
        m, e = analyze_positions_multi(
            text, [WEB_CONTENT_ANALYZER, EXACT_MATCH_ANALYZER])
        assert m == analyze_positions(text, WEB_CONTENT_ANALYZER)
        assert e == analyze_positions(text, EXACT_MATCH_ANALYZER)

    def test_fuzzy_auto(self):
        assert fuzzy_auto_distance("ab") == 0
        assert fuzzy_auto_distance("abc") == 1
        assert fuzzy_auto_distance("abcde") == 1
        assert fuzzy_auto_distance("abcdef") == 2
