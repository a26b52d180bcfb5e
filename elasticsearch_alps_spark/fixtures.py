"""Deterministic synthetic test corpus (seed 42) per repo:FIXTURES.md.

Shape mirrors ``BASELINE.json`` ``input_hint``:
``documents(repo, path, commit, lang, content)`` — a source-code table whose
term distribution is Zipf-skewed on hot code tokens (``def``, ``import``, ...)
to exercise skew/salting, with rare unique identifiers for low-df / fuzzy /
wildcard paths, HTML fragments (html_strip), accents (asciifolding), empty
rows (P1 filter) and one >100k-char row (P4 truncation,
``/root/reference/scripts/index/index.py:421-422``).
"""

from __future__ import annotations

import hashlib
import random
from typing import List, Tuple

_LANGS = ["python", "java", "c", "go", "js"]
_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

# weighted pool: hot code tokens are Zipf-frequent
_HOT = ["def", "import", "return", "self", "if", "for", "in", "the", "value",
        "result", "data", "config", "parse", "json", "main", "numpy", "np",
        "class", "print", "error", "file", "open", "read", "write", "list"]
_MID = ["tokenize", "analyzer", "index", "search", "query", "merge", "shard",
        "segment", "posting", "score", "frequency", "document", "running",
        "connection", "relational", "beautiful", "optimization", "café",
        "naïve", "résumé", "camelCaseToken", "snake_case_token", "HTTPServer"]


def _content(i: int, rng: random.Random) -> str:
    lines: List[str] = []
    n_lines = 3 + rng.randrange(10)
    for j in range(n_lines):
        n_tok = 4 + rng.randrange(8)
        toks = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.55:
                # Zipf-ish over the hot pool
                idx = min(int(rng.paretovariate(1.2)) - 1, len(_HOT) - 1)
                toks.append(_HOT[idx])
            elif r < 0.85:
                toks.append(rng.choice(_MID))
            else:
                toks.append(f"uniq_{i}_{j}")
        lines.append(" ".join(toks))
    body = "\n".join(lines)
    # sprinkle structured variants
    if i % 17 == 0:
        body = f"<b>bold {body}</b> &amp; <script>var x=1;</script> tail"
    if i % 23 == 0:
        body += "\ndef main():\n    import numpy as np\n    return np"
    return body


DOC_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_row(i: int, seed: int = 42) -> Tuple[str, str, str, str, str]:
    """One deterministic row — seeded per row (NOT sequentially), so local and
    distributed generation produce the identical corpus."""
    rng = random.Random(f"{seed}:{i}")
    lang = _LANGS[i % len(_LANGS)]
    repo = f"org{i % 7}/repo{i % 41}"
    path = f"src/pkg{i % 13}/mod_{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"c{i}".encode()).hexdigest()
    if i % 97 == 0:
        content = ""  # P1: empty content, must be filtered
    elif i % 101 == 0:
        content = "   \n  "  # P1: whitespace-only
    elif i == 5:
        # P4: >100k chars → truncation path
        content = ("import truncation_marker " * 5000) + " tail_after_limit"
    else:
        content = _content(i, rng)
    return (repo, path, commit, lang, content)


def generate_documents(n: int = 2000, seed: int = 42) -> List[Tuple[str, str, str, str, str]]:
    """Rows of (repo, path, commit, lang, content)."""
    return [generate_row(i, seed) for i in range(n)]


def documents_df(spark, n: int = 2000, seed: int = 42):
    """Spark DataFrame of the synthetic corpus (driver-side generation;
    fine for test sizes)."""
    return spark.createDataFrame(generate_documents(n, seed), schema=DOC_SCHEMA)


def documents_df_distributed(spark, n: int, seed: int = 42,
                             partitions: int = None):
    """Same corpus, generated ON THE EXECUTORS (mapInPandas over spark.range)
    — per-row seeding makes it bit-identical to ``documents_df`` while
    scaling generation with the cluster (used by bench at 60k+ docs)."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [generate_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    return (spark.range(n).repartition(parts)
            .mapInPandas(gen, DOC_SCHEMA))


# ---- natural-language long-doc corpus (r7, VERDICT r6 next #8) ----
# The code-like corpus above is short-doc (~60 tokens) with a mostly
# stem-free vocabulary, so the analyzer memo + Porter + stopword chain sits
# under the bench noise floor. This shape is the opposite: ~10× longer
# docs, ~35% stopwords, and every content word inflected from a stem pool —
# the stemmer-heavy English-prose profile of a web-scale text pipeline.
_NL_STOP = ["the", "of", "and", "a", "to", "in", "is", "was", "that", "it",
            "for", "on", "with", "as", "be", "at", "by", "this", "not",
            "are", "but", "from", "or", "have", "an", "they", "which"]
_NL_STEMS = ["run", "connect", "optimize", "analyze", "index", "search",
             "document", "process", "generate", "compute", "distribute",
             "measure", "partition", "aggregate", "stream", "cluster",
             "train", "sample", "filter", "transform", "encode", "retrieve",
             "evaluate", "publish", "describe", "relate", "nation",
             "operate", "create", "iterate"]
_NL_SUFFIX = ["", "s", "d", "r", "rs"]  # stem-safe inflections


def generate_nl_row(i: int, seed: int = 42) -> Tuple[str, str, str, str, str]:
    """One deterministic natural-language row, per-row seeded like
    :func:`generate_row` (local ≡ distributed)."""
    rng = random.Random(f"nl:{seed}:{i}")
    lang = "en"
    repo = f"site{i % 11}/crawl{i % 31}"
    path = f"pages/sec{i % 13}/page_{i}.html"
    commit = hashlib.sha1(f"nl{i}".encode()).hexdigest()
    sents: List[str] = []
    n_sent = 30 + rng.randrange(60)
    for _ in range(n_sent):
        toks: List[str] = []
        for _ in range(8 + rng.randrange(8)):
            if rng.random() < 0.35:
                toks.append(rng.choice(_NL_STOP))
            else:
                sidx = min(int(rng.paretovariate(1.3)) - 1,
                           len(_NL_STEMS) - 1)
                toks.append(_NL_STEMS[sidx] + rng.choice(_NL_SUFFIX))
        if rng.random() < 0.05:
            toks.append(f"uniqnl_{i}_{len(sents)}")
        sents.append(" ".join(toks) + ".")
    return (repo, path, commit, lang, " ".join(sents))


def nl_documents_df_distributed(spark, n: int, seed: int = 42,
                                partitions: int = None):
    """Executor-side generation of the NL long-doc corpus."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [generate_nl_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    return (spark.range(n).repartition(parts)
            .mapInPandas(gen, DOC_SCHEMA))


# NL-corpus query set: stems + inflections + stopword-heavy phrases
NL_QUERIES = [
    "search", "indexes", "optimized", "distribute processing",
    "the search of the document", "cluster training", "connect",
    "aggregated streams", "retrieval evaluation", "uniqnl_100_1",
]


# Reference query set per repo:FIXTURES.md §2 — one string per line, format per
# /root/reference/scripts/search/search.py:636-668.
REFERENCE_QUERIES = [
    "def",
    "import",
    "return",
    "uniq_100_1",
    "uniq_17_3",
    "improt",
    "retrun",
    "parse json config",
    "the value of the result",
    "def main",
    "import numpy as np",
    "pars",
    "Café",
    "RETURN",
    "tokeniz",
    "snake_case_token",
    "camelCaseToken",
    "beautiful optimization",
    "query score frequency",
    "connection error file",
    "xyzzy_no_such_term",
    "segment posting merge shard index",
    "naïve résumé",
    "HTTPServer",
    "self data config value",
]


def write_queries_csv(path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for q in REFERENCE_QUERIES:
            f.write(q + "\n")
