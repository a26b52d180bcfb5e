"""Lucene's ``_english_`` stopword set.

The reference selects it via ``"stopwords": "_english_"``
(``/root/reference/index_config/index_config_1.json:37-41``). The set below is
Lucene's well-known 33-word ``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET`` (public
Lucene API constant, unchanged since Lucene 3.x).
"""

ENGLISH_STOP_WORDS = frozenset([
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with",
])
