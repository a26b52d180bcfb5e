"""Spark-side analysis: vectorized Arrow ``pandas_udf`` wrappers around the
shared pure-Python chain, plus a pure-Catalyst (JVM, whole-stage-codegen) path
for the SQL-expressible ``simple`` profile.

Per the input contract: no per-row Python UDFs — tokenization crosses the
JVM↔Python boundary once per Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from elasticsearch_alps_spark.analysis.analyzers import analyze_positions
from elasticsearch_alps_spark.config import AnalyzerConfig

# token stream element: term + position (position gaps from stopword removal)
TOKEN_STREAM_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("t", T.StringType(), False),
        T.StructField("p", T.IntegerType(), False),
    ])
)


def token_stream_udf(cfg: AnalyzerConfig):
    """pandas_udf: string column → array<struct<t,p>> token stream.

    ``cfg`` is a small frozen dataclass captured in the closure (pickled once
    per task, not per row)."""

    @F.pandas_udf(TOKEN_STREAM_TYPE)
    def _tokenize(s: pd.Series) -> pd.Series:
        return s.map(lambda x: analyze_positions(x, cfg) if x is not None else [])

    return _tokenize


def simple_expressible(cfg: AnalyzerConfig) -> bool:
    """True if the chain can run as pure Catalyst expressions (and therefore
    also as DuckDB oracle SQL): simple regex tokenizer, lowercase only."""
    return (cfg.tokenizer == "simple" and cfg.lowercase and not cfg.asciifolding
            and not cfg.english_stop and not cfg.english_stemmer
            and not cfg.code_split)


# Must stay in lockstep with analyzers._SIMPLE_TOKEN_RE and the DuckDB oracle
# SQL in __spark_entry__.py.
SIMPLE_SPLIT_REGEX = "[^a-z0-9_]+"


def simple_tokens_col(text_col: Column) -> Column:
    """JVM-side tokens for the simple profile: lower → split → drop empties.
    Whole-stage-codegen'd; no Python in the hot path."""
    return F.filter(
        F.split(F.lower(text_col), SIMPLE_SPLIT_REGEX),
        lambda x: x != F.lit(""),
    )


def tokens_with_positions(df, text_col: str, cfg: AnalyzerConfig, out_col: str = "tok"):
    """Add ``out_col`` = array<struct<t,p>> token stream for ``text_col``,
    choosing the JVM path when expressible, else the Arrow UDF path."""
    if simple_expressible(cfg):
        toks = simple_tokens_col(F.col(text_col))
        # zip terms with their index as position (no stopword gaps in simple mode)
        stream = F.transform(
            toks, lambda x, i: F.struct(x.alias("t"), i.cast("int").alias("p"))
        )
        return df.withColumn(out_col, stream)
    return df.withColumn(out_col, token_stream_udf(cfg)(F.col(text_col)))
