#!/usr/bin/env python
"""Minimal spark-submit job — the north-rule deployment mode end-to-end:

    spark-submit --master local[4] \
        --py-files /tmp/elasticsearch_alps_spark.zip \
        tools/submit_demo.py /tmp/submit_demo_idx

The script imports the engine ONLY from the shipped zip (it does not touch
the repo checkout), builds a small index, runs a match query, and prints one
JSON line — exactly what a multi-executor cluster submission looks like,
minus the cluster. Tested by tests/test_sources_and_results.py.
"""

import json
import sys

from pyspark.sql import SparkSession

# the package must resolve from --py-files, not the repo cwd
from elasticsearch_alps_spark.config import IndexConfig, QueryConfig
from elasticsearch_alps_spark.fixtures import documents_df
from elasticsearch_alps_spark.indexing.builder import build_index
from elasticsearch_alps_spark.queries.engine import SearchEngine


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/submit_demo_idx"
    spark = (SparkSession.builder.appName("alps-submit-demo")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = documents_df(spark, 300, seed=7)
    paths = build_index(spark, docs, out, IndexConfig(build_packed=False),
                        shards=4)
    eng = SearchEngine(spark, paths.root, QueryConfig())
    hits = eng.match_query("def main").collect()
    print(json.dumps({
        "n_docs": paths.read_stats()["fields"]["main"]["n_docs"],
        "hits": len(hits),
        "top_doc": int(hits[0]["doc_id"]) if hits else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
