#!/usr/bin/env python
"""WAND-vs-exhaustive crossover evidence (VERDICT r2 next #3).

Block-max WAND's point is LONG postings: pruning wins grow with posting-list
length, while at tiny corpora its per-bucket Python decode overhead loses to
the exhaustive whole-stage-codegen scorer. This tool measures both scorers on
hot-term queries at one or more corpus sizes and reports where (whether) WAND
crosses over, appending rows to BENCH/runs.jsonl for the curated table in
BENCH/BASELINE.md.

Methodology notes:
- Both engines serve the DISTRIBUTED plan (driver_score_max_postings=0) —
  the comparison is scorer vs scorer, not serving tier vs scorer.
- Both run uncached (cache=False) with a warm-up query first, mirroring the
  r2 bench methodology for WAND.
- Median of ALPS_XOVER_REPS (default 5) timed runs per (scorer, query).

Env: ALPS_XOVER_DOCS (comma list, default "60000,1000000"),
SPARK_GRAFT_CPUS (default 32), ALPS_XOVER_REPS.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_QUERIES = ["def", "import", "def import data", "parse json config"]


def bench_size(n_docs: int, cpus: int, reps: int) -> dict:
    from pyspark.sql import SparkSession
    from elasticsearch_alps_spark.config import IndexConfig, QueryConfig
    from elasticsearch_alps_spark.fixtures import documents_df_distributed
    from elasticsearch_alps_spark.indexing.builder import build_index
    from elasticsearch_alps_spark.queries.engine import SearchEngine
    from elasticsearch_alps_spark.session import ship_package

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("alps-wand-crossover")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("ALPS_BENCH_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    out = tempfile.mkdtemp(prefix="alps_xover_")
    try:
        src = os.path.join(out, "src")
        documents_df_distributed(spark, n_docs, seed=42).write.parquet(src)
        docs = spark.read.parquet(src)
        t0 = time.time()
        paths = build_index(spark, docs, out, IndexConfig(), shards=cpus)
        t_build = time.time() - t0
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        exh = SearchEngine(spark, paths.root,
                           QueryConfig(driver_score_max_postings=0))
        wand = SearchEngine(spark, paths.root, QueryConfig(use_wand=True))
        exh.match_query("def").collect()   # warm JVM / parquet footers
        wand.match_query("def").collect()  # warm packed_meta / plan caches

        per_query = {}
        for q in HOT_QUERIES:
            ts_e, ts_w = [], []
            for _ in range(reps):
                t0 = time.time()
                exh.match_query(q).collect()
                ts_e.append(time.time() - t0)
                t0 = time.time()
                wand.match_query(q).collect()
                ts_w.append(time.time() - t0)
            per_query[q] = {
                "exhaustive_p50_s": round(statistics.median(ts_e), 4),
                "wand_p50_s": round(statistics.median(ts_w), 4),
                "wand_speedup": round(statistics.median(ts_e)
                                      / statistics.median(ts_w), 2),
            }
        # df of the hottest single terms for context
        dfs = {r["term"]: r["df"] for r in
               exh._term_stats["main"]
               .filter(exh._term_stats["main"].term.isin(["def", "import"]))
               .collect()}
        return {"n_docs": n_docs, "build_s": round(t_build, 1),
                "hot_term_df": dfs, "queries": per_query}
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sizes = [int(s) for s in
             os.environ.get("ALPS_XOVER_DOCS", "60000,1000000").split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("ALPS_XOVER_REPS", "5"))
    report = {"date": str(date.today()), "kind": "wand_crossover",
              "cpus": cpus, "reps": reps,
              "sizes": [bench_size(n, cpus, reps) for n in sizes]}
    print(json.dumps(report, indent=2))
    log = os.path.join(REPO, "BENCH", "runs.jsonl")
    os.makedirs(os.path.dirname(log), exist_ok=True)
    with open(log, "a") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
