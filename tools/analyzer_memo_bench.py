#!/usr/bin/env python
"""Analyzer-dominated workload evidence (VERDICT r3 next #5).

The token-filter memo (analyzers.py, r3) is ~2.7× on the analyzer chain in a
microbench, but the sf-corpus docs are short enough that the analyzer is a
small share of an end-to-end build. This tool builds ONCE over a LONG-doc
corpus (ALPS_MEMO_GROUP consecutive synthetic docs concatenated per row →
~10 KB median, analyzer share dominant) with the memo ON and OFF
(ALPS_TOKEN_MEMO env, read by each UDF worker at import), interleaved
on/off/on/off legs so host drift cancels, and reports docs/s + MB/s per leg.

Env: ALPS_MEMO_DOCS (small docs before grouping, default 120000),
ALPS_MEMO_GROUP (default 16), SPARK_GRAFT_CPUS (default 8 — a modest level
so the Python analyzer stage, not job barriers, dominates), ALPS_MEMO_LEGS
(legs per config, default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_leg(corpus_dir: str, memo_on: bool, cpus: int) -> dict:
    """One build in a SUBPROCESS so the memo flag (module import time) and
    the JVM are fresh per leg."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
from elasticsearch_alps_spark.config import IndexConfig
from elasticsearch_alps_spark.indexing.builder import build_index
from elasticsearch_alps_spark.session import ship_package
import tempfile
spark = (SparkSession.builder.master("local[{cpus}]")
         .appName("alps-memo-bench")
         .config("spark.sql.shuffle.partitions", "{cpus}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
ship_package(spark)
docs = spark.read.parquet({corpus_dir!r})
out = tempfile.mkdtemp(prefix="alps_memo_idx_")
t0 = time.time()
paths = build_index(spark, docs, out, IndexConfig(), shards={cpus})
dt = time.time() - t0
st = paths.read_stats()["fields"]["main"]
print(json.dumps({{"build_sec": round(dt, 1), "n_docs": st["n_docs"],
                  "docs_per_sec": round(st["n_docs"] / dt, 1)}}))
import shutil as _sh; _sh.rmtree(out, ignore_errors=True)
spark.stop()
"""
    env = dict(os.environ, ALPS_TOKEN_MEMO=("1" if memo_on else "0"))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        return {"error": r.stderr[-800:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    n_small = int(os.environ.get("ALPS_MEMO_DOCS", "120000"))
    group = int(os.environ.get("ALPS_MEMO_GROUP", "16"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    legs = int(os.environ.get("ALPS_MEMO_LEGS", "2"))

    from pyspark.sql import SparkSession, functions as F
    from elasticsearch_alps_spark.fixtures import documents_df_distributed
    from elasticsearch_alps_spark.session import ship_package

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("alps-memo-corpus")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    corpus_dir = tempfile.mkdtemp(prefix="alps_memo_corpus_") + "/docs"
    # concatenate `group` DIFFERENT docs per output row — long docs with a
    # natural (Zipfian) token mix, not artificial repetition that would
    # inflate the memo hit rate
    small = documents_df_distributed(spark, n_small, seed=7)
    grouped = (small
               .withColumn("g", (F.crc32(F.concat_ws("|", "repo", "path",
                                                     "commit"))
                                 % (n_small // group)).cast("long"))
               .groupBy("g")
               .agg(F.concat_ws("\n", F.collect_list("content"))
                    .alias("content"),
                    F.first("lang").alias("lang"))
               .select(F.concat(F.lit("repo"), F.col("g")).alias("repo"),
                       F.concat(F.lit("file"), F.col("g")).alias("path"),
                       F.lit("c0").alias("commit"), "lang", "content"))
    grouped.write.parquet(corpus_dir)
    stats = spark.read.parquet(corpus_dir).select(
        F.count("*").alias("n"),
        F.expr("percentile_approx(length(content), 0.5)").alias("med_len"),
        F.sum(F.length("content")).alias("total_bytes")).collect()[0]
    spark.stop()

    report = {"date": str(date.today()), "kind": "analyzer_memo_bench",
              "cpus": cpus, "long_docs": stats["n"],
              "median_doc_bytes": int(stats["med_len"]),
              "total_mb": round(stats["total_bytes"] / 1e6, 1),
              "legs_on": [], "legs_off": []}
    try:
        for _ in range(legs):  # interleaved so host drift cancels
            report["legs_on"].append(build_leg(corpus_dir, True, cpus))
            report["legs_off"].append(build_leg(corpus_dir, False, cpus))
        on = max(l.get("docs_per_sec", 0) for l in report["legs_on"])
        off = max(l.get("docs_per_sec", 0) for l in report["legs_off"])
        report["best_on_docs_per_sec"] = on
        report["best_off_docs_per_sec"] = off
        report["memo_speedup"] = round(on / off, 3) if off else None
        if report["legs_on"][0].get("build_sec"):
            mb_s = report["total_mb"] / min(
                l["build_sec"] for l in report["legs_on"] if "build_sec" in l)
            report["best_on_mb_per_sec"] = round(mb_s, 2)
        print(json.dumps(report, indent=2))
        with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
            f.write(json.dumps(report) + "\n")
    finally:
        shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
