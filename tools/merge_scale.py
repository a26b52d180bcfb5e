#!/usr/bin/env python
"""Scale-proof the merge path (VERDICT r3 next #4): merge two ~500k-doc
indexes into a 1M-doc index, verify merge ≡ rebuild (exact per-field
n_docs/cf_total/avgdl + query-parity spot-check vs a from-scratch 1M build),
and record merge docs/s. Reference analog: the balanced segment merge of
``scripts/merge/stage1_balanced_merge_v2.sh:15-17``.

Also runs the r4 ``use_wand="auto"`` three-way comparison at 1M docs (the
regime where WAND wins on hot terms), reporting per-query times for the
forced-exhaustive, forced-WAND, and auto engines plus which scorer auto
chose. Appends one JSON row to BENCH/runs.jsonl.

Env: ALPS_MERGE_DOCS (default 1000000), SPARK_GRAFT_CPUS (default 32),
ALPS_MERGE_REPS (default 3 timed reps per query/engine).
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

MIXED_QUERIES = ["def", "import", "def import data", "parse json config"]
PARITY_QUERIES = ["def", "parse json config", "import numpy as np"]


def main() -> None:
    n_docs = int(os.environ.get("ALPS_MERGE_DOCS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("ALPS_MERGE_REPS", "3"))

    from pyspark.sql import SparkSession, functions as F
    from elasticsearch_alps_spark.config import IndexConfig, QueryConfig
    from elasticsearch_alps_spark.fixtures import documents_df_distributed
    from elasticsearch_alps_spark.indexing.builder import build_index
    from elasticsearch_alps_spark.merging.merger import merge_indexes
    from elasticsearch_alps_spark.queries.engine import SearchEngine
    from elasticsearch_alps_spark.session import ship_package

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("alps-merge-scale")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("ALPS_BENCH_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    out = tempfile.mkdtemp(prefix="alps_merge_scale_")
    report = {"date": str(date.today()), "kind": "merge_scale",
              "n_docs": n_docs, "cpus": cpus}
    try:
        # corpus split EXACTLY like the builder's docID order (sorted by the
        # id tuple) so build(A)+build(B) merged assigns the same docIDs as
        # build(A∪B) and query parity can compare (doc_id, score) directly.
        # r6: the median key comes from the builder's own DISTRIBUTED rank
        # (assign_dense_doc_ids: range partition + per-partition offsets) —
        # the r5 unpartitioned row_number window pulled the whole corpus
        # through ONE task, which stops scaling at 10M docs.
        src = os.path.join(out, "src")
        documents_df_distributed(spark, n_docs, seed=42).write.parquet(src)
        docs = spark.read.parquet(src)
        half = n_docs // 2
        from elasticsearch_alps_spark.indexing.ids import assign_dense_doc_ids
        with_ids, release_ids, _ = assign_dense_doc_ids(
            docs, ["repo", "path", "commit"], cpus)
        ranked = with_ids.withColumnRenamed("doc_id", "rn")
        # (release_ids after the half-builds: both filters read the cache)
        a_dir, b_dir = os.path.join(out, "a"), os.path.join(out, "b")
        m_dir, f_dir = os.path.join(out, "merged"), os.path.join(out, "full")
        cfg = IndexConfig()
        t0 = time.time()
        pa = build_index(spark, ranked.filter(F.col("rn") < half).drop("rn"),
                         a_dir, cfg, shards=cpus)
        pb = build_index(spark, ranked.filter(F.col("rn") >= half).drop("rn"),
                         b_dir, cfg, shards=cpus)
        release_ids()
        report["build_halves_sec"] = round(time.time() - t0, 1)

        t0 = time.time()
        merged = merge_indexes(spark, [a_dir, b_dir], m_dir, cfg, shards=cpus)
        t_merge = time.time() - t0
        report["merge_sec"] = round(t_merge, 1)
        report["merge_docs_per_sec"] = round(n_docs / t_merge, 1)

        t0 = time.time()
        full = build_index(spark, docs, f_dir, cfg, shards=cpus)
        report["build_full_sec"] = round(time.time() - t0, 1)

        # ---- merge ≡ rebuild: exact stats per field ----
        ms, fs = merged.read_stats(), full.read_stats()
        stats_ok = True
        for field in ms["fields"]:
            m, f = ms["fields"][field], fs["fields"][field]
            if m.get("alias") or f.get("alias"):
                continue
            for k in ("n_docs", "cf_total"):
                if m[k] != f[k]:
                    stats_ok = False
                    report[f"stats_mismatch_{field}_{k}"] = [m[k], f[k]]
            if abs(m["avgdl"] - f["avgdl"]) > 1e-9 * max(1.0, f["avgdl"]):
                stats_ok = False
                report[f"stats_mismatch_{field}_avgdl"] = [m["avgdl"], f["avgdl"]]
        report["merge_stats_exact"] = stats_ok

        # ---- query parity spot-check (top-50 (doc_id, round(score,9))) ----
        em = SearchEngine(spark, merged.root, QueryConfig())
        ef = SearchEngine(spark, full.root, QueryConfig())
        parity = True
        for q in PARITY_QUERIES:
            got = sorted(((r["doc_id"], round(r["score"], 9))
                          for r in em.match_query(q).collect()),
                         key=lambda t: (-t[1], t[0]))
            want = sorted(((r["doc_id"], round(r["score"], 9))
                           for r in ef.match_query(q).collect()),
                          key=lambda t: (-t[1], t[0]))
            if got != want:
                parity = False
                report[f"parity_fail_{q}"] = {"got": got[:3], "want": want[:3]}
        report["merge_query_parity"] = parity

        # ---- use_wand="auto" at 1M docs (r4 next #2 evidence) ----
        engines = {
            "exh": SearchEngine(spark, full.root,
                                QueryConfig(driver_score_max_postings=0)),
            "wand": SearchEngine(spark, full.root, QueryConfig(use_wand=True)),
            "auto": SearchEngine(spark, full.root,
                                 QueryConfig(use_wand="auto",
                                             driver_score_max_postings=0)),
        }
        for name, e in engines.items():
            e.match_query("def").collect()  # warm
        auto_choice = {}
        for name, e in engines.items():
            per_q = {}
            for q in MIXED_QUERIES:
                ts = []
                for _ in range(reps):
                    t0 = time.time()
                    e.match_query(q).collect()
                    ts.append(time.time() - t0)
                per_q[q] = round(statistics.median(ts), 3)
                if name == "auto":
                    auto_choice[q] = e.last_scorer
            report[f"q_{name}"] = per_q
        report["auto_choice"] = auto_choice
        report["auto_total"] = round(sum(report["q_auto"].values()), 3)
        report["best_forced_total"] = round(
            sum(min(report["q_exh"][q], report["q_wand"][q])
                for q in MIXED_QUERIES), 3)
        print(json.dumps(report, indent=2))
        log = os.path.join(REPO, "BENCH", "runs.jsonl")
        with open(log, "a") as f:
            f.write(json.dumps(report) + "\n")
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
