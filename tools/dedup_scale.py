#!/usr/bin/env python
"""dedup_corpus at 1M docs with a PLANTED duplicate distribution (r7,
VERDICT r6 next #4): the end-to-end operator is gate-proven at sf0.1 but
had no scale row, and it is the most likely 100-TB entry point.

Corpus (all generated ON the executors, pure Catalyst — no driver loop):

- ``n_base`` unique docs: 30 tokens each, vocabulary disjoint per doc
  (token = ``b<id>x<j>``) → zero cross-doc jaccard, so the planted truth
  is exact.
- Planted clusters of sizes 2–100 (spec below): every member of cluster
  ``c`` carries the SAME 30-token text (token = ``k<c>_<j>``) → exact
  copies, jaccard 1, found by any sane near-dup miner.
- One CHAIN of ``CHAIN_LEN`` docs: doc ``i`` = tokens ``c<i>..c<i+29>``;
  neighbors share 29/31 tokens (jaccard ≈ 0.94) but the endpoints share
  nothing — the component exists ONLY through multi-hop propagation, the
  same planted-diameter trap the dx_dedup_corpus gate uses at 477 rows,
  here at 1M.

Measured per phase (StageMetrics = Spark /api/v1 task quantiles, the
skew_stress reader): pair mining (minhash default params), pairs
materialization, connected components (pointer jumping), canonical
selection + report. The report histogram is then checked against the
planted truth EXACTLY.

Env: ALPS_DEDUP_DOCS (default 1000000), SPARK_GRAFT_CPUS (default 32).
Appends one row to BENCH/runs.jsonl (also via
``python -m tools.bench --suite dedup``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.skew_stress import StageMetrics  # noqa: E402

# (cluster_size, n_clusters): 2–100 with a long tail, 17,000 planted docs
CLUSTER_SPEC = [(2, 2000), (3, 1000), (5, 400), (10, 200),
                (20, 100), (50, 40), (100, 20)]
CHAIN_LEN = 200


def _planted_truth() -> dict:
    hist = {s: k for s, k in CLUSTER_SPEC}
    hist[CHAIN_LEN] = hist.get(CHAIN_LEN, 0) + 1  # the chain component
    dropped = sum((s - 1) * k for s, k in CLUSTER_SPEC) + (CHAIN_LEN - 1)
    return {"cluster_size_histogram": dict(sorted(hist.items())),
            "n_dropped": dropped,
            "n_clustered": sum(s * k for s, k in CLUSTER_SPEC) + CHAIN_LEN}


def build_corpus(spark, n_total: int):
    """→ DataFrame(doc_id long, text string) with the planted distribution."""
    from pyspark.sql import functions as F

    n_planted = sum(s * k for s, k in CLUSTER_SPEC) + CHAIN_LEN
    n_base = n_total - n_planted
    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.expr(
            "transform(sequence(1, 30), j -> concat('b', CAST(id AS STRING),"
            " 'x', CAST(j AS STRING)))")).alias("text"))
    # clusters: tiny spec frame exploded on the executors
    spec_rows, cid = [], 0
    for size, count in CLUSTER_SPEC:
        for _ in range(count):
            spec_rows.append((cid, size))
            cid += 1
    spec = spark.createDataFrame(spec_rows, "cid long, size int")
    # doc_id block of 128 per cluster keeps ids unique without a window
    clusters = (spec
                .select("cid", F.explode(F.expr("sequence(1, size)"))
                        .alias("m"))
                .repartition(spark.sparkContext.defaultParallelism)
                .select(
                    (F.lit(n_base) + F.col("cid") * 128 + F.col("m"))
                    .alias("doc_id"),
                    F.concat_ws(" ", F.expr(
                        "transform(sequence(1, 30), j -> concat('k', "
                        "CAST(cid AS STRING), '_', CAST(j AS STRING)))"))
                    .alias("text")))
    chain_off = n_base + cid * 128 + 128
    chain = spark.range(CHAIN_LEN).select(
        (F.lit(chain_off) + F.col("id")).alias("doc_id"),
        F.concat_ws(" ", F.expr(
            "transform(sequence(0, 29), j -> concat('c', "
            "CAST(id + j AS STRING)))")).alias("text"))
    return base.unionByName(clusters).unionByName(chain)


def main() -> None:
    n_total = int(os.environ.get("ALPS_DEDUP_DOCS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    from elasticsearch_alps_spark.extras.dedup import (
        connected_components, keep_canonical, minhash_lsh_pairs,
    )
    from elasticsearch_alps_spark.session import ship_package

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("alps-dedup-scale")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("ALPS_BENCH_DRIVER_MEM", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    sm = StageMetrics(spark)
    tmp = tempfile.mkdtemp(prefix="alps_dedup_scale_")
    report: dict = {"n_docs": n_total, "cpus": cpus,
                    "planted": _planted_truth()}
    stages: list = []
    try:
        # corpus materialized first so generation isn't timed as dedup
        src = os.path.join(tmp, "docs")
        build_corpus(spark, n_total).write.parquet(src)
        df = spark.read.parquet(src)
        sm.phase("generate")
        t_all0 = time.time()

        # ---- phase 1: pair mining (materialized — the documented at-scale
        # pattern: pointer jumping re-reads pairs every iteration)
        t0 = time.time()
        # persist_signatures=True (r8, VERDICT r7 wrong #1): the r7 run
        # measured the no-persist config — the mode the operator docstring
        # reserves for small one-shot gate inputs — which recomputed the
        # signature aggregation across the four band/re-attach lineage
        # branches and understated throughput ~3-4×. release() after the
        # pairs parquet write has materialized.
        pairs, release = minhash_lsh_pairs(df)
        pairs_path = os.path.join(tmp, "pairs")
        pairs.write.parquet(pairs_path)
        release()
        pairs = spark.read.parquet(pairs_path)
        n_pairs = pairs.count()
        report["mine_pairs_sec"] = round(time.time() - t0, 2)
        report["n_pairs"] = n_pairs
        stages += sm.phase("mine_pairs")

        # ---- phase 2: connected components (multi-hop pointer jumping)
        t0 = time.time()
        comps = connected_components(pairs)
        comps_path = os.path.join(tmp, "comps")
        comps.write.parquet(comps_path)
        comps = spark.read.parquet(comps_path)
        report["components_sec"] = round(time.time() - t0, 2)
        stages += sm.phase("components")

        # ---- phase 3: canonical selection + histogram
        t0 = time.time()
        n_kept = keep_canonical(df, comps).count()
        hist = {int(r["size"]): int(r["n"]) for r in
                (comps.groupBy("component").agg(F.count("*").alias("size"))
                      .groupBy("size").agg(F.count("*").alias("n"))
                      .collect())}
        report["canonical_sec"] = round(time.time() - t0, 2)
        report["total_sec"] = round(time.time() - t_all0, 2)
        report["docs_per_sec"] = round(n_total / report["total_sec"], 1)
        stages += sm.phase("canonical")

        # ---- truth check (exact: the planted corpus has no accidental dups)
        truth = report["planted"]
        got_hist = dict(sorted(hist.items()))
        report["cluster_size_histogram"] = got_hist
        report["n_kept"] = n_kept
        report["histogram_matches_planted"] = (
            got_hist == truth["cluster_size_histogram"])
        report["kept_matches_planted"] = (
            n_kept == n_total - truth["n_dropped"])
        # skew evidence: heavy stages only (same bar as skew_stress)
        heavy = [s for s in stages
                 if s["n_tasks"] >= 8 and (s["run_med_ms"] or 0) >= 200]
        report["worst_heavy_stage_ratio"] = max(
            (s["run_ratio"] for s in heavy if s["run_ratio"]), default=None)
        report["heavy_stages"] = heavy
        print(json.dumps(report, indent=2))
        ok = report["histogram_matches_planted"] and \
            report["kept_matches_planted"]
        row = {"suite": "dedup_scale", "date": date.today().isoformat(),
               "report": {k: v for k, v in report.items()
                          if k != "heavy_stages"},
               "heavy_stages": heavy, "ok": ok}
        with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
        if not ok:
            sys.exit(1)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
