#!/usr/bin/env python
"""ANN recall evidence (r5): approximate search that is fast but finds the
wrong neighbors is not done — this measures recall@k of every ANN variant
against exact brute force on the same embeddings table.

For ``ALPS_RECALL_QUERIES`` query vectors (default 40, drawn as every k-th
vector of the table so refits stay deterministic), computes brute-force
top-k ids and each method's top-k ids, and reports mean |approx ∩ exact|/k
plus per-query wall time. Methods: LSH multi-probe, IVF, PQ (ADC, full
scan), IVF-PQ (probed ADC), and IVF-PQ served from the persisted artifact.

Env: ALPS_RECALL_SF (default /root/testdata/sf0.01), ALPS_RECALL_K (10),
ALPS_RECALL_QUERIES (40), SPARK_GRAFT_CPUS (8).
Appends one JSON row to BENCH/runs.jsonl (also via
``python -m tools.bench --suite recall``).
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


def main() -> None:
    sf = os.environ.get("ALPS_RECALL_SF", "/root/testdata/sf0.01")
    k = int(os.environ.get("ALPS_RECALL_K", "10"))
    n_q = int(os.environ.get("ALPS_RECALL_QUERIES", "40"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import SparkSession, functions as F

    from elasticsearch_alps_spark.extras import simsearch as ss
    from elasticsearch_alps_spark.session import ship_package

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("alps-ann-recall")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).cache()
    n_vecs = emb.count()
    step = max(1, n_vecs // n_q)
    qrows = (emb.filter(F.col("vec_id") % step == 0)
             .orderBy("vec_id").limit(n_q)
             .select("vec_id", "embedding").collect())
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]

    # shared fits (same params as the oracle gates)
    cent = ss.ivf_fit_centroids(emb, n_centroids=8)
    cb = ss.pq_fit_codebooks(emb, m=8, n_codes=16)
    art = tempfile.mkdtemp(prefix="alps_recall_") + "/ann"
    ss.build_ann_index(emb, art, n_centroids=8, m=8, n_codes=16)
    art_res = tempfile.mkdtemp(prefix="alps_recall_") + "/ann_res"
    ss.build_ann_index(emb, art_res, n_centroids=8, m=8, n_codes=16,
                       residual=True)
    enc = ss.pq_encode(emb, cb).select("vec_id", "pq_code").cache()
    enc.count()
    # the quantization-budget knob: 4x subspaces x 4x codes (32 B/vec vs 8)
    cb_big = ss.pq_fit_codebooks(emb, m=16, n_codes=64)
    enc_big = ss.pq_encode(emb, cb_big).select("vec_id", "pq_code").cache()
    enc_big.count()

    def ids(df):
        return [r["id"] for r in df.collect()]

    methods = {
        "lsh_probe4": lambda qv: ss.lsh_topk(emb, qv, k, n_probes=4),
        "ivf_probe3": lambda qv: ss.ivf_topk(emb, qv, k, n_centroids=8,
                                             n_probe=3, centroids=cent),
        "pq_adc_full": lambda qv: ss.pq_topk(enc, qv, cb, k),
        "pq_adc_full_m16x64": lambda qv: ss.pq_topk(enc_big, qv, cb_big, k),
        "ivfpq_probe3": lambda qv: ss.ivfpq_topk(emb, qv, k, n_centroids=8,
                                                 n_probe=3, m=8, n_codes=16,
                                                 centroids=cent, codebooks=cb),
        "ivfpq_served_probe3": lambda qv: ss.ivfpq_topk_served(
            spark, art, qv, k, n_probe=3),
        "ivfpq_residual_probe3": lambda qv: ss.ivfpq_topk_served(
            spark, art_res, qv, k, n_probe=3),
        "ivfpq_residual_fullprobe": lambda qv: ss.ivfpq_topk_served(
            spark, art_res, qv, k, n_probe=8),
        "ivfpq_refined_probe3_x4": lambda qv: ss.ivfpq_topk_refined(
            spark, art, qv, emb, k, n_probe=3, refine=4),
        "ivfpq_refined_fullprobe_x8": lambda qv: ss.ivfpq_topk_refined(
            spark, art, qv, emb, k, n_probe=8, refine=8),
    }
    report = {"date": str(date.today()), "kind": "ann_recall", "sf": sf,
              "k": k, "n_queries": len(queries), "n_vecs": n_vecs,
              "cpus": cpus}
    exact = {}
    t0 = time.time()
    for qid, qv in queries:
        exact[qid] = set(ids(ss.brute_force_topk(emb, qv, k)))
    report["brute_force_sec_per_q"] = round((time.time() - t0) / len(queries), 3)
    for name, fn in methods.items():
        hits, t0 = 0, time.time()
        for qid, qv in queries:
            hits += len(set(ids(fn(qv))) & exact[qid])
        report[f"recall@{k}_{name}"] = round(hits / (k * len(queries)), 4)
        report[f"sec_per_q_{name}"] = round((time.time() - t0) / len(queries), 3)
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(report) + "\n")
    shutil.rmtree(os.path.dirname(art), ignore_errors=True)
    shutil.rmtree(os.path.dirname(art_res), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
