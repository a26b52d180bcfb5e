"""Driver-gate emulator (r5, VERDICT r4 next #7): run ``queries()`` on Spark
and ``oracle_sql()`` on DuckDB side-by-side over the same parquet tables and
compare row count, column names, and values — the same three checks the
round driver records in CORRECTNESS_r{N}.json — at ANY scale factor, so
scale-dependent divergence (overflow, rounding drift, skew) is catchable
before the driver runs.

Usage:
    python -m tools.gate_check                       # all gates at sf0.01
    python -m tools.gate_check --sf /root/testdata/sf0.1 ft_match_or dx_minhash_lsh
    python -m tools.gate_check --cpus 8 --json out.json

Value compare: columns sorted by name, rows sorted as tuples (so explicit
ORDER BY mismatches between engines don't mask value equality), floats
compared exactly (every gate rounds / aligns float discipline already —
an inexact float here IS a finding, not noise).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _canon(cols, rows):
    """(sorted column names, rows as tuples in sorted-column order, sorted)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return [cols[i] for i in order], sorted(out, key=repr)


def run(sf_dir: str, keys, cpus: int = 8):
    import duckdb

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName("alps-gate-check").getOrCreate())
    from elasticsearch_alps_spark.session import ship_package
    ship_package(spark)

    os.environ["GATE_SF"] = sf_dir
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    keys = keys or list(queries)
    results = {}
    for key in keys:
        t0 = time.time()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "sec": None}
        try:
            sdf = queries[key](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if key not in oracles:
                rec.update(rows_match=len(s_rows) >= 0, spark_rows=len(s_rows),
                           schema_match=True, hash_match=None)
                rec["note"] = "no_oracle (rows-only check)"
            else:
                cur = con.execute(oracles[key])
                o_cols = [d[0] for d in cur.description]
                o_rows = [tuple(r) for r in cur.fetchall()]
                sc, sr = _canon(s_cols, s_rows)
                oc, orr = _canon(o_cols, o_rows)
                rec.update(spark_rows=len(sr), oracle_rows=len(orr),
                           rows_match=len(sr) == len(orr),
                           schema_match=sc == oc, hash_match=sr == orr)
                if not rec["hash_match"] and rec["rows_match"]:
                    for a, b in zip(sr, orr):
                        if a != b:
                            rec["first_diff"] = {"spark": repr(a)[:200],
                                                 "oracle": repr(b)[:200]}
                            break
        except Exception as e:  # noqa: BLE001 — record, keep checking
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        results[key] = rec
        ok = (rec["err"] is None and rec["rows_match"]
              and rec["schema_match"] is not False
              and rec["hash_match"] is not False)
        print(f"{'PASS' if ok else 'FAIL'} {key} "
              f"rows={rec['spark_rows']}/{rec.get('oracle_rows')} "
              f"{rec['sec']}s" + (f" err={rec['err']}" if rec["err"] else ""),
              flush=True)
    spark.stop()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    results = run(args.sf, args.keys, args.cpus)
    n_fail = sum(1 for r in results.values()
                 if r["err"] or r["rows_match"] is False
                 or r["schema_match"] is False or r["hash_match"] is False)
    summary = {"sf": args.sf, "n_gates": len(results), "n_fail": n_fail,
               "results": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"\n{len(results) - n_fail}/{len(results)} gates green at {args.sf}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
