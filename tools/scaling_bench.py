#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No multi-node cluster exists in this sandbox, so the N→4N-executor criterion
is evidenced by running the IDENTICAL bench job at two local parallelism
levels (default local[8] vs local[32]) on the same input, reporting throughput
at both and efficiency = T_4N / (4 × T_N) — appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               ALPS_BENCH_DOCS=str(n_docs))
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_small = int(os.environ.get("ALPS_SCALE_N", "8"))
    n_big = 4 * n_small
    n_docs = int(os.environ.get("ALPS_BENCH_DOCS", "60000"))
    small = run(n_small, n_docs)
    big = run(n_big, n_docs)
    t_small = small["indexing_docs_per_sec"]
    t_big = big["indexing_docs_per_sec"]
    eff = t_big / (4.0 * t_small)
    report = {
        "date": str(date.today()),
        "n_docs": n_docs,
        f"local[{n_small}]_docs_per_sec": t_small,
        f"local[{n_big}]_docs_per_sec": t_big,
        "scaling_efficiency": round(eff, 3),
        f"local[{n_small}]_query_p50_ms": small["query_p50_ms"],
        f"local[{n_big}]_query_p50_ms": big["query_p50_ms"],
    }
    print(json.dumps(report, indent=2))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header_needed = not os.path.exists(md)
    with open(md, "a") as f:
        if header_needed:
            f.write("# BENCH/BASELINE — measured numbers for this engine\n\n"
                    "Scaling criterion (north_rule): throughput efficiency "
                    "≥ 0.8 from N to 4N executors, evidenced here by the "
                    "identical indexing job at two local parallelism levels "
                    "on the same input (no real cluster in this sandbox — "
                    "see BASELINE.md note).\n\n"
                    "| date | docs | N cores | docs/s @N | 4N cores | docs/s @4N "
                    "| efficiency T_4N/(4·T_N) | p50 ms @N | p50 ms @4N |\n"
                    "|---|---|---|---|---|---|---|---|---|\n")
        f.write(f"| {report['date']} | {n_docs} | {n_small} | {t_small} "
                f"| {n_big} | {t_big} | {report['scaling_efficiency']} "
                f"| {small['query_p50_ms']} | {big['query_p50_ms']} |\n")


if __name__ == "__main__":
    main()
