"""Result writers (S9): detailed per-query rows + per-type summary stats,
mirroring the reference's output files
(``/root/reference/scripts/search/search.py:681-881``) — same fieldnames,
same JSON/CSV shapes, timestamped filenames."""

from __future__ import annotations

import csv
import json
import os
from datetime import datetime
from typing import List

FIELDNAMES = [
    "timestamp", "segment_text", "query_type", "query_time_ms", "es_took_ms",
    "total_hits", "max_score", "timed_out", "error", "top_5_hits",
]


def _normalize(results: List[dict]) -> List[dict]:
    out = []
    for r in results:
        row = dict(r)
        row.setdefault("es_took_ms", row.get("query_time_ms", 0))
        out.append({k: row.get(k, "") for k in FIELDNAMES})
    return out


def save_detailed_results_json(results: List[dict], path: str) -> None:
    """search.py:793-801."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(_normalize(results), f, indent=2, ensure_ascii=False)


def save_detailed_results_csv(results: List[dict], path: str) -> None:
    """search.py:681-708 (including the segment separator rows)."""
    rows = _normalize(results)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=FIELDNAMES)
        w.writeheader()
        current = None
        for row in rows:
            if current is not None and row["segment_text"] != current:
                sep = {k: "---" if k != "top_5_hits" else "" for k in FIELDNAMES}
                sep["segment_text"] = f"--- END SEGMENT {current} ---"
                w.writerow(sep)
            w.writerow(row)
            current = row["segment_text"]


def save_summary_json(summary: dict, path: str) -> None:
    """search.py:858-860 (summary built by SearchEngine.summary_stats)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2, ensure_ascii=False)


def process_csv(engine, csv_file: str) -> int:
    """CSV query-file driver, mirroring the reference's harness loop
    (``search.py:636-679``): each non-empty first-column cell is a query
    segment fed to ``engine.run_all_queries``; results accumulate on
    ``engine.results``. Returns the number of segments processed."""
    processed = 0
    with open(csv_file, "r", encoding="utf-8") as f:
        for row in csv.reader(f):
            if not row or not row[0].strip():
                continue
            processed += 1
            engine.run_all_queries(row[0].strip())
    return processed


def run_query_file(engine, csv_file: str, output_dir: str,
                   job_id: str = "local") -> tuple:
    """End-to-end harness parity (``search.py:962-1000``): process the query
    CSV, then write the reference's two output files (detailed results +
    per-type summary). Returns (detailed_path, summary_path)."""
    process_csv(engine, csv_file)
    detailed, summary = timestamped_paths(output_dir, job_id)
    save_detailed_results_json(engine.results, detailed)
    save_summary_json(engine.summary_stats(), summary)
    return detailed, summary


def timestamped_paths(output_dir: str, job_id: str = "local") -> tuple:
    """search.py:976-983 naming convention."""
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(output_dir, exist_ok=True)
    return (os.path.join(output_dir, f"search_results_detailed_{job_id}_{ts}.json"),
            os.path.join(output_dir, f"search_results_summary_{job_id}_{ts}.json"))
