"""Input adapters (P2/P3/P6) + result writers (S9)."""

import json
import os

from elasticsearch_alps_spark.queries.results import (
    save_detailed_results_csv, save_detailed_results_json, save_summary_json,
    timestamped_paths,
)
from elasticsearch_alps_spark.sources import fineweb_adapter, sft_conversation_adapter


def test_fineweb_adapter(spark):
    df = spark.createDataFrame(
        [("doc one text", "id1", '{"url": "http://a.example/x", "k": 1}'),
         ("doc two text", "id2", '{"k": 2}'),            # P3: no url → dropped
         ("", "id3", '{"url": "http://c.example"}'),     # P1: empty → dropped
         ("   \n ", "id4", '{"url": "http://d.example"}'),  # P1 whitespace
         ("doc five", "id5", '{"url": ""}')],            # P3: empty url
        "text string, id string, metadata string")
    out = fineweb_adapter(df).collect()
    assert len(out) == 1
    assert out[0]["document_id"] == "id1"
    assert out[0]["url"] == "http://a.example/x"
    assert out[0]["text"] == "doc one text"


def test_sft_conversation_adapter(spark):
    schema = (
        "conversation_id string, original_metadata string, "
        "messages array<struct<role:string, content:struct<"
        "parts:array<struct<type:string,text:string>>, "
        "blocks:array<struct<text:string>>, text:string>>>")
    rows = [
        ("c1", "{}", [
            ("user", (None, None, "hello there")),
            ("system", (None, None, "IGNORE ME")),       # dropped role
            ("assistant", ([("text", "hi"), ("text", "friend")], None, None)),
            ("user", (None, [("from block",)], None)),
        ]),
        ("c2", "{}", [("system", (None, None, "only system"))]),  # → dropped
    ]
    df = spark.createDataFrame(rows, schema)
    out = {r["conversation_id"]: r["text"]
           for r in sft_conversation_adapter(df).collect()}
    assert set(out) == {"c1"}
    assert out["c1"].split("\n\n") == [
        "user: hello there", "assistant: hi friend", "user: from block"]
    assert "IGNORE ME" not in out["c1"]


def test_result_writers(tmp_path):
    results = [
        {"timestamp": "t0", "segment_text": "q1", "query_type": "match_query",
         "query_time_ms": 12.3, "total_hits": 5, "max_score": 1.5,
         "timed_out": False, "error": None, "top_5_hits": "Hit 1 ..."},
        {"timestamp": "t1", "segment_text": "q2", "query_type": "match_query",
         "query_time_ms": 4.5, "total_hits": 0, "max_score": 0,
         "timed_out": False, "error": None, "top_5_hits": ""},
    ]
    jp = str(tmp_path / "detail.json")
    cp = str(tmp_path / "detail.csv")
    save_detailed_results_json(results, jp)
    save_detailed_results_csv(results, cp)
    loaded = json.load(open(jp))
    assert len(loaded) == 2 and loaded[0]["es_took_ms"] == 12.3
    lines = open(cp).read().splitlines()
    assert len(lines) == 4  # header + row + separator + row
    assert "END SEGMENT q1" in lines[2]
    sp = str(tmp_path / "summary.json")
    save_summary_json({"overview": {"total_queries": 2}}, sp)
    assert json.load(open(sp))["overview"]["total_queries"] == 2
    d, s = timestamped_paths(str(tmp_path / "out"), "job7")
    assert "job7" in d and os.path.isdir(os.path.dirname(d)) and d != s
