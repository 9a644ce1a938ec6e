"""Unit tests for the text curation operators: chunking and PII
redaction (the corpus-level behavior is covered by the oracle
harness; these pin the per-row edge cases)."""

from __future__ import annotations

from ingest_spark.operators.text import chunk_tokens, pii_redact


def test_chunk_tokens_overlap_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    rows = {r["chunk_id"]: r for r in chunk_tokens(df, size=8, stride=4).collect()}
    # starts at tokens 1,5,9,13,17 -> 5 chunks
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0]["chunk_text"].split(" ") == [f"t{i}" for i in range(8)]
    # 50% overlap: chunk 1 starts at token 4
    assert rows[1]["chunk_text"].split(" ")[0] == "t4"
    assert rows[0]["n_tokens"] == 8
    # tail chunk is short, not dropped and not padded
    assert rows[4]["n_tokens"] == 4
    assert rows[4]["chunk_text"].split(" ") == ["t16", "t17", "t18", "t19"]


def test_chunk_tokens_doc_shorter_than_window(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_tokens(df, size=16, stride=8).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c" and rows[0]["n_tokens"] == 3


def test_pii_redact_counts_and_placeholders(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org or x@y.io, call 555-123-4567 now"),
            (2, "clean text, no pii at all"),
            (3, "half-match 12-345-6789 and user@nodot stay untouched"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL>, call <PHONE> now"
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["redacted"] == out[2]["text"]
    # near-misses: wrong phone grouping, email without TLD dot
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[3]["redacted"] == out[3]["text"]


def test_sketch_rollup_union_error_bound(spark):
    from ingest_spark.queries import QUERIES

    rows = QUERIES["sketch_rollup_union"](spark, "/root/testdata/sf0.01").collect()
    by_type = {r["event_type"]: r for r in rows}
    assert "ALL" in by_type and len(by_type) >= 4
    for r in rows:
        rel = abs(r["hll_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel < 0.05, (r["event_type"], r["hll_users"], r["exact_users"])
    # the merged estimate must cover at least the largest group
    assert by_type["ALL"]["hll_users"] >= max(
        r["hll_users"] for r in rows if r["event_type"] != "ALL"
    )
