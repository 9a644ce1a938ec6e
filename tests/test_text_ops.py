"""Unit tests for the text curation operators: chunking and PII
redaction (the corpus-level behavior is covered by the oracle
harness; these pin the per-row edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingest_spark.operators import text
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


def test_chunk_tokens_carry_passthrough(spark):
    """r10 (VERDICT r9 §Wrong #1): carry= forwards label columns
    through the chunk projection so callers never re-join the input —
    the re-join re-evaluated curation_e2e's whole gate subtree. Every
    chunk must repeat its document's carried value verbatim."""
    df = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "src_a"),
         (2, "x0 x1 x2", "src_b")],
        "doc_id long, text string, source string",
    )
    rows = chunk_tokens(df, size=4, stride=4, carry=["source"]).collect()
    assert {r["source"] for r in rows if r["doc_id"] == 1} == {"src_a"}
    assert {r["source"] for r in rows if r["doc_id"] == 2} == {"src_b"}
    # chunking itself is unchanged by the carry
    assert sorted(r["chunk_id"] for r in rows if r["doc_id"] == 1) == [0, 1, 2]
    assert [r["n_tokens"] for r in rows if r["doc_id"] == 2] == [3]


def test_chunk_tokens_carry_collision_raises(spark):
    """ADVICE r10: a carried column named like a generated output
    column (chunk_id/chunk_text/n_tokens/_toks/_start) or the id
    column must raise, not silently produce ambiguous duplicates."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c", 7)], "doc_id long, text string, chunk_id int"
    )
    with pytest.raises(ValueError, match="chunk_id"):
        chunk_tokens(df, size=4, stride=4, carry=["chunk_id"])
    with pytest.raises(ValueError, match="doc_id"):
        chunk_tokens(df, size=4, stride=4, carry=["doc_id"])


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


def test_gopher_filters_rules(spark):
    from ingest_spark.operators.text import gopher_filters

    long_good = "the and of to is in " + " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, long_good),            # passes everything
            (2, "the and short doc"),  # fails word-count floor (4 words)
            (3, "the " * 25 + "and"),  # repetitive: ttr 2/51 < 0.25
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_filters(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["pass_word_count"] is False and rows[2]["keep"] is False
    assert rows[3]["pass_repetition"] is False and rows[3]["keep"] is False
    # per-rule flags stay independently reported
    assert rows[2]["pass_stopwords"] is True


def test_corpus_common_words_topk_and_adaptive_gate(spark):
    """r9: corpus_common_words ranks by DOCUMENT frequency (distinct
    per doc — a word repeated 100x in one doc counts once), breaks
    ties by word ascending, and plugs into gopher_filters as the
    adaptive stopword list."""
    from pyspark.sql import functions as F

    from ingest_spark.operators.text import corpus_common_words, gopher_filters

    df = spark.createDataFrame(
        [
            (1, "zz zz zz zz aa bb"),   # zz repeated: df(zz)=1 here
            (2, "aa bb cc"),
            (3, "aa bb dd"),
            (4, "aa ee ff"),
        ],
        "doc_id long, text string",
    )
    # document frequencies: aa=4, bb=3, cc=dd=ee=ff=zz=1
    got = corpus_common_words(df, "text", k=3).collect()[0]["__common"]
    assert got == ["aa", "bb", "cc"]  # df desc, then word asc; zz's repeats don't rank it

    # adaptive gate: n_stop_distinct = distinct common words present
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa aa dd"), (3, "aa bb ee")],
        "doc_id long, text string",
    )  # df: aa=3, bb=2 -> k=2 common = [aa, bb]
    common = corpus_common_words(docs, "text", k=2)
    flagged = gopher_filters(
        docs.crossJoin(F.broadcast(common)), common_words_col="__common"
    ).collect()
    by_id = {r["doc_id"]: r["n_stop_distinct"] for r in flagged}
    assert by_id == {1: 2, 2: 1, 3: 2}  # aa repeats in doc 2 count once


def test_pack_sequences_bin_boundaries(spark):
    from ingest_spark.operators.text import pack_sequences

    # budget 10: docs of 4,4,4 tokens -> starts 0,4,8 -> bins 0,0,0;
    # doc 4 starts at 12 -> bin 1; second shard packs independently
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("a", 4, 4), ("b", 1, 25)],
        "source string, doc_id long, n_tokens long",
    )
    rows = {(r["source"], r["bin"]): r for r in pack_sequences(df, budget=10).collect()}
    assert rows[("a", 0)]["n_docs"] == 3 and rows[("a", 0)]["total_tokens"] == 12
    assert rows[("a", 1)]["n_docs"] == 1 and rows[("a", 1)]["first_doc"] == 4
    # an oversized doc still lands in the bin of its first token
    assert rows[("b", 0)]["n_docs"] == 1 and rows[("b", 0)]["total_tokens"] == 25


def test_bm25_ranks_term_matches_first(spark):
    from ingest_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark table hash join merge"),
            (2, "spark spark spark row row row"),
            (3, "row scan sort filter agg window"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ("spark", "table")).collect()}
    # doc 1 matches both terms, doc 2 one term, doc 3 none
    assert rows[1] > rows[2] > rows[3] == 0.0


def test_bm25_multiquery_agrees_with_single_query_scorer(spark):
    """bm25_multiquery's inverted-index formulation must reproduce the
    one-pass bm25_scores exactly (to the micro) for each query, and
    rank within each query independently."""
    from ingest_spark.operators.text import bm25_multiquery, bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark table hash join merge"),
            (2, "spark spark spark row row row"),
            (3, "row scan sort filter agg window"),
            (4, "table table window spark scan"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("qa", "spark"), ("qa", "table"), ("qb", "window")],
        "query_id string, term string",
    )
    multi = bm25_multiquery(df, queries, top_k=10).collect()
    by_query = {}
    for r in multi:
        by_query.setdefault(r["query_id"], {})[r["doc_id"]] = r

    for qid, terms in [("qa", ("spark", "table")), ("qb", ("window",))]:
        single = {
            r["doc_id"]: round(r["bm25"] * 1_000_000)
            for r in bm25_scores(df, terms).collect()
            if r["bm25"] > 0
        }
        got = {d: r["bm25_micros"] for d, r in by_query[qid].items()}
        assert got == single, (qid, got, single)
        # ranks: descending micros, doc_id tiebreak, 1-based contiguous
        ranked = sorted(
            by_query[qid].values(), key=lambda r: (-r["bm25_micros"], r["doc_id"])
        )
        assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))

    # zero-match docs are absent (df pruning), not present with 0.0
    assert 3 not in by_query["qa"] and 1 not in by_query["qb"]


def test_misra_gries_exact_when_cardinality_under_k(spark):
    from ingest_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(x,) for x in ["a"] * 50 + ["b"] * 30 + ["c"] * 20], "item string"
    ).repartition(4)
    got = {r["item"]: r["est_count"] for r in heavy_hitters(df, "item", k=8).collect()}
    assert got == {"a": 50, "b": 30, "c": 20}  # no compression => exact


def test_misra_gries_error_bound_compressed_regime(spark):
    """Vocabulary-scale input with k << cardinality: every true heavy
    hitter (freq > n/(k+1)) must survive, and every reported estimate
    must satisfy est <= true <= est + n/(k+1) — the PODS'12 mergeable-
    summaries guarantee, measured against exact counts."""
    from pyspark.sql import functions as F

    from ingest_spark.catalog import load_table
    from ingest_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).repartition(8)
    k = 32
    n = words.count()
    exact = {
        r["w"]: r["c"]
        for r in words.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    est = {
        r["item"]: r["est_count"]
        for r in heavy_hitters(words, "w", k=k).collect()
    }
    assert len(est) <= k
    bound = n / (k + 1)
    for item, e in est.items():
        true = exact[item]
        assert e <= true <= e + bound, (item, e, true, bound)
    for item, true in exact.items():
        if true > bound:
            assert item in est, f"true heavy hitter {item!r} ({true} > {bound:.0f}) missing"


def test_text_operators_survive_null_and_degenerate_docs(spark):
    """Production corpora contain NULL/empty/whitespace-degenerate
    texts; the text/dedup operator family must pass them through
    without throwing (nulls propagate, fallbacks engage) — pinned so
    a refactor can't regress it."""
    from ingest_spark.operators import dedup as _dedup
    from ingest_spark.operators import text

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "word"), (3, "two words"), (4, "a  b"),
         (5, "normal text with several words here")],
        "doc_id long, text string",
    )
    assert df.select(_dedup.shingles("text", 3)).count() == 6
    assert df.select(text.word_ngrams("text", 2)).count() == 6
    assert _dedup.minhash_signatures_df(df, "doc_id", "text", 4, 3).count() == 6
    assert text.quality_score(df).count() == 6
    # non-null docs still get real shingles
    got = {r.doc_id: r.sh for r in df.select(
        "doc_id", _dedup.shingles("text", 3).alias("sh")).collect()}
    assert got[5] and all(len(g.split()) == 3 for g in got[5])
    assert got[2] == ["word"]  # whole-text fallback


# ----------------------------------------------------------- BPE (r6)


def _python_bpe(docs: list[str], n_merges: int, min_pair_count: int = 2):
    """Independent reference BPE (Sennrich et al.): vocab-weighted
    adjacent-pair counts, tiebreak (count desc, pair asc), eager
    left-to-right re-merge."""
    from collections import Counter

    vocab = Counter(w for d in docs for w in d.split(" ") if w)
    syms = {w: list(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        for w in vocab:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            # eager re-merge: merged symbol may combine with the next
            # occurrence chain — re-scan until fixpoint
            while True:
                merged_again = []
                i, changed = 0, False
                while i < len(out):
                    if i + 1 < len(out) and out[i] == l and out[i + 1] == r:
                        merged_again.append(l + r)
                        i += 2
                        changed = True
                    else:
                        merged_again.append(out[i])
                        i += 1
                out = merged_again
                if not changed:
                    break
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_python_reference(spark):
    docs = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    want, want_syms = _python_bpe(docs, n_merges=8)
    got = text.bpe_train(df, n_merges=8)
    assert got == want
    # applying the merges must give the reference tokenizations:
    # n_bpe_tokens per doc == sum of len(syms[word])
    counts = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in text.bpe_tokenize_count(df, got).collect()
    }
    for i, d in enumerate(docs):
        ws = [w for w in d.split(" ") if w]
        assert counts[i] == (len(ws), sum(len(want_syms[w]) for w in ws)), i


def test_bpe_train_respects_min_pair_count_and_empty(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every adjacent pair occurs once -> below min_pair_count=2 -> no merges
    assert text.bpe_train(df, n_merges=5) == []
    got = text.bpe_train(df, n_merges=5, min_pair_count=1)
    assert got and got[0][0] == 0  # deterministic first merge exists


def test_exact_substring_spans_merge_overlapping_seeds(spark, tmp_path):
    """Two docs share a 12-word passage: the three 10-gram seeds (pos
    1,2,3 of the passage) must chain into ONE disjoint span of 12
    words — never three overlapping spans summing to 30."""
    from ingest_spark.queries import exact_substring_spans

    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (0, shared + " " + " ".join(f"a{i}" for i in range(8))),
        (1, " ".join(f"b{i}" for i in range(5)) + " " + shared),
        (2, " ".join(f"c{i}" for i in range(30))),  # no dup content
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"),
         "n_chars": F.length("text")}
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: (r.n_spans, r.dup_words, r.dup_frac_c)
           for r in exact_substring_spans(spark, sf).collect()}
    # doc 0: 20 words, span covers words 1..12 -> frac 6000
    assert got[0] == (1, 12, 6000)
    # doc 1: 17 words, span covers words 6..17 -> 12/17 -> 7058
    assert got[1] == (1, 12, 12 * 10000 // 17)
    assert 2 not in got  # docs with no duplicated span emit nothing


def test_word_ngrams_fast_matches_duckdb_on_multispace_text(spark):
    """The r6 gram refactor aligned every n-gram oracle on the regex
    form's word-RUN semantics (a gram never spans a multi-space gap).
    The sf corpora are single-spaced and can't catch a divergence, so
    this pins Spark vs DuckDB on exactly the divergent input class."""
    import duckdb

    from ingest_spark.queries import _sql_ngrams

    rows = [
        (0, "a b  c d"),        # gap: 'b c' must NOT be a gram
        (1, "  x y  "),         # leading/trailing gaps
        (2, "p  q  r"),         # no adjacent pair at all
        (3, "m n o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.g)
        for r in df.select(
            "doc_id", F.explode(text.word_ngrams_fast("text", 2)).alias("g")
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents_py", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_py")
    want = sorted(map(tuple, con.sql(_sql_ngrams(2)).fetchall()))
    assert got == want == [(0, "a b"), (0, "c d"), (1, "x y"), (3, "m n"), (3, "n o")]


def test_bpe_merge_fold_equals_sql_replace_encoding(spark):
    """The r9 DuckDB oracle encodes the eager left-to-right re-merge
    fold (_merge_pair_expr) as replace() over a double-separator
    token string. Pin the equivalence on the adversarial shapes:
    eager re-merge runs (aaaa), shared-boundary adjacency (abab),
    mid-token false matches (xa+b vs a+b), and merged-token
    neighbors (aa+a)."""
    import duckdb

    from pyspark.sql import functions as F

    from ingest_spark.operators.text import _merge_pair_expr

    cases = [
        (["a", "a", "a", "a"], ("a", "a")),
        (["a", "a", "a"], ("a", "a")),
        (["a", "b", "a", "b"], ("a", "b")),
        (["x" "a", "b"], ("a", "b")),      # 'xa' must NOT merge
        (["xa", "b", "a", "b"], ("a", "b")),
        (["aa", "a"], ("aa", "a")),
        (["a"], ("a", "a")),
        (["x", "y", "y"], ("x", "y")),
    ]
    con = duckdb.connect()
    for toks, (left, right) in cases:
        df = spark.createDataFrame([(toks,)], "syms array<string>")
        spark_out = df.select(
            _merge_pair_expr("syms", left, right).alias("o")
        ).first()["o"]
        s = chr(31) + (chr(31) * 2).join(toks) + chr(31)
        pat = chr(31) + left + chr(31) * 2 + right + chr(31)
        rep = chr(31) + left + right + chr(31)
        sql_out = con.execute(
            "SELECT string_split(trim(replace(?, ?, ?), chr(31)),"
            " chr(31) || chr(31))",
            [s, pat, rep],
        ).fetchone()[0]
        assert spark_out == sql_out, (toks, left, right, spark_out, sql_out)
