"""Artifact persistence: learned state (weights, merges, codebooks)
round-trips through the data plane and reproduces identical results.
"""

from __future__ import annotations

import pytest

from ingest_spark import artifacts
from ingest_spark.operators import classifier, similarity, text
from tests.test_classifier import _separable_corpus


def test_classifier_weights_round_trip_identical_scores(spark, tmp_path):
    docs = _separable_corpus(spark, n=40)
    w = classifier.train_logreg(docs, "label", iterations=100)
    path = str(tmp_path / "clf")
    artifacts.save_artifact(spark, path, "quality_clf", w)
    name, w2 = artifacts.load_artifact(spark, path, expect_name="quality_clf")
    assert w2 == w  # float fidelity through JSON repr
    a = {r.doc_id: r.quality_prob for r in classifier.score_docs(docs, w).collect()}
    b = {r.doc_id: r.quality_prob for r in classifier.score_docs(docs, w2).collect()}
    assert a == b


def test_bpe_merges_round_trip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "low low lower newest newest")], "doc_id long, text string"
    )
    merges = text.bpe_train(docs, n_merges=4, min_pair_count=1)
    path = str(tmp_path / "bpe")
    artifacts.save_artifact(spark, path, "bpe", merges)
    _, loaded = artifacts.load_artifact(spark, path)
    # JSON turns tuples into lists; the tokenizer consumes either
    assert [tuple(m) for m in loaded] == merges
    a = text.bpe_tokenize_count(docs, merges).collect()
    b = text.bpe_tokenize_count(docs, [tuple(m) for m in loaded]).collect()
    assert a == b


def test_pq_codebooks_round_trip(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(64)
    books = similarity.pq_codebooks(emb, m=8, codebook_k=8)
    path = str(tmp_path / "pq")
    artifacts.save_artifact(spark, path, "pq_books", books)
    _, loaded = artifacts.load_artifact(spark, path)
    assert loaded == books
    a = {r.neighbor_id: list(r["__codes"]) for r in similarity.pq_encode(emb, books).collect()}
    b = {r.neighbor_id: list(r["__codes"]) for r in similarity.pq_encode(emb, loaded).collect()}
    assert a == b


def test_load_guards_name_and_shape(spark, tmp_path):
    path = str(tmp_path / "a")
    artifacts.save_artifact(spark, path, "right", [1, 2, 3])
    with pytest.raises(ValueError, match="name"):
        artifacts.load_artifact(spark, path, expect_name="wrong")
