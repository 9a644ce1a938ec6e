"""Scale/skew harness for the duplicate-passage formulations
(VERDICT r5 §Next #3): generates a synthetic N-doc corpus entirely
Spark-side, writes it as documents.parquet, and times
`duplicate_passage_fraction` (single hash-keyed window) against
`duplicate_passage_fraction_skewsafe` (salted two-level window) on

  - an UNSKEWED corpus: ~40 words/doc from a 50k vocab, 10% of docs
    carrying a shared 6-word passage (real duplicates to find), max
    gram frequency ~ corpus/10 split across many grams; and
  - a SKEWED corpus: the same, plus ONE boilerplate 5-gram injected
    into EVERY doc — the mega-gram that serializes a plain
    per-gram window through a single task.

Both queries aggregate to a 2-row summary at the end so the timing
covers full plan execution with negligible driver transfer.

Usage: python tools/scale_run_passage.py [n_docs] [unskewed|skewed|both]
Prints one JSON line per (corpus, query) with wall seconds + checksum
(the two formulations' checksums must match — same oracle, same
answer).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, path: str, n_docs: int, skewed: bool) -> None:
    """Full documents-table schema (doc_id, text, lang, source,
    n_chars) so any documents query runs against it: ~40 pseudo-random
    words/doc (xxhash64-derived, 50k vocab); every 10th doc appends a
    shared passage; the skewed variant prepends the same 5 boilerplate
    words to EVERY doc."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)).cast("string"),
        ),
    )
    text = F.array_join(words, " ")
    shared = F.when(
        F.col("id") % 10 == 0,
        F.lit(" alpha beta gamma delta epsilon zeta"),
    ).otherwise(F.lit(""))
    if skewed:
        text = F.concat(F.lit("the same five boilerplate words "), text, shared)
    else:
        text = F.concat(text, shared)
    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")])
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.element_at(langs, (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"))
            .alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20))).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )


def time_query(spark, name: str, sf_dir: str) -> dict:
    from ingest_spark.queries import QUERIES

    t0 = time.perf_counter()
    row = (
        QUERIES[name](spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_dup_grams").alias("sum_dup"),
            F.sum("n_grams").alias("sum_grams"),
        )
        .collect()[0]
    )
    wall = round(time.perf_counter() - t0, 2)
    return {
        "query": name,
        "wall_sec": wall,
        "n_docs": row.n_docs,
        "checksum": (row.sum_dup, row.sum_grams),
    }


def run(n_docs: int, which: str = "both", spark=None) -> list[dict]:
    """Run the passage A/B and append one SCALE_RUNS.jsonl line per
    (corpus, query) via tools.scale_runs.record (VERDICT r6 §Next #6);
    also prints each line for interactive use. Returns the entries."""
    from tools import scale_runs

    own_spark = spark is None
    if own_spark:
        from ingest_spark.session import get_spark

        spark = get_spark("passage-scale-run")
    corpora = ["unskewed", "skewed"] if which == "both" else [which]
    entries = []
    for corpus in corpora:
        workdir = tempfile.mkdtemp(prefix=f"passage_{corpus}_")
        try:
            build_corpus(spark, f"{workdir}/documents.parquet", n_docs,
                         skewed=(corpus == "skewed"))
            results = [
                time_query(spark, q, workdir)
                for q in ("duplicate_passage_fraction",
                          "duplicate_passage_fraction_skewsafe")
            ]
            agree = results[0]["checksum"] == results[1]["checksum"]
            for r in results:
                entry = scale_runs.record({
                    "op": r["query"],
                    "params": {"study": "passage_skew_ab",
                               "corpus": corpus, "n_docs": n_docs},
                    "wall_sec": r["wall_sec"],
                    "checksum": list(r["checksum"]),
                    "agree": agree,
                })
                print(json.dumps(entry, sort_keys=True))
                entries.append(entry)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    if own_spark:
        spark.stop()
    return entries


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    run(n_docs, which)


if __name__ == "__main__":
    main()
