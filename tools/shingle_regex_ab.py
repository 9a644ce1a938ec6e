"""A/B: consuming-regex shingle generator vs the r6 lookbehind form
(VERDICT r12 §Next #3 — the "substring-slice shingle generator" lever
on the surviving duplicate_passages path, resolved as a regex-shape
change rather than a slice rewrite: the profile at sf0.1 put ~80% of
duplicate_passages in the gram-extraction scan, not the shuffle, and
the higher-order transform+slice form re-measured 4x SLOWER, matching
the r6 docstring's interpreted-vs-codegen gap).

Old: ``(?<=^| )(?=(gram))``      — variable-width lookbehind anchor,
                                   probed at every character.
New: ``(?=(gram))[^ ]+ ?``       — capture the gram ahead, consume one
                                   word; the matcher skips word-by-word.

Output equality was verified per-doc over sf0.1 for n=2/3/5 plus
multi-space edge fuzz (a mid-word probe only happens after a word-start
failure and sees the same token structure, so it fails identically).
This tool times the two full registry queries that lean on gram
extraction at a given SF dir and appends ledger lines with matching
checksums.

Usage: python tools/shingle_regex_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _checksum(df):
    agg = [F.count(F.lit(1)).alias("rows")]
    for f in df.schema.fields:
        k = f.dataType.typeName()
        if k in ("long", "integer", "double", "float", "decimal"):
            agg.append(F.sum(F.col(f.name).cast("double")).alias(f.name))
        elif k == "string":
            agg.append(
                F.sum(F.crc32(F.col(f.name).cast("binary")).cast("double")).alias(f.name)
            )
    r = df.agg(*agg).collect()[0].asDict()
    return {k: (round(v, 4) if isinstance(v, float) else v) for k, v in r.items()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from ingest_spark import queries as Q
    from ingest_spark.operators import dedup, text
    from ingest_spark.session import get_spark
    from tools.scale_runs import record, timed

    spark = get_spark()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    old_pat = lambda n: r"(?<=^| )(?=((?:[^ ]+ ){" + str(n - 1) + r"}[^ ]+))"  # noqa: E731
    new_pat = lambda n: r"(?=((?:[^ ]+ ){" + str(n - 1) + r"}[^ ]+))[^ ]+ ?"  # noqa: E731

    def shingles_with(pat):
        def sh(col, n=3):
            c = F.col(col) if isinstance(col, str) else col
            g = F.array_distinct(F.regexp_extract_all(c, F.lit(pat(n)), 1))
            return F.when(F.size(g) > 0, g).otherwise(F.array(c))

        return sh

    def ngrams_with(pat):
        def ng(col, n):
            c = F.col(col) if isinstance(col, str) else col
            return F.regexp_extract_all(c, F.lit(pat(n)), 1)

        return ng

    for qname in ("duplicate_passages", "exact_substring_spans"):
        fn = Q.QUERIES[qname]
        results = {}
        for variant, pat in (("lookbehind_r6", old_pat), ("consuming_r13", new_pat)):
            dedup.shingles = shingles_with(pat)
            text.word_ngrams_fast = ngrams_with(pat)
            best = None
            for _ in range(reps):
                cs, wall = timed(lambda: _checksum(fn(spark, sf_dir)))
                best = wall if best is None else min(best, wall)
            results[variant] = (best, cs)
            record(
                {
                    "op": f"shingle_regex_ab:{qname}",
                    "params": {"sf_dir": sf_dir, "n_docs": n_docs,
                               "variant": variant, "reps": reps},
                    "wall_sec": best,
                    "checksum": cs,
                }
            )
            print(f"{qname:28s} {variant:16s} {best:8.2f}s  {cs}")
        a, b = results["lookbehind_r6"], results["consuming_r13"]
        assert a[1] == b[1], f"{qname}: checksum mismatch {a[1]} vs {b[1]}"
        print(f"{qname}: speedup {a[0] / b[0]:.2f}x, checksums identical")
    spark.stop()


if __name__ == "__main__":
    main()
