"""Generate the query/oracle counts INTO the docs from the live
registry (VERDICT r5 §Next #1: hand-edited counts drifted twice; a
generator cannot). Rewrites every "N `queries()` entries / M with
DuckDB oracles" and "N queries, M DuckDB oracles"-shaped claim in
SURVEY.md and README.md to the current `len(QUERIES)` / `len(ORACLES)`.

Run after adding or removing a registered query:
    python tools/sync_doc_counts.py
Idempotent; prints what changed. tests/test_doc_counts.py is the gate
that fails the build when this was forgotten.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_spark.queries import ORACLES, QUERIES  # noqa: E402

NQ, NO = len(QUERIES), len(ORACLES)

REWRITES = [
    # SURVEY.md status line: "146 `queries()` entries,\n143 with DuckDB oracles"
    (
        r"\d+\s+`queries\(\)`\s+entries,\s*\n?\s*\d+ with DuckDB oracles",
        f"{NQ} `queries()` entries,\n{NO} with DuckDB oracles",
    ),
    # README tree line: "146 queries, 143 DuckDB oracles"
    (r"\d+ queries, \d+ DuckDB oracles", f"{NQ} queries, {NO} DuckDB oracles"),
    # README prose: "143/146 queries are oracle-checked"
    (r"\d+/\d+ queries are oracle-checked", f"{NO}/{NQ} queries are oracle-checked"),
]


def sync(path: str) -> bool:
    text = open(path).read()
    out = text
    for pat, repl in REWRITES:
        out = re.sub(pat, repl, out)
    if out != text:
        open(path, "w").write(out)
    return out != text


def main() -> None:
    for path in ("/root/repo/SURVEY.md", "/root/repo/README.md"):
        changed = sync(path)
        print(f"{path}: {'updated' if changed else 'already in sync'} "
              f"(queries={NQ}, oracles={NO})")


if __name__ == "__main__":
    main()
