"""Machine-recorded scale-run ledger (VERDICT r6 §Next #6).

BASELINE.md's 2M-doc / 1M-vector / hub-graph numbers used to be
hand-transcribed one-shots; this module makes every scale/skew study
append ONE JSON line per (op, corpus/variant) to ``SCALE_RUNS.jsonl``
at the repo root, so scale regressions become diffable round-over-round
the same way the sf0.1 bench already is.

Ledger line contract (smoke-tested in tests/test_scale_runs.py):

    {"ts": "2026-08-14T12:00:00Z", "op": "<operator/study name>",
     "params": {...corpus/variant knobs...}, "wall_sec": 12.3,
     "checksum": <JSON-serializable answer fingerprint>, ...extras}

``checksum`` is whatever the study uses to prove two formulations (or
two rounds) computed the SAME answer — counts, sum tuples, hashes.

CLI: ``python tools/scale_runs.py [cheap|passage|triangles]`` re-runs
the cheap subset of the recorded studies (sized to finish in a couple
of minutes on local[32]) and appends fresh entries — the round's
closing step runs this so the ledger always has current-round rows.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO_ROOT, "SCALE_RUNS.jsonl")
REQUIRED = ("ts", "op", "params", "wall_sec", "checksum")


def record(entry: dict, path: str | None = None) -> dict:
    """Validate + append one ledger line; returns the completed entry
    (with ``ts`` stamped if the caller didn't provide one). Raises
    ValueError on a missing required key or non-serializable value so
    a broken study fails loudly instead of writing junk."""
    entry = dict(entry)
    entry.setdefault(
        "ts",
        datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    )
    missing = [k for k in REQUIRED if k not in entry]
    if missing:
        raise ValueError(f"scale-run entry missing keys: {missing}")
    if not isinstance(entry["params"], dict):
        raise ValueError("params must be a dict of corpus/variant knobs")
    line = json.dumps(entry, sort_keys=True)  # raises on junk values
    with open(path or LEDGER, "a") as fh:
        fh.write(line + "\n")
    return entry


def read_ledger(path: str | None = None) -> list[dict]:
    p = path or LEDGER
    if not os.path.exists(p):
        return []
    with open(p) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def timed(fn):
    """Run ``fn`` and return (result, wall_sec)."""
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "cheap"
    sys.path.insert(0, REPO_ROOT)
    # cheap subset: sized so the whole re-run is minutes, not the
    # full 2M-doc studies (those stay on-demand via their own CLIs)
    if which in ("cheap", "passage"):
        from tools import scale_run_passage

        scale_run_passage.run(n_docs=200_000, which="both")
    if which in ("cheap", "triangles"):
        from tools import scale_run_triangles

        # both regimes: modest hub (orientation overhead not repaid)
        # and corpus-wide hub (id order serializes ~625M wedges
        # through one key; degree order measured 4.1x faster r7)
        scale_run_triangles.run(n_nodes=20_000, hub_frac=0.4)
        scale_run_triangles.run(n_nodes=50_000, hub_frac=1.0)


if __name__ == "__main__":
    main()
