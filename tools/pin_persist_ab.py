"""Pin-primitive A/B: persist(MEMORY_AND_DISK) vs localCheckpoint vs
unpinned, on the six audited double-evaluation queries (r12, VERDICT
r11 §Next #2 / §Wrong #1; ADVICE r11).

The r11 doubleeval study measured PINNED vs UNPINNED and kept
localCheckpoint even where neutral. The open question is the
PRIMITIVE: localCheckpoint truncates lineage onto non-reliable
executor storage (executor loss after the pin = job abort, and it is
incompatible with dynamic allocation), while persist keeps lineage
(loss = recompute). If persist costs the same, it strictly dominates
for the 100-TB posture. This measures the REGISTRY functions
themselves — the pin primitive is flipped via ingest_spark.pinning's
module global, so the timed code is exactly what ships.

Methodology: engine-only checksum sink, one untimed warm-up per
(query, mode), then N timed passes, min reported; identical checksums
asserted across all modes per query. Persist caches are dropped
between passes (spark.catalog.clearCache()) so every pass measures a
cold pin build + downstream reads, like the other modes.

Usage: python tools/pin_persist_ab.py [sf_dir] [passes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from ingest_spark import pinning
from ingest_spark.queries import QUERIES
from ingest_spark.session import get_spark
from tools import scale_runs

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("pin_persist_ab")

# the six r11 audit queries (PLANS.md §Registry audit) — winners and
# neutrals both: if persist matches localCheckpoint on the WINNERS
# too, the lineage-keeping primitive wins everywhere
AUDITED = [
    "tpch_q15_top_supplier",
    "tpch_q11_important_stock",
    "tpch_q21_waiting_supplier",
    "market_basket_lift",
    "corpus_composition",
    "unigram_logprob_score",
    "pmi_collocations",
]

MODES = ["local_checkpoint", "persist", "none"]


def run(name):
    r = bench._checksum_sink(QUERIES[name](spark, sf_dir))
    return (int(r["n"]), int(r["crc"]) if r["crc"] is not None else None)


for name in AUDITED:
    checks = {}
    walls = {}
    for mode in MODES:
        pinning.PIN_MODE = mode
        try:
            checks[mode] = run(name)  # warm-up + checksum record
            t = []
            for _ in range(passes):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                c = run(name)
                t.append(time.perf_counter() - t0)
                assert c == checks[mode], (name, mode, c, checks[mode])
            walls[mode] = round(min(t), 2)
        finally:
            pinning.PIN_MODE = "auto"
        spark.catalog.clearCache()
    assert len(set(checks.values())) == 1, (name, checks)
    for mode in MODES:
        scale_runs.record(
            {
                "op": f"{name}_{mode}",
                "params": {
                    "study": "pin_mode_ab",
                    "sf_dir": sf_dir,
                    "passes": passes,
                },
                "wall_sec": walls[mode],
                "checksum": list(checks[mode]),
                "agree": True,
            }
        )
    lc, pe, no = (
        walls["local_checkpoint"],
        walls["persist"],
        walls["none"],
    )
    print(
        f"{name}: local_checkpoint={lc}s persist={pe}s none={no}s "
        f"persist_vs_lc={round(lc / pe, 3)}x pin_vs_none={round(no / pe, 3)}x"
    )

spark.stop()
