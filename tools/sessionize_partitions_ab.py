"""Sessionize shuffle-width A/B at sf10: the sf10 evidence run showed
sessionize_events at 12.5x wall for 10x data with shuffle.partitions
held at 32 (the fixed bench setting). The claim recorded in
BASELINE.md is that the extra factor is per-partition sort spill, so
widening the shuffle (what a real cluster tune does at 10x data)
restores ~linear scaling. This measures that directly: same query,
same data, shuffle.partitions in {32, 128, 256}, steady-state (2nd
run of each after a warm-up), checksum-compared.

Usage: python tools/sessionize_partitions_ab.py [sf_dir]
"""
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ingest_spark.session import get_spark
from ingest_spark.queries import QUERIES

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf10'
spark = get_spark('sessionize_ab')
qfn = QUERIES['sessionize_events']

def run_once(parts):
    spark.conf.set('spark.sql.shuffle.partitions', str(parts))
    t0 = time.perf_counter()
    df = qfn(spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias('n'),
        F.sum(F.col('n_events')).alias('sum_ev'),
        F.sum(F.crc32(F.concat_ws('|', 'user_id', 'session_id', 'n_events'))).alias('crc'),
    ).collect()[0]
    return time.perf_counter() - t0, (agg['n'], agg['sum_ev'], agg['crc'])

results = {}
run_once(32)  # JVM/codegen warm-up, discarded
for parts in (32, 128, 256):
    walls = []
    checks = set()
    for _ in range(2):
        w, c = run_once(parts)
        walls.append(round(w, 2))
        checks.add(c)
    assert len(checks) == 1, f'nondeterministic checksum at {parts}: {checks}'
    results[parts] = {'walls': walls, 'steady': min(walls), 'checksum': list(checks)[0]}
    print(f'partitions={parts}: walls={walls} checksum={list(checks)[0]}')

base = results[32]['steady']
for parts, r in results.items():
    print(f'partitions={parts}: steady={r["steady"]:.2f}s  speedup vs 32 = {base/r["steady"]:.2f}x')

checks = {tuple(r['checksum']) for r in results.values()}
assert len(checks) == 1, f'checksum drift across widths: {checks}'

from tools.scale_runs import record
record({
    'op': 'sessionize_shuffle_width_ab',
    'params': {
        'study': 'sessionize_partitions_ab_r9', 'sf_dir': sf_dir,
        'widths': {str(k): r['walls'] for k, r in results.items()},
        'steady': {str(k): r['steady'] for k, r in results.items()},
    },
    'wall_sec': results[256]['steady'],
    'checksum': list(results[32]['checksum']),
})
print('ledger recorded')
spark.stop()
