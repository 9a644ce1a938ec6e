"""Per-batch cost flatness study for the persist-and-resume ingest
(ingest_spark.incremental): seed a corpus, commit N batches of
ROWS_PER_BATCH synthetic docs, and record each batch's wall. The
claim under test: per-batch cost does NOT grow with committed
history — every batch joins against key-partitioned state tables
whose probe cost is batch-sized, so the curve is flat (or slightly
decreasing as the JVM warms).

First recorded for r8 under the 4-hash/2-band constants (ledger op
incremental_ingest_flatness); this tool re-establishes the result
under whatever NUM_HASHES/BANDS the module currently declares (r9:
16/4 — the bands state holds 2x the rows per kept doc vs r8).

Usage: python tools/incremental_flatness.py [n_batches] [rows_per_batch]
"""
import sys, time, tempfile, shutil
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ingest_spark.session import get_spark
from ingest_spark import incremental

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 15
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

spark = get_spark('flatness')

def synth_docs(batch: int):
    # deterministic docs of 12 pseudo-random words each (no shared
    # core — a common phrase would make every doc an LSH bucket-mate
    # of every other and measure a pathological hub, not ingest).
    # 5% of each batch >0 exactly repeats a batch-0 doc so the exact
    # and near probes both do real work.
    eff_id = F.when(
        (F.lit(batch) > 0) & (F.col('id') % 20 == 0), F.col('id')
    ).otherwise(F.lit(batch) * ROWS + F.col('id'))
    words = [
        F.conv(
            F.substring(F.sha2(F.concat_ws('-', eff_id.cast('string'), F.lit(str(w))), 256), 1, 12),
            16, 36,
        )
        for w in range(12)
    ]
    return spark.range(ROWS).select(
        (F.lit(batch) * ROWS + F.col('id')).alias('doc_id'),
        F.concat_ws(' ', *words).alias('text'),
    )

state = tempfile.mkdtemp(prefix='flatness_state_')
try:
    t0 = time.perf_counter()
    incremental.init_state(spark, synth_docs(0), state)
    init_wall = round(time.perf_counter() - t0, 2)
    print(f'init: {init_wall}s', flush=True)

    per_batch = []
    for b in range(1, N_BATCHES + 1):
        t0 = time.perf_counter()
        dec = incremental.ingest_and_commit(spark, synth_docs(b), state, b)
        n_kept = dec.filter('kept').count()
        per_batch.append(round(time.perf_counter() - t0, 2))
        print(f'batch {b}: {per_batch[-1]}s kept={n_kept}', flush=True)

    sizes = {
        t: spark.read.parquet(f'{state}/{t}').count()
        for t in ('hashes', 'bands', 'bloom', 'novelty')
    }
    first5 = round(sum(per_batch[:5]) / 5, 2)
    last5 = round(sum(per_batch[-5:]) / 5, 2)
    print('sizes', sizes, 'first5', first5, 'last5', last5)

    from tools.scale_runs import record
    record({
        'op': 'incremental_ingest_flatness',
        'params': {
            'study': 'per-batch cost vs committed history (re-run under widened signature)',
            'num_hashes': incremental.NUM_HASHES, 'bands': incremental.BANDS,
            'n_batches': N_BATCHES, 'rows_per_batch': ROWS,
            'init_wall_sec': init_wall,
            'mean_first5_sec': first5, 'mean_last5_sec': last5,
            'ratio_last5_over_first5': round(last5 / first5, 2),
        },
        'wall_sec': round(sum(per_batch), 2),
        'checksum': {'per_batch_sec': per_batch, 'state_rows_final': sizes},
    })
    print('ledger recorded')
finally:
    shutil.rmtree(state, ignore_errors=True)
    spark.stop()
