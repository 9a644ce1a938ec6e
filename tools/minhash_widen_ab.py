"""Signature-widening study at sf10: the sf1 evidence run found that
the FIXED 4-hash/2-band MinHash signature saturates as the corpus
grows (candidate pairs 604 -> 35,855 for 10x docs — random band
collisions add a quadratic term), and BASELINE.md claims the 100-TB
fix is to widen the signature with the corpus, changing only literals
in the same banded-join plan. This measures that claim directly at
sf10 (500k docs): candidate counts and wall for the narrow bench
signature vs two widened ones (same bands-of-2 recall geometry for
the planted >=0.5-Jaccard near-dups, more rows per band for
precision on the widest).

  narrow   4 hashes / 2 bands (rows=2)  — the saturated bench literal
  widened 16 hashes / 8 bands (rows=2)  — same per-band r, 4x bands
  strict  16 hashes / 4 bands (rows=4)  — doubled rows per band

Usage: python tools/minhash_widen_ab.py [sf_dir]
"""
import sys, time
sys.path.insert(0, '/root/repo')
from ingest_spark.session import get_spark
from ingest_spark.catalog import load_table
from ingest_spark.operators import dedup

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf10'
spark = get_spark('minhash_widen_ab')
docs = load_table(spark, sf_dir, 'documents')
n_docs = docs.count()
print(f'{sf_dir}: {n_docs} docs')

VARIANTS = {
    'narrow_4h_2b': (4, 2),
    'widened_16h_8b': (16, 8),
    'strict_16h_4b': (16, 4),
}

results = {}
for label, (nh, nb) in VARIANTS.items():
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_candidates(
        docs, 'doc_id', 'text', num_hashes=nh, bands=nb, shingle_n=3
    )
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    results[label] = {'num_hashes': nh, 'bands': nb, 'rows_per_band': nh // nb,
                      'n_pairs': n_pairs, 'wall_sec': round(wall, 2)}
    print(f'{label}: pairs={n_pairs} wall={wall:.1f}s')

from tools.scale_runs import record
record({
    'op': 'minhash_signature_widening',
    'params': {'study': 'minhash_widen_r9', 'sf_dir': sf_dir,
               'n_docs': n_docs, 'variants': results},
    'wall_sec': results['strict_16h_4b']['wall_sec'],
    'checksum': {k: v['n_pairs'] for k, v in results.items()},
})
print('ledger recorded')
spark.stop()
