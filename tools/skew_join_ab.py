"""Skew-join A/B: plain SMJ vs AQE skew-split vs explicit salting on a
deliberately skewed fact-dim join (one key carries 40% of the fact)."""
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ingest_spark.session import get_spark
from ingest_spark.operators.relational import salted_join

spark = get_spark('skewab')
N_FACT, N_DIM = 20_000_000, 200_000
# 40% of fact rows hit key 0; rest uniform over dim keys
fact = spark.range(N_FACT).select(
    F.when(F.col('id') % 5 < 2, F.lit(0))
     .otherwise(F.pmod(F.xxhash64('id'), F.lit(N_DIM))).alias('key'),
    (F.col('id') % 1000).alias('v'))
dim = spark.range(N_DIM).select(F.col('id').alias('key'),
                                (F.col('id') % 97).alias('w'))
fact.write.mode('overwrite').parquet('/tmp/skew_fact.parquet')
dim.write.mode('overwrite').parquet('/tmp/skew_dim.parquet')
fact = spark.read.parquet('/tmp/skew_fact.parquet')
dim = spark.read.parquet('/tmp/skew_dim.parquet')

def run(label, skew_on, salted):
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
    spark.conf.set('spark.sql.adaptive.skewJoin.enabled', str(skew_on).lower())
    t0 = time.perf_counter()
    j = salted_join(fact, dim, 'key') if salted else fact.join(dim, 'key')
    r = j.agg(F.count(F.lit(1)), F.sum(F.col('v') * F.col('w'))).collect()[0]
    print(f"{label}: {time.perf_counter()-t0:.1f}s checksum={tuple(r)}")

run('plain SMJ, AQE skew OFF', False, False)
run('SMJ + AQE skew-join ON ', True, False)
run('salted_join (16 buckets)', True, True)
spark.stop()
