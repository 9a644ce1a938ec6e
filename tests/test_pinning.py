"""pin() policy + mode-independence gates (r12, VERDICT r11 §Next #2).

The policy itself (reliable checkpoint on a cluster dir / local
checkpoint under a local master / persist-with-lineage otherwise) is
documented and A/B-justified in ingest_spark/pinning.py; these tests
pin the RESOLUTION LOGIC and that every primitive yields identical
results, so a policy regression can't silently change either the
fault posture or an answer.
"""

from pyspark.sql import functions as F

from ingest_spark import pinning


def _frame(spark):
    return (
        spark.range(1000)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )


def test_auto_resolves_local_checkpoint_under_local_master(spark):
    df = _frame(spark)
    assert spark.sparkContext.master.startswith("local")
    assert pinning.resolve_mode(df) == "local_checkpoint"


def test_auto_resolves_reliable_checkpoint_when_dir_set(spark, tmp_path):
    df = _frame(spark)
    sc = spark.sparkContext
    assert pinning.resolve_mode(df) == "local_checkpoint"
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        # the cluster posture: fault-tolerant storage wins over every
        # other primitive, local master or not
        assert pinning.resolve_mode(df) == "reliable_checkpoint"
        pinned = pinning.pin(df)
        assert pinned.count() == 7
    finally:
        # restore the shared session (no public unset API — the
        # SparkContext field setter through py4j)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.empty()
        )
    assert pinning.resolve_mode(df) == "local_checkpoint"


def test_forced_mode_overrides_auto(spark, monkeypatch):
    df = _frame(spark)
    for mode in ("persist", "local_checkpoint", "none"):
        monkeypatch.setattr(pinning, "PIN_MODE", mode)
        assert pinning.resolve_mode(df) == mode
    monkeypatch.setattr(pinning, "PIN_MODE", "none")
    assert pinning.pin(df) is df  # unpinned passthrough


def test_every_primitive_yields_identical_results(spark, monkeypatch):
    want = {(r.k, r.s) for r in _frame(spark).collect()}
    for mode in ("persist", "local_checkpoint", "none"):
        monkeypatch.setattr(pinning, "PIN_MODE", mode)
        pinned = pinning.pin(_frame(spark))
        got = {(r.k, r.s) for r in pinned.collect()}
        assert got == want, mode
        # a pinned frame is re-usable across references
        assert pinned.count() == 7
    spark.catalog.clearCache()
