"""Double-evaluation pin study (r11, VERDICT r10 §Next #1/#2): the
registry audit found six queries whose derived fact-grain frame was
referenced twice (probe + broadcast total) and re-executed in full —
Spark dedupes nothing beyond ReuseExchange. Each now pins the shared
frame with localCheckpoint(). This measures the fix directly: for the
three most expensive offenders, time the PINNED registry shape vs the
UNPINNED pre-r11 shape on the same data, assert both produce the
identical result fingerprint, and record one ledger line.

Usage: python tools/doubleeval_ab.py [sf_dir]   (default /tmp/sf1)

Methodology: one untimed warm-up of each variant first (JIT/classload
skews first runs ~2x — memory: A/B studies warm the JVM and measure
both variants after), then 2 timed passes each, min reported.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ingest_spark.session import get_spark
from ingest_spark.catalog import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
spark = get_spark("doubleeval_ab")


def _checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.to_json(F.struct(*df.columns)))).alias("crc"),
    ).collect()[0]
    return (int(r["n"]), int(r["crc"]) if r["crc"] is not None else None)


def q15(pin: bool):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    if pin:
        revenue = revenue.localCheckpoint()
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def basket(pin: bool):
    post = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    if pin:
        post = post.localCheckpoint()
    n_orders = post.agg(F.count_distinct("l_orderkey").alias("n"))
    freq = post.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    co = (
        post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    return (
        co.crossJoin(F.broadcast(n_orders))
        .join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_co",
            (
                F.expr("CAST(n_co * n * 1000000 DIV (fa * fb) AS BIGINT)")
                .cast("double")
                / 1000000
            ).alias("lift"),
        )
    )


def unigram(pin):
    """pin: False = pre-r11 (3 corpus explodes), 'derived' = total
    from the vocab agg but NO checkpoint (vocab subtree referenced 2x,
    ReuseExchange's call), True = total from the PINNED vocab."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    if pin is True:
        freq = freq.localCheckpoint()
    if pin:
        total = freq.agg(F.sum("__c").alias("__t"))
    else:
        total = words.agg(F.count(F.lit(1)).cast("double").alias("__t"))
    lp = F.round(F.log(F.col("__c") / F.col("__t")) * 1_000_000).cast("long")
    scored = (
        words.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("__lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.expr("CAST(-sum(__lp) DIV count(*) AS BIGINT)").alias(
            "avg_neg_logprob_micros"
        ),
    )


def corpus(pin: bool):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.size(F.split("text", " ")).cast("long")
    )
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("tokens"),
    )
    if pin:
        g = g.localCheckpoint()
    total = g.agg(F.sum("tokens").alias("total"))
    return g.crossJoin(F.broadcast(total)).select(
        "lang",
        "source",
        "n_docs",
        "tokens",
        (
            (F.col("tokens") * 1000000 / F.col("total"))
            .cast("long")
            .cast("double")
            / 1000000
        ).alias("token_share"),
    )


def pmi(pin):
    """pin: False = nothing pinned, 'uni' = vocab table only, True =
    vocab + pair table."""
    from ingest_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    uni = words.groupBy("word").agg(F.count(F.lit(1)).alias("__cu"))
    if pin:
        uni = uni.localCheckpoint()
    tot = uni.agg(F.sum("__cu").alias("__n"))
    pair_counts = (
        docs.select(F.explode(text.word_ngrams_fast("text", 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    if pin is True:
        pair_counts = pair_counts.localCheckpoint()
    ptot = pair_counts.agg(F.sum("n_pair").alias("__np"))
    pairs = (
        pair_counts.crossJoin(F.broadcast(ptot))
        .filter(
            F.col("n_pair")
            >= F.greatest(F.lit(5), F.floor(F.col("__np") / 2000))
        )
        .drop("__np")
        .withColumn("__a", F.split("pair", " ")[0])
        .withColumn("__b", F.split("pair", " ")[1])
    )
    ua = uni.select(F.col("word").alias("__a"), F.col("__cu").alias("__ca"))
    ub = uni.select(F.col("word").alias("__b"), F.col("__cu").alias("__cb"))
    pmi_col = (
        F.round(
            F.log(
                (F.col("n_pair").cast("double") * F.col("__n"))
                / (F.col("__ca") * F.col("__cb"))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("pmi_micros")
    )
    return (
        pairs.join(ua, "__a")
        .join(ub, "__b")
        .crossJoin(F.broadcast(tot))
        .select("pair", "n_pair", pmi_col)
        .orderBy(F.desc("pmi_micros"), "pair")
        .limit(50)
    )


STUDIES = {
    "tpch_q15": q15,
    "market_basket": basket,
    "unigram_logprob": unigram,
    "corpus_composition": corpus,
    "pmi_collocations": pmi,
}

results = {}
for name, build in STUDIES.items():
    variants = [("unpinned", False), ("pinned", True)]
    if name == "unigram_logprob":
        variants.insert(1, ("derived", "derived"))
    if name == "pmi_collocations":
        variants.insert(1, ("uni_only", "uni"))
    # warm every shape once (untimed)
    for _, pin in variants:
        _checksum(build(pin))
    walls = {}
    sums = {}
    for label, pin in variants:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            ck = _checksum(build(pin))
            times.append(time.perf_counter() - t0)
        walls[label] = round(min(times), 3)
        sums[label] = ck
    assert len(set(sums.values())) == 1, (name, sums)
    results[name] = {
        **{f"{k}_sec": v for k, v in walls.items()},
        "speedup": round(walls["unpinned"] / walls["pinned"], 2),
        "checksum": sums["pinned"],
    }
    print(
        f"{name}: "
        + " ".join(f"{k}={v}s" for k, v in walls.items())
        + f" ({results[name]['speedup']}x), identical checksums"
    )

from tools.scale_runs import record

record(
    {
        "op": "doubleeval_pin_ab",
        "params": {"study": "doubleeval_r11", "sf_dir": sf_dir,
                   "passes": 2, "sink": "checksum"},
        "wall_sec": sum(v["pinned_sec"] for v in results.values()),
        "checksum": {k: v["checksum"] for k, v in results.items()},
        "results": results,
    }
)
print("ledger recorded")
spark.stop()
