"""Relational query surface (extension E6) + as-of join.

The reference delegates querying to ksqlDB / an interactive PySpark
pod (SURVEY §2.1 Q1, §2.2 E6); here the full DataFrame surface IS the
engine, so this module only adds the operators Spark lacks as
built-ins, plus scale-aware join helpers.

Join-strategy notes (for the 1000-executor mental model):
- dim tables (region/nation/part-ish sizes) -> ``broadcast()``: no
  shuffle of the fact side at all.
- fact-fact joins -> shuffle hash/sort-merge on the key; pre-bucketing
  both sides on the join key (``bucket_write``) removes the shuffle
  from every subsequent join at the cost of one write-time shuffle.
- skewed keys -> AQE skew-join splitting is on by default (session.py);
  ``salted_join`` is the explicit fallback for pathological skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the ``on`` partition.

    Implementation: union the two sides tagged, one window sort per
    partition key, ``last(ignorenulls)`` carries the most recent right
    values forward onto left rows. One shuffle on ``on`` total —
    compare with the naive range-join (quadratic within key).
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # The right row travels as ONE struct: carrying each column forward
    # independently with last(ignorenulls) would splice values from
    # DIFFERENT right rows whenever a right column is null (fabricating
    # (ts, value) tuples that never co-occurred). last() over the
    # struct is all-or-nothing — always a genuine right row.
    rt = (
        right.select(
            *on,
            F.struct(
                F.col(right_ts).alias(right_ts),
                *[F.col(c) for c in right_cols],
            ).alias("__right_row"),
            F.col(right_ts).alias("__ts"),
        )
        .withColumn("__side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__asof", F.last("__right_row", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(f"__asof.{c}").alias(c + suffix)
            for c in right_cols + [right_ts]
        ],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster: explode the dim side ``salt_buckets``x, salt the
    fact key randomly-but-deterministically (hash of full row), join on
    (key, salt). Use only when AQE's skew split is insufficient.

    Only fact-preserving join types are valid: the dim side is
    replicated per salt, so a right/full outer join would emit up to
    ``salt_buckets`` phantom unmatched-dim rows per key."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt_buckets))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_fact.join(salted_dim, on=[key, "__salt"], how=how).drop("__salt")


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Windowed top-N; the rank filter lets Spark's WindowGroupLimit
    push the limit into the sort (no full materialization per group).

    Global top-N (``group_cols == []``) is NOT a window: that would
    shuffle every row to one partition. ``orderBy().limit(n)`` compiles
    to TakeOrderedAndProject — each partition keeps a local top-n heap,
    only n rows per partition reach the driver-side merge — and the
    rank is then numbered over the n surviving rows only."""
    if not group_cols:
        # The rank window over the n survivors has an empty partition
        # spec (Spark eliminates any constant spec), so WindowExec logs
        # its single-partition warning — a false positive here: the
        # input is already limit(n) rows, and TakeOrderedAndProject did
        # the distributed work.
        top = df.orderBy(*order_cols).limit(n)
        w = Window.orderBy(*order_cols)
        return top.withColumn(rank_col, F.row_number().over(w))
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def bucket_write(
    df: DataFrame, path: str, table: str, bucket_col: str, num_buckets: int = 32
) -> None:
    """Persist bucketed by the hot join key: subsequent equi-joins and
    aggregations on ``bucket_col`` skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
