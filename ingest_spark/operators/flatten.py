"""Cleaning / flattening transforms (reference T1-T4).

The reference's JSONSTAT cleaner (producers/statbank/
fetch_data_statbank.py:44-89) takes one nested JSON document —
``dataset.dimension`` maps plus a positionally-parallel ``value``
array — and emits one flat record per (time, value) pair, broadcasting
scalar dimensions onto every row, with conditional code lookups and
default fills (:49-65, T3/T4).

Spark-first re-expression: ``posexplode`` keeps the label/value
positional zip explicit (SURVEY §7 hard-part d); scalar dims are plain
expressions; fallbacks are ``coalesce``/``when``. Pure narrow ops —
flattening a billion documents is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of one JSONSTAT document as fetched by the statbank source
# (subset the cleaner touches; see FIXTURES.md §5).
JSONSTAT_SCHEMA = T.StructType(
    [
        T.StructField(
            "dataset",
            T.StructType(
                [
                    T.StructField("label", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("updated", T.StringType()),
                    T.StructField(
                        "extension",
                        T.StructType(
                            [
                                T.StructField(
                                    "px",
                                    T.StructType(
                                        [
                                            T.StructField("infofile", T.StringType()),
                                            T.StructField("tableid", T.StringType()),
                                            T.StructField("decimals", T.IntegerType()),
                                        ]
                                    ),
                                )
                            ]
                        ),
                    ),
                    T.StructField(
                        "dimension",
                        T.MapType(
                            T.StringType(),
                            T.StructType(
                                [
                                    T.StructField(
                                        "category",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "label",
                                                    T.MapType(T.StringType(), T.StringType()),
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ),
                    T.StructField("value", T.ArrayType(T.IntegerType())),
                ]
            ),
        )
    ]
)


def _dim_label(ds: Column, dim: str, code: str) -> Column:
    """T3: label of a fixed code in a dimension, NULL when the
    dimension is absent (fetch_data_statbank.py:59-62 semantics)."""
    return F.element_at(F.element_at(ds["dimension"], dim)["category"]["label"], code)


def jsonstat_flatten(df: DataFrame, json_col: str = "raw") -> DataFrame:
    """T2-T4 over a DataFrame with one JSONSTAT document per row
    (string column ``json_col``). Output matches the reference's
    cleaned record shape (FIXTURES.md §3)."""
    ds = F.from_json(F.col(json_col), JSONSTAT_SCHEMA)["dataset"]
    tid_labels = F.map_values(F.element_at(ds["dimension"], "Tid")["category"]["label"])
    flat = df.select(
        ds["label"].alias("label"),
        ds["source"].alias("source"),
        ds["updated"].alias("updated"),
        # T4 default fills (:52-54)
        ds["extension"]["px"]["infofile"].alias("documentation"),
        F.coalesce(ds["extension"]["px"]["tableid"], F.lit("Unknown")).alias("table_id"),
        F.coalesce(ds["extension"]["px"]["decimals"], F.lit(0)).alias("decimals"),
        # T3 conditional dimension extraction with fallbacks (:59-65)
        _dim_label(ds, "OMRÅDE", "000").alias("region"),
        _dim_label(ds, "BILTYPE", "4000100001").alias("type_of_vehicle"),
        _dim_label(ds, "BRUG", "1000").alias("terms_of_use"),
        _dim_label(ds, "EJER", "1000").alias("ownership"),
        F.coalesce(
            _dim_label(ds, "DRIV", "20225"), _dim_label(ds, "DRIV", "20200")
        ).alias("propellant"),
        F.element_at(
            F.map_values(F.element_at(ds["dimension"], "ContentsCode")["category"]["label"]), 1
        ).alias("content_label"),
        F.lit("Number").alias("unit"),
        tid_labels.alias("__times"),
        ds["value"].alias("__values"),
    )
    # T2: positional zip of time labels with the parallel value array.
    return flat.select(
        *[c for c in flat.columns if not c.startswith("__")],
        F.posexplode(F.arrays_zip(F.col("__times"), F.col("__values"))).alias(
            "__pos", "__zipped"
        ),
    ).select(
        *[c for c in flat.columns if not c.startswith("__")],
        F.col("__zipped.__times").alias("time"),
        F.col("__zipped.__values").alias("value"),
    )


def flatten_json_props(
    df: DataFrame, json_col: str, fields: dict[str, T.DataType]
) -> DataFrame:
    """Generic flat-JSON column expansion (events.props-style payloads):
    from_json with an explicit schema — never schema inference on the
    hot path (inference is a second full scan at 100 TB)."""
    schema = T.StructType([T.StructField(k, v) for k, v in fields.items()])
    parsed = df.withColumn("__p", F.from_json(F.col(json_col), schema))
    for k in fields:
        parsed = parsed.withColumn(k, F.col(f"__p.{k}"))
    return parsed.drop("__p")


def fill_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """T4 as a standalone operator."""
    out = df
    for col, default in defaults.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return out
