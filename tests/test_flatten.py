from __future__ import annotations

import json

from pyspark.sql import types as T

from ingest_spark.operators.flatten import fill_defaults, flatten_json_props, jsonstat_flatten


def _doc(dims: dict, values: list, px: dict | None = None) -> str:
    """Build a JSONSTAT document (FIXTURES.md §5 shape)."""
    dimension = {
        name: {"category": {"label": labels}} for name, labels in dims.items()
    }
    ds = {
        "label": "Motor vehicles",
        "source": "Statistics Denmark",
        "updated": "2024-11-01T08:00:00Z",
        "dimension": dimension,
        "value": values,
    }
    if px is not None:
        ds["extension"] = {"px": px}
    return json.dumps({"dataset": ds})


FULL = _doc(
    {
        "Tid": {"2018M01": "2018M01", "2018M02": "2018M02", "2018M03": "2018M03"},
        "OMRÅDE": {"000": "All Denmark"},
        "BILTYPE": {"4000100001": "Vehicles total"},
        "BRUG": {"1000": "Total"},
        "EJER": {"1000": "Total"},
        "DRIV": {"20225": "Electricity"},
        "ContentsCode": {"BIL54": "Stock"},
    },
    [100, 110, 120],
    px={"infofile": "http://doc", "tableid": "BIL54", "decimals": 0},
)

FALLBACK = _doc(
    {
        "Tid": {"2020M01": "2020M01", "2020M02": "2020M02"},
        "DRIV": {"20200": "Petrol"},  # 20225 absent -> fallback path
        "ContentsCode": {"BIL52": "Stock"},
    },
    [5, 7],
    px={"infofile": None, "tableid": "BIL52", "decimals": 1},
)

NO_PX = _doc(
    {"Tid": {"2021M01": "2021M01"}, "DRIV": {"20225": "El"},
     "ContentsCode": {"X": "Y"}},
    [42],
)


def test_flatten_positional_zip(spark):
    out = jsonstat_flatten(spark.createDataFrame([(FULL,)], "raw string"))
    rows = {r["time"]: r for r in out.collect()}
    assert list(sorted(rows)) == ["2018M01", "2018M02", "2018M03"]
    assert [rows[t]["value"] for t in sorted(rows)] == [100, 110, 120]
    r = rows["2018M01"]
    assert r["region"] == "All Denmark"
    assert r["propellant"] == "Electricity"
    assert r["table_id"] == "BIL54"
    assert r["ownership"] == "Total"


def test_flatten_fallbacks_and_nulls(spark):
    out = jsonstat_flatten(spark.createDataFrame([(FALLBACK,)], "raw string"))
    r = out.collect()[0]
    assert r["propellant"] == "Petrol"       # DRIV 20225 -> 20200 fallback
    assert r["region"] is None               # OMRÅDE absent -> null
    assert r["type_of_vehicle"] is None
    assert r["decimals"] == 1


def test_flatten_missing_px_defaults(spark):
    out = jsonstat_flatten(spark.createDataFrame([(NO_PX,)], "raw string"))
    r = out.collect()[0]
    assert r["table_id"] == "Unknown"        # T4 default
    assert r["decimals"] == 0
    assert r["documentation"] is None
    assert r["value"] == 42


def test_flatten_json_props_explicit_schema(spark):
    df = spark.createDataFrame([('{"k": 7, "x": "y"}',)], "props string")
    out = flatten_json_props(df, "props", {"k": T.IntegerType()})
    assert out.first()["k"] == 7


def test_fill_defaults(spark):
    df = spark.createDataFrame([(None, 1), ("a", None)], "s string, i int")
    out = fill_defaults(df, {"s": "dflt", "i": 0}).collect()
    assert out[0]["s"] == "dflt" and out[1]["i"] == 0
