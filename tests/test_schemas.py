from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ingest_spark.schemas import CONTRACTS, avsc_to_struct, contract_schema, struct_to_avsc
from ingest_spark.schemas.avsc import apply_contract, normalize_avsc


def test_primitives_and_unions():
    s = avsc_to_struct(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "a", "type": "string"},
                {"name": "b", "type": ["null", "float"], "default": None},
                {"name": "c", "type": "int"},
            ],
        }
    )
    assert s["a"].dataType == T.StringType() and not s["a"].nullable
    assert s["b"].dataType == T.FloatType() and s["b"].nullable
    assert s["c"].dataType == T.IntegerType()


def test_null_default_on_plain_string_normalized():
    # the Bil54.avsc:70-74 quirk: invalid Avro repaired to nullable
    raw = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "documentation", "type": "string", "default": None}],
    }
    assert normalize_avsc(raw)["fields"][0]["type"] == ["null", "string"]
    s = avsc_to_struct(raw)
    assert s["documentation"].nullable


def test_logical_type_on_string_stays_string():
    # Bil54.avsc:58-62: timestamp-millis declared on a string field
    s = contract_schema("Bil54")
    assert s["updated"].dataType == T.StringType()
    assert s["updated"].metadata.get("avro.logicalType") == "timestamp-millis"


def test_contract_inventory():
    assert set(CONTRACTS) == {
        "ConsumptionIndustry",
        "ProductionConsumptionSettlement",
        "Bil54",
        "Bil52",
    }
    settlement = contract_schema("ProductionConsumptionSettlement")
    assert len(settlement.fields) == 28
    assert all(f.nullable for f in settlement.fields)
    ci = contract_schema("ConsumptionIndustry")
    assert ci["ConsumptionkWh"].dataType == T.FloatType()


def test_missing_contract_raises_like_registry_preflight():
    with pytest.raises(KeyError, match="not found in the registry"):
        contract_schema("NoSuchTopic")


def test_struct_roundtrip():
    s = contract_schema("Bil52")
    back = avsc_to_struct(struct_to_avsc(s, "Bil52"))
    assert [f.name for f in back.fields] == [f.name for f in s.fields]
    assert [f.dataType for f in back.fields] == [f.dataType for f in s.fields]


def test_struct_roundtrip_full_type_surface():
    """r15: struct_to_avsc covers the loader's whole type surface
    (arrays, maps, nested records, decimal, date, timestamp) — export
    then re-load preserves every field's dataType and nullability."""
    from pyspark.sql import types as T

    s = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("scores", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField("point", T.StructType([
            T.StructField("x", T.DoubleType(), False),
            T.StructField("y", T.DoubleType(), True),
        ]), False),
        T.StructField("amount", T.DecimalType(12, 2), True),
        T.StructField("d", T.DateType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ])
    avsc = struct_to_avsc(s, "Full")
    back = avsc_to_struct(avsc)
    assert [f.name for f in back.fields] == [f.name for f in s.fields]
    assert [f.dataType for f in back.fields] == [f.dataType for f in s.fields]
    assert [f.nullable for f in back.fields] == [f.nullable for f in s.fields]
    # the exported schema is also a legal codec contract: encode/decode
    # a record through the byte codec
    import datetime as dt
    from decimal import Decimal

    from ingest_spark.schemas.avro_binary import decode_record, encode_record

    rec = {
        "id": 7, "tags": ["a", None], "scores": [1.5, 2.5],
        "attrs": {"k": 9}, "point": {"x": 1.0, "y": None},
        "amount": Decimal("12.34"), "d": dt.date(2024, 1, 15),
        "ts": dt.datetime(2024, 1, 15, 7, 0, tzinfo=dt.timezone.utc),
    }
    assert decode_record(avsc, encode_record(avsc, rec)) == rec
    # map keys must be strings in avro — fail loudly, not lossily
    import pytest

    bad = T.StructType([
        T.StructField("m", T.MapType(T.LongType(), T.StringType()), False)
    ])
    with pytest.raises(ValueError, match="string keys"):
        struct_to_avsc(bad, "Bad")


def test_apply_contract_casts_and_fails_fast(spark):
    df = spark.createDataFrame([("2024", "101", "Erhverv", "1h", 1.5)],
                               "HourUTC string, MunicipalityNo string, Branche string, HourDK string, ConsumptionkWh double")
    out = apply_contract(df, contract_schema("ConsumptionIndustry"))
    assert [f.name for f in out.schema.fields] == [
        "HourUTC", "HourDK", "MunicipalityNo", "Branche", "ConsumptionkWh"]
    assert out.schema["ConsumptionkWh"].dataType == T.FloatType()
    with pytest.raises(ValueError, match="missing columns"):
        apply_contract(df.drop("Branche"), contract_schema("ConsumptionIndustry"))
