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


def test_apply_contract_casts_and_fails_fast(spark):
    df = spark.createDataFrame([("2024", "101", "Erhverv", "1h", 1.5)],
                               "HourUTC string, MunicipalityNo string, Branche string, HourDK string, ConsumptionkWh double")
    out = apply_contract(df, contract_schema("ConsumptionIndustry"))
    assert [f.name for f in out.schema.fields] == [
        "HourUTC", "HourDK", "MunicipalityNo", "Branche", "ConsumptionkWh"]
    assert out.schema["ConsumptionkWh"].dataType == T.FloatType()
    with pytest.raises(ValueError, match="missing columns"):
        apply_contract(df.drop("Branche"), contract_schema("ConsumptionIndustry"))
