"""The four data contracts the reference pipeline governs its topics
with, re-declared as engine-native StructTypes.

Field inventory mirrors the published Avro contracts (data, not code):
- ConsumptionIndustry  (avro-schema/ConsumptionIndustry.avsc:1-27)
- ProductionConsumptionSettlement (.../ProductionConsumptionSettlement.avsc:5-146,
  28 fields, 26 nullable floats)
- Bil54 / MotorVehicleStock (.../Bil54.avsc:1-81, incl. the §1.4
  null-default-on-string quirk, normalized to nullable)
- Bil52 / PassengerCarStock (.../Bil52.avsc:1-37)

Timestamps stay strings at the contract level (the reference transports
ISO strings / "2018M01" periods); parsing to TimestampType is an
ingest-time upgrade done by the cleaning operators, keeping the raw
column for fidelity.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ingest_spark.schemas.avsc import avsc_to_struct


def _record(name: str, fields: list) -> dict:
    return {"type": "record", "name": name, "fields": fields}


_SETTLEMENT_FLOATS = [
    "CentralPowerMWh", "LocalPowerMWh", "CommercialPowerMWh",
    "LocalPowerSelfConMWh", "OffshoreWindLt100MW_MWh", "OffshoreWindGe100MW_MWh",
    "OnshoreWindLt50kW_MWh", "OnshoreWindGe50kW_MWh", "HydroPowerMWh",
    "SolarPowerLt10kW_MWh", "SolarPowerGe10Lt40kW_MWh", "SolarPowerGe40kW_MWh",
    "SolarPowerSelfConMWh", "UnknownProdMWh", "ExchangeNO_MWh", "ExchangeSE_MWh",
    "ExchangeGE_MWh", "ExchangeNL_MWh", "ExchangeGB_MWh", "ExchangeGreatBelt_MWh",
    "GrossConsumptionMWh", "GridLossTransmissionMWh", "GridLossInterconnectorsMWh",
    "GridLossDistributionMWh", "PowerToHeatMWh",
]

CONTRACTS: dict[str, dict] = {
    "ConsumptionIndustry": _record(
        "ConsumptionIndustry",
        [
            {"name": "HourUTC", "type": "string"},
            {"name": "HourDK", "type": "string"},
            {"name": "MunicipalityNo", "type": "string"},
            {"name": "Branche", "type": "string"},
            {"name": "ConsumptionkWh", "type": "float"},
        ],
    ),
    "ProductionConsumptionSettlement": _record(
        "ProductionConsumptionSettlement",
        [
            {"name": n, "type": ["null", "string"], "default": None}
            for n in ("HourUTC", "HourDK", "PriceArea")
        ]
        + [
            {"name": n, "type": ["null", "float"], "default": None}
            for n in _SETTLEMENT_FLOATS
        ],
    ),
    "Bil54": _record(
        "Bil54",
        [
            {"name": "region", "type": "string"},
            {"name": "type_of_vehicle", "type": "string"},
            {"name": "terms_of_use", "type": "string"},
            {"name": "propellant", "type": "string"},
            {"name": "content_label", "type": ["null", "string"], "default": None},
            {"name": "unit", "type": "string"},
            {
                "name": "updated",
                "type": {"type": "string", "logicalType": "timestamp-millis"},
            },
            {"name": "time", "type": "string"},
            {"name": "value", "type": "int"},
            {"name": "label", "type": "string"},
            {"name": "source", "type": "string"},
            # §1.4 quirk preserved as-declared: string with null default
            # (normalize_avsc repairs it to nullable)
            {"name": "documentation", "type": "string", "default": None},
            {"name": "table_id", "type": "string"},
            {"name": "decimals", "type": "int"},
        ],
    ),
    "Bil52": _record(
        "Bil52",
        [
            {"name": "time", "type": "string"},
            {"name": "value", "type": "int"},
            {"name": "ownership", "type": "string"},
            {"name": "propellant", "type": "string"},
            {"name": "unit", "type": "string"},
            {"name": "label", "type": "string"},
        ],
    ),
}


def contract_schema(name: str) -> T.StructType:
    """StructType for a named contract (registry-lookup analogue;
    raises like the reference's schema pre-flight O2 when absent)."""
    if name not in CONTRACTS:
        raise KeyError(f"schema not found in the registry: {name}")
    return avsc_to_struct(CONTRACTS[name])
