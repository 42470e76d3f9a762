"""Code-defined schemas — the Spark analogue of the reference's serde structs.

The reference's data model is two Rust structs plus edge properties
(reference: src/database.rs:81-96, :199-210, :367-385); Neo4j is schemaless
so the structs ARE the schema. Here the StructTypes are the schema.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Node type `System` (reference: src/database.rs:81-96).
SYSTEM = StructType(
    [
        StructField("system_id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("constellation_id", LongType(), False),  # -1 sentinel (sync.rs:28)
        StructField("security_status", DoubleType(), False),
        StructField("security_class", StringType(), False),  # "undefined" default (sync.rs:39)
        StructField("star_id", LongType(), False),  # -1 sentinel (sync.rs:41)
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("z", DoubleType(), False),
        StructField("planets", ArrayType(LongType()), False),
        StructField("stargates", ArrayType(LongType()), False),
        StructField("kills", IntegerType(), False),  # last-hour ship kills (database.rs:94)
        StructField("jumps", IntegerType(), False),  # last-hour traffic (database.rs:95)
    ]
)

# Node type `Stargate` (reference: src/database.rs:199-210).
STARGATE = StructType(
    [
        StructField("stargate_id", LongType(), False),
        StructField("system_id", LongType(), False),
        StructField("destination_stargate_id", LongType(), False),
        StructField("destination_system_id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("z", DoubleType(), False),
        StructField("type_id", LongType(), False),
    ]
)

# Edge type `JUMP` as a table (reference: src/database.rs:367-385).
# Edges-as-table is the GraphX/GraphFrames model: (src, dst, properties).
JUMP = StructType(
    [
        StructField("src_system_id", LongType(), False),
        StructField("dst_system_id", LongType(), False),
        StructField("cost", LongType(), False),  # always 1 at creation (database.rs:375)
        StructField("risk", DoubleType(), True),  # kills²/jumps + baseline (database.rs:324-332)
        StructField("kind", StringType(), False),  # 'gate' | 'wormhole'
    ]
)

# Activity feeds (reference: src/esi.rs:85-101).
SYSTEM_KILLS = StructType(
    [
        StructField("system_id", LongType(), False),
        StructField("ship_kills", IntegerType(), False),
    ]
)
SYSTEM_JUMPS = StructType(
    [
        StructField("system_id", LongType(), False),
        StructField("ship_jumps", IntegerType(), False),
    ]
)

# --- Ingest-side (wire) schemas -------------------------------------------

# esi::SystemResponse (reference: src/esi.rs:5-30) — nullable fields, nested
# Position{x,y,z} and Planet{planet_id, asteroid_belts, moons}.
ESI_POSITION = StructType(
    [
        StructField("x", DoubleType(), True),
        StructField("y", DoubleType(), True),
        StructField("z", DoubleType(), True),
    ]
)
ESI_PLANET = StructType(
    [
        StructField("planet_id", LongType(), True),
        StructField("asteroid_belts", ArrayType(LongType()), True),
        StructField("moons", ArrayType(LongType()), True),
    ]
)
ESI_SYSTEM_RESPONSE = StructType(
    [
        StructField("system_id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("constellation_id", LongType(), True),
        StructField("planets", ArrayType(ESI_PLANET), True),
        StructField("position", ESI_POSITION, True),
        StructField("security_class", StringType(), True),
        StructField("security_status", DoubleType(), True),
        StructField("star_id", LongType(), True),
        StructField("stargates", ArrayType(LongType()), True),
    ]
)

# esi::StargateResponse (reference: src/esi.rs:32-46) with nested Destination.
ESI_DESTINATION = StructType(
    [
        StructField("stargate_id", LongType(), True),
        StructField("system_id", LongType(), True),
    ]
)
ESI_STARGATE_RESPONSE = StructType(
    [
        StructField("stargate_id", LongType(), False),
        StructField("system_id", LongType(), True),
        StructField("destination", ESI_DESTINATION, True),
        StructField("name", StringType(), True),
        StructField("position", ESI_POSITION, True),
        StructField("type_id", LongType(), True),
    ]
)

# eve_scout::EveScoutSignature — the used subset of the 26 wire fields
# (reference: src/eve_scout.rs:15-44; used fields per src/sync.rs:80-90).
EVE_SCOUT_SIGNATURE = StructType(
    [
        StructField("id", StringType(), True),
        StructField("signature_type", StringType(), True),  # filter == 'wormhole' (sync.rs:83)
        StructField("in_system_id", LongType(), True),
        StructField("out_system_id", LongType(), True),
        StructField("wh_exits_outward", BooleanType(), True),
        StructField("created_at", StringType(), True),  # ISO timestamp string on the wire
        StructField("expires_at", StringType(), True),
        StructField("completed", BooleanType(), True),
    ]
)

# Driver-fixture extras (FIXTURES.md §B).
EMBEDDING = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), True),
    ]
)
DOCUMENT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)
EVENT = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)
