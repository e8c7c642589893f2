"""Declared schemas for the user-profile pipeline.

ENVELOPE_SCHEMA mirrors the reference's hand-written StructType for
the randomuser.me API response (reference ``Real_Time_Data.py:47-81``)
— every field nullable, two levels of nesting, ``results`` an array
of user structs. PROFILE_SCHEMA is the curated output the reference
declares twice (select chain ``Real_Time_Data.py:85-106`` and the
Cassandra DDL ``Real_Time_Data.py:123-135``); here it is declared
once and enforced at the sink boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_name = StructType(
    [
        StructField("title", StringType(), True),
        StructField("first", StringType(), True),
        StructField("last", StringType(), True),
    ]
)

_dob = StructType(
    [
        StructField("date", StringType(), True),
        StructField("age", IntegerType(), True),
    ]
)

_street = StructType(
    [
        StructField("number", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)

_location = StructType(
    [
        StructField("street", _street, True),
        StructField("city", StringType(), True),
        StructField("state", StringType(), True),
        StructField("country", StringType(), True),
        StructField("postcode", IntegerType(), True),
    ]
)

_login = StructType(
    [
        StructField("uuid", StringType(), True),
        StructField("username", StringType(), True),
    ]
)

_registered = StructType([StructField("date", StringType(), True)])

USER_SCHEMA = StructType(
    [
        StructField("gender", StringType(), True),
        StructField("name", _name, True),
        StructField("dob", _dob, True),
        StructField("location", _location, True),
        StructField("email", StringType(), True),
        StructField("login", _login, True),
        StructField("registered", _registered, True),
    ]
)

ENVELOPE_SCHEMA = StructType(
    [StructField("results", ArrayType(USER_SCHEMA), True)]
)

# Curated profile — single source of truth for the output contract.
PROFILE_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("username", StringType(), True),
        StructField("gender", StringType(), True),
        StructField("title", StringType(), True),
        StructField("age", IntegerType(), True),
        StructField("email", StringType(), True),
        StructField("inscription", StringType(), True),
        StructField("full_name", StringType(), True),
        StructField("full_address", StringType(), True),
    ]
)

PROFILE_COLUMNS = [f.name for f in PROFILE_SCHEMA.fields]

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
