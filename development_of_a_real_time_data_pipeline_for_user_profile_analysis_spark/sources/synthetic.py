"""Deterministic synthetic user-profile feeder.

The reference's input is the randomuser.me API via Kafka
(producer.py:17-44) — non-deterministic and unavailable here. This
module derives user facts *deterministically from ``c_custkey``* of
the shared test corpus, builds the exact wire-format JSON envelope
(``{"results":[{...}]}``, producer.py:38), and exposes the same
derivation as a DuckDB SQL CTE so the driver's oracle can verify the
full parse→curate ETL chain value-for-value.

Every arithmetic expression here MUST stay in lockstep with
``PROFILES_ORACLE_CTE`` below — change one, change both.

Scale note: the derivation is pure per-row column arithmetic on top
of the customer scan — narrow, codegen'd, no shuffle, no Python.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- shared derivation constants ------------------------------------
DOB_BASE = "1956-01-01"  # + (k*37 % 21915) days -> ages ~10..70
DOB_MOD = 21915
REG_EPOCH = 1420070400  # 2015-01-01T00:00:00Z
REG_MOD = 315360000  # ~10 years of seconds
NULL_ID_MOD = 101  # every 101st user has no uuid (drops at the id filter)
NULL_TITLE_MOD = 53  # every 53rd user has a NULL title (na.drop fodder)

_DOMAINS = [
    (8, "example.com"),
    (13, "gmail.com"),
    (16, "yahoo.com"),
    (18, "hotmail.com"),
    (19, "proton.me"),
    (20, "foo.co.uk"),  # multi-part TLD pins domain-vs-suffix semantics
]


def _domain_col(k: Column) -> Column:
    d = k % 20
    expr = F.when(d < _DOMAINS[0][0], _DOMAINS[0][1])
    for bound, name in _DOMAINS[1:]:
        expr = expr.when(d < bound, name)
    return expr


def seed_user_columns(k: Column) -> dict[str, Column]:
    """Raw user facts as columns keyed by field name; k = c_custkey."""
    dob_date = F.date_add(F.to_date(F.lit(DOB_BASE)), ((k * 37) % DOB_MOD).cast("int"))
    reg_ts = F.timestamp_seconds(F.lit(REG_EPOCH) + (k * 12345) % REG_MOD)
    return {
        "gender": F.when(k % 2 == 0, "female").otherwise("male"),
        "title": F.when(k % NULL_TITLE_MOD == 0, F.lit(None).cast("string"))
        .when(k % 2 == 0, "Miss")
        .otherwise("Mr"),
        "first": F.concat(F.lit("First"), (k % 50).cast("string")),
        "last": F.concat(F.lit("Last"), (k % 40).cast("string")),
        "dob_str": F.concat(F.date_format(dob_date, "yyyy-MM-dd"), F.lit("T00:00:00.000Z")),
        "street_number": ((k % 999) + 1).cast("int"),
        "street_name": F.concat(F.lit("Street"), (k % 20).cast("string")),
        "city": F.concat(F.lit("City"), (k % 30).cast("string")),
        "state": F.concat(F.lit("State"), (k % 15).cast("string")),
        "country": F.concat(F.lit("Country"), (k % 8).cast("string")),
        "postcode": (10000 + (k % 89999)).cast("int"),
        "email": F.concat(F.lit("user"), k.cast("string"), F.lit("@"), _domain_col(k)),
        "uuid": F.when(k % NULL_ID_MOD == 0, F.lit(None).cast("string")).otherwise(
            F.md5(k.cast("string"))
        ),
        "username": F.concat(F.lit("user"), k.cast("string")),
        "registered_str": F.date_format(reg_ts, "yyyy-MM-dd'T'HH:mm:ss.000'Z'"),
    }


def envelopes_from_customers(
    customers: DataFrame, with_key: bool = False
) -> DataFrame:
    """customer table → one JSON envelope string per row, wire-format
    identical to the reference producer's payload (producer.py:38).
    ``with_key=True`` also emits the seed key ``k`` (for harnesses
    that corrupt/partition deterministically by key)."""
    k = F.col("c_custkey")
    c = seed_user_columns(k)
    user = F.struct(
        c["gender"].alias("gender"),
        F.struct(
            c["title"].alias("title"), c["first"].alias("first"), c["last"].alias("last")
        ).alias("name"),
        F.struct(c["dob_str"].alias("date"), F.lit(None).cast("int").alias("age")).alias("dob"),
        F.struct(
            F.struct(
                c["street_number"].alias("number"), c["street_name"].alias("name")
            ).alias("street"),
            c["city"].alias("city"),
            c["state"].alias("state"),
            c["country"].alias("country"),
            c["postcode"].alias("postcode"),
        ).alias("location"),
        c["email"].alias("email"),
        F.struct(c["uuid"].alias("uuid"), c["username"].alias("username")).alias("login"),
        F.struct(c["registered_str"].alias("date")).alias("registered"),
    )
    value = F.to_json(F.struct(F.array(user).alias("results"))).alias("value")
    if with_key:
        return customers.select(k.alias("k"), value)
    return customers.select(value)


# -- DuckDB mirror ---------------------------------------------------
# The curated-profile relation the full Spark ETL chain
# (envelopes_from_customers → parse_envelopes → curate_profiles) must
# reproduce value-for-value. Compose as:
#   f"WITH {PROFILES_ORACLE_CTE} SELECT ... FROM profiles"
# The key source is parameterized so the same derivation verifies any
# feeder: customer-keyed envelopes (default) or the `userfeed` data
# source's contiguous key range (profiles_oracle_cte of a
# generate_series).


def profiles_oracle_cte(key_src_sql: str) -> str:
    """The curated-profile CTE over an arbitrary `... AS k` source."""
    return _PROFILES_CTE_TEMPLATE.replace("__KEY_SRC__", key_src_sql)


_PROFILES_CTE_TEMPLATE = f"""
profiles_all AS (
  SELECT
    CASE WHEN k % {NULL_ID_MOD} = 0 THEN NULL ELSE md5(CAST(k AS VARCHAR)) END AS id,
    'user' || CAST(k AS VARCHAR) AS username,
    CASE WHEN k % 2 = 0 THEN 'female' ELSE 'male' END AS gender,
    CASE WHEN k % {NULL_TITLE_MOD} = 0 THEN NULL
         WHEN k % 2 = 0 THEN 'Miss' ELSE 'Mr' END AS title,
    CAST(year(current_date) - year(DATE '{DOB_BASE}' + CAST((k * 37) % {DOB_MOD} AS INTEGER)) AS INTEGER) AS age,
    'user' || CAST(k AS VARCHAR) || '@' ||
      CASE WHEN k % 20 < 8  THEN 'example.com'
           WHEN k % 20 < 13 THEN 'gmail.com'
           WHEN k % 20 < 16 THEN 'yahoo.com'
           WHEN k % 20 < 18 THEN 'hotmail.com'
           WHEN k % 20 < 19 THEN 'proton.me'
           ELSE 'foo.co.uk' END AS email,
    strftime(make_timestamp(({REG_EPOCH} + (k * 12345) % {REG_MOD}) * 1000000),
             '%Y-%m-%dT%H:%M:%S.000Z') AS inscription,
    concat_ws(' ', 'First' || CAST(k % 50 AS VARCHAR),
                   'Last' || CAST(k % 40 AS VARCHAR)) AS full_name,
    concat_ws(' ', 'Country' || CAST(k % 8 AS VARCHAR),
                   'State' || CAST(k % 15 AS VARCHAR),
                   'City' || CAST(k % 30 AS VARCHAR),
                   CAST((k % 999) + 1 AS VARCHAR),
                   CAST(10000 + (k % 89999) AS VARCHAR)) AS full_address
  FROM (__KEY_SRC__)
),
profiles AS (
  SELECT * FROM profiles_all WHERE age > 18 AND id IS NOT NULL
)"""

PROFILES_ORACLE_CTE = profiles_oracle_cte("SELECT c_custkey AS k FROM customer")


# -- pure-python feeder (streaming tests; no Spark dependency) -------
def _drop_nones(obj):
    """Recursively drop None values — Spark's to_json omits null
    fields, so the python feeder must too for wire-format parity
    (from_json treats absent and null identically)."""
    if isinstance(obj, dict):
        return {k: _drop_nones(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_drop_nones(v) for v in obj]
    return obj


def envelope_dict(k: int) -> dict:
    """Python mirror of seed_user_columns for writing JSONL fixtures."""
    import datetime as dt

    dob = dt.date(1956, 1, 1) + dt.timedelta(days=(k * 37) % DOB_MOD)
    reg = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=(k * 12345) % REG_MOD
    )
    d = k % 20
    domain = next(name for bound, name in _DOMAINS if d < bound)
    import hashlib

    return _drop_nones({
        "results": [
            {
                "gender": "female" if k % 2 == 0 else "male",
                "name": {
                    "title": None if k % NULL_TITLE_MOD == 0 else ("Miss" if k % 2 == 0 else "Mr"),
                    "first": f"First{k % 50}",
                    "last": f"Last{k % 40}",
                },
                "dob": {"date": dob.isoformat() + "T00:00:00.000Z", "age": None},
                "location": {
                    "street": {"number": (k % 999) + 1, "name": f"Street{k % 20}"},
                    "city": f"City{k % 30}",
                    "state": f"State{k % 15}",
                    "country": f"Country{k % 8}",
                    "postcode": 10000 + (k % 89999),
                },
                "email": f"user{k}@{domain}",
                "login": {
                    "uuid": None
                    if k % NULL_ID_MOD == 0
                    else hashlib.md5(str(k).encode()).hexdigest(),
                    "username": f"user{k}",
                },
                "registered": {"date": reg.strftime("%Y-%m-%dT%H:%M:%S.000Z")},
            }
        ]
    })


def write_envelopes_jsonl(
    path: str, n: int, malformed_every: int = 0, start: int = 1
) -> None:
    """Write n envelopes as JSON-lines (one value per line) for the
    file streaming source; optionally inject malformed lines."""
    with open(path, "w") as f:
        for k in range(start, start + n):
            if malformed_every and k % malformed_every == 0:
                f.write('{"results": [oops\n')
            else:
                f.write(json.dumps(envelope_dict(k)) + "\n")
