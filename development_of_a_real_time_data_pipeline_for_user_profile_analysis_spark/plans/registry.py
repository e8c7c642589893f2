"""Query registry — the engine's public query surface.

One entry per operator/query from SURVEY.md §2 (plus the
LLM-data-pipeline extensions). Each query is a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLES`` holds the equivalent
DuckDB SQL (None → non-SQL-expressible, driver does a rows-only
check). Every computed column is aliased identically on both sides —
the driver's hash compare sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import aggregates, analytics, dedup, etl, multimodal, similarity, text
from ..session import ensure_engine_conf
from ..sources.readers import load_table
from ..sources.synthetic import PROFILES_ORACLE_CTE, envelopes_from_customers

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _with_profiles(sql: str) -> str:
    return f"WITH {PROFILES_ORACLE_CTE} {sql}"


def profiles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference ETL chain over the synthetic envelope feed:
    customer → JSON envelope → from_json/explode → curate (filters
    applied). This is the engine's 'silver table' lineage."""
    envelopes = envelopes_from_customers(load_table(spark, sf_dir, "customer"))
    return etl.curate_profiles(etl.parse_envelopes(envelopes))


# ------------------------------------------------------------------
# Parity: ETL chain (SURVEY §2.3-2.5, P1-P7/F1-F2/X1-X10)
# ------------------------------------------------------------------

_PROFILE_COLS = (
    "id, username, gender, title, age, email, inscription, full_name, full_address"
)


@query("etl_curate_profiles", _with_profiles(f"SELECT {_PROFILE_COLS} FROM profiles"))
def q_etl_curate_profiles(spark, sf_dir):
    return profiles_df(spark, sf_dir)


@query(
    "profiles_na_drop",
    _with_profiles(
        f"SELECT {_PROFILE_COLS} FROM profiles WHERE "
        + " AND ".join(f"{c.strip()} IS NOT NULL" for c in _PROFILE_COLS.split(","))
    ),
)
def q_profiles_na_drop(spark, sf_dir):
    return etl.na_drop(profiles_df(spark, sf_dir))


@query(
    "profiles_pseudonymized",
    _with_profiles(
        "SELECT sha256(id) AS id, username, gender, title, age, "
        "sha256(email) AS email, inscription, full_name, full_address FROM profiles"
    ),
)
def q_profiles_pseudonymized(spark, sf_dir):
    return etl.pseudonymize(profiles_df(spark, sf_dir))


# ------------------------------------------------------------------
# Parity: dashboard aggregate workload (SURVEY §2.6, A1-A5)
# ------------------------------------------------------------------


@query(
    "gender_distribution",
    _with_profiles("SELECT gender, COUNT(*) AS count FROM profiles GROUP BY gender"),
)
def q_gender_distribution(spark, sf_dir):
    return aggregates.gender_distribution(profiles_df(spark, sf_dir))


@query(
    "top_email_domains",
    _with_profiles(
        "SELECT regexp_extract(email, '@([A-Za-z0-9-]+)\\.', 1) AS domain, "
        "COUNT(*) AS count FROM profiles GROUP BY domain "
        "ORDER BY count DESC, domain ASC LIMIT 5"
    ),
)
def q_top_email_domains(spark, sf_dir):
    return aggregates.top_email_domains(profiles_df(spark, sf_dir))


@query("total_users", _with_profiles("SELECT COUNT(*) AS count FROM profiles"))
def q_total_users(spark, sf_dir):
    return aggregates.total_users(profiles_df(spark, sf_dir))


@query(
    "age_ecdf",
    _with_profiles(
        "SELECT age, CAST(row_number() OVER (ORDER BY age) AS BIGINT) AS cum_count "
        "FROM profiles"
    ),
)
def q_age_ecdf(spark, sf_dir):
    return aggregates.age_ecdf(profiles_df(spark, sf_dir))


@query(
    "age_histogram",
    _with_profiles(
        "SELECT age, COUNT(*) AS count FROM profiles GROUP BY age ORDER BY age"
    ),
)
def q_age_histogram(spark, sf_dir):
    return aggregates.age_histogram(profiles_df(spark, sf_dir))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke query: the full ETL chain + the A1 aggregate."""
    return aggregates.gender_distribution(profiles_df(spark, sf_dir))
