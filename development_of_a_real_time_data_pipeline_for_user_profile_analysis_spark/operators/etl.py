"""Envelope → curated-profile ETL.

The transform chain of the reference streaming job
(Real_Time_Data.py:45-137), rebuilt as pure DataFrame→DataFrame
functions so the *same* code runs in batch tests, the DuckDB-oracle
sweep, and Structured Streaming (streaming/pipeline.py). Everything
stays JVM-side; Catalyst collapses the projection chain and prunes
the nested schema through from_json/explode automatically.

Scale notes (100 TB): the chain is narrow (no shuffle) — it scales
linearly with input partitions. Parallelism is governed entirely by
the source (Kafka partitions / parquet splits); nothing here ever
repartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.columns import (
    age_years_compat,
    age_years_exact,
    full_address,
    full_name,
    pseudonymize_col,
)
from ..schemas import ENVELOPE_SCHEMA, PROFILE_COLUMNS

CORRUPT_COL = "_corrupt_record"


def parse_envelopes(
    df: DataFrame, value_col: str = "value", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Binary/string JSON envelope → one row per user struct.

    Mirrors reference Real_Time_Data.py:45,83 (CAST → from_json →
    explode). PERMISSIVE parse: malformed JSON yields a NULL struct,
    dropped later by the id-not-null filter — same observable
    semantics as the reference, but see :func:`parse_envelopes_audited`
    for the dead-letter variant the reference lacked.

    ``keep`` threads source metadata columns (e.g. the Kafka wire
    columns topic/partition/offset/timestamp) through the parse
    unchanged — lineage columns a real deployment carries to the sink.
    """
    return df.select(
        F.from_json(F.col(value_col).cast("string"), ENVELOPE_SCHEMA).alias("values"),
        *keep,
    ).select(F.explode("values.results").alias("user"), *keep)


def parse_envelopes_audited(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Like :func:`parse_envelopes` but keeps the raw payload of rows
    that failed to parse in a ``_corrupt_record`` column (NULL for good
    rows), so a dead-letter sink can subscribe. Fixes the reference's
    useless try/except around lazy from_json
    (.ipynb_checkpoints/consumer-checkpoint.py:46-49).

    Implementation note: PERMISSIVE ``from_json`` yields a struct of
    NULL fields (not a NULL struct) on malformed input, so a plain
    ``values IS NULL`` check never fires — the corrupt column must be
    part of the parse schema (``columnNameOfCorruptRecord``).
    """
    audited_schema = StructType(
        ENVELOPE_SCHEMA.fields + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = df.select(
        F.from_json(
            F.col(value_col).cast("string"),
            audited_schema,
            {"columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("values")
    )
    return parsed.select(
        F.explode_outer("values.results").alias("user"),
        F.col(f"values.{CORRUPT_COL}").alias(CORRUPT_COL),
    )


def curate_profiles(
    users: DataFrame,
    user_col: str = "user",
    adult_min_age: int = 18,
    compat_age: bool = True,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Exploded user struct → the 9-column curated profile, with the
    GDPR adult filter and the non-null-id guard applied.

    Column derivations follow reference Real_Time_Data.py:85-106;
    filters :109 (strict ``age > 18``) and :137 (``id IS NOT NULL``).
    ``compat_age=True`` preserves the reference's year-boundary age
    formula; False uses the calendar-exact form.
    """
    u = F.col(user_col)
    age_fn = age_years_compat if compat_age else age_years_exact
    out = users.select(
        u["login"]["uuid"].alias("id"),
        u["login"]["username"].alias("username"),
        u["gender"].alias("gender"),
        u["name"]["title"].alias("title"),
        age_fn(u["dob"]["date"]).alias("age"),
        u["email"].alias("email"),
        u["registered"]["date"].alias("inscription"),
        full_name(u["name"]["first"], u["name"]["last"]).alias("full_name"),
        full_address(
            u["location"]["country"],
            u["location"]["state"],
            u["location"]["city"],
            u["location"]["street"]["number"],
            u["location"]["postcode"],
        ).alias("full_address"),
        *keep,
    )
    return out.filter(F.col("age") > adult_min_age).filter(F.col("id").isNotNull())


def na_drop(profiles: DataFrame) -> DataFrame:
    """Drop rows with any NULL column — the exploratory variant's
    ``result_df.na.drop()``
    (.ipynb_checkpoints/transformation_data-checkpoint.py:88)."""
    return profiles.na.drop()


def pseudonymize(profiles: DataFrame, cols: tuple[str, ...] = ("id", "email")) -> DataFrame:
    """SHA-256 the direct identifiers (the reference imported sha2 for
    this but never wired it — Real_Time_Data.py:4)."""
    out = profiles
    for c in cols:
        out = out.withColumn(c, pseudonymize_col(F.col(c)))
    return out


def enforce_profile_schema(df: DataFrame) -> DataFrame:
    """Project to the declared output contract (order + names) before
    any sink — the reference declared its output schema twice
    (select chain + Cassandra DDL); here the contract is enforced
    once, at the boundary."""
    return df.select(*PROFILE_COLUMNS)


# k-anonymity threshold shared by the privacy reports and their
# oracle SQL (registry interpolates this — change it HERE only).
K_ANONYMITY = 5


def k_anonymity_report(profiles: DataFrame, k: int = K_ANONYMITY) -> DataFrame:
    """Privacy-risk summary over the curated profile table — the
    quantitative extension of the reference's GDPR age filter
    (Real_Time_Data.py:137): treat (gender, age decade) as the
    quasi-identifier, the email domain as the sensitive attribute,
    and report k-anonymity / l-diversity in one row: equivalence-class
    count, the smallest class, the share of rows in classes below
    `k`, and the minimum number of distinct sensitive values in any
    class (l-diversity floor). min_l = 1 means some class leaks its
    members' domain outright.

    Scale shape: one groupBy on the QI pair (tiny key space), then a
    1-row rollup — no windows, no joins. At 100 TB the QI aggregate is
    the only shuffle and it collapses map-side.
    """
    from pyspark.sql import functions as F

    from ..functions.columns import email_domain

    qi = profiles.select(
        F.col("gender"),
        (F.floor(F.col("age") / 10) * 10).cast("int").alias("age_band"),
        email_domain(F.col("email")).alias("domain"),
    )
    classes = qi.groupBy("gender", "age_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("domain").alias("l"),
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").cast("long").alias("min_class_size"),
        (
            F.floor(
                F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
                / F.sum("n")
                * 10000
                + 0.5
            ).cast("long")
            / 10000.0
        ).alias("pct_rows_below_k"),
        F.min("l").cast("long").alias("min_l_diversity"),
    )


def generalization_ladder(
    profiles: DataFrame, k: int = K_ANONYMITY
) -> DataFrame:
    """Anonymization planning: k-anonymity measured at four
    quasi-identifier generalization levels in one result —
    (gender, exact age) → (gender, age decade) → (gender, 20-year
    band) → (gender only). The release process picks the FIRST level
    whose smallest equivalence class reaches `k` (meets_k): the
    minimal generalization that makes the table safe, instead of
    over-coarsening everything.

    Scale shape: four grouped aggregates over tiny key spaces
    (each collapses map-side), unioned into a 4-row ladder; no
    windows, no joins.
    """
    from pyspark.sql import functions as F

    levels = [
        (1, "gender_x_age", F.col("age").cast("int")),
        (2, "gender_x_decade", (F.floor(F.col("age") / 10) * 10).cast("int")),
        (3, "gender_x_band20", (F.floor(F.col("age") / 20) * 20).cast("int")),
        (4, "gender_only", F.lit(0)),
    ]
    out = None
    for level_id, name, band in levels:
        classes = (
            profiles.select("gender", band.alias("band"))
            .groupBy("gender", "band")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        row = classes.agg(
            F.lit(level_id).alias("level_id"),
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_classes"),
            F.min("n").cast("long").alias("min_class_size"),
            F.floor(
                F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
                / F.sum("n")
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("rows_below_k_ppm"),
            (F.min("n") >= k).alias("meets_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("level_id")
