"""Table writers — the storage-layout half of the 100 TB design.

The reference wrote rows to Cassandra/Mongo (Real_Time_Data.py:139-157)
with no layout control. Here the curated/silver tables are parquet
with explicit layout:

- ``write_partitioned``: hive-style partition directories → partition
  pruning turns predicate scans into directory listings.
- ``write_bucketed``: ``bucketBy`` on the join key → two tables
  bucketed the same way join with ZERO exchange on either side (the
  co-located join a 100 TB fact⋈fact needs; verified by
  tests/test_sinks.py asserting no Exchange in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucket metadata only exists through the
    catalog, so this is saveAsTable, not a path write)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def create_curated_table(
    spark: SparkSession, table: str = "user_profiles", location: str | None = None
) -> None:
    """Engine-native DDL for the curated table — replaces the
    reference's out-of-band cassandra-driver CREATE KEYSPACE/TABLE
    side-channel (Real_Time_Data.py:113-136). The schema string is
    derived from the single declared PROFILE_SCHEMA, so the DDL can
    never drift from the transform output."""
    from ..schemas import PROFILE_SCHEMA

    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}" for f in PROFILE_SCHEMA.fields
    )
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING parquet{loc}"
    )


ROUNDTRIP_FORMATS = ("orc", "csv", "json")


def format_roundtrip_counts(
    documents: DataFrame, formats: tuple[str, ...] = ROUNDTRIP_FORMATS
) -> DataFrame:
    """Write documents through each columnar/row format and read them
    back, proving the sink→source path preserves every row: per-format
    per-source row counts + char totals over the re-read copies. CSV
    and JSON are schema-on-read (explicit schema, header for CSV) —
    silently dropped or type-coerced rows would break the count or the
    sum against the oracle."""
    import tempfile

    from pyspark.sql import functions as F

    spark = documents.sparkSession
    slim = documents.select("doc_id", "text", "source", "n_chars")
    schema = slim.schema
    parts = []
    for fmt in formats:
        d = tempfile.mkdtemp(prefix=f"roundtrip_{fmt}_")
        w = slim.write.mode("overwrite").format(fmt)
        r = spark.read.format(fmt).schema(schema)
        if fmt == "csv":
            w = w.option("header", "true")
            r = r.option("header", "true")
        w.save(d)
        parts.append(
            r.load(d)
            .groupBy(F.lit(fmt).alias("fmt"), "source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("total_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fmt", "source")


def schema_evolution_counts(documents: DataFrame) -> DataFrame:
    """Schema-evolution-on-read proof: two parquet batches with
    DIFFERENT column sets (an old writer without `lang`, a new writer
    without `source`) land in one dataset directory;
    ``mergeSchema`` reads the union schema and absent columns surface
    as NULLs — the contract every long-lived 100 TB table relies on
    as producers upgrade. The audit counts rows and per-column NULLs
    per batch, so a silent column drop or misalignment turns the
    oracle red.

    Scale note: mergeSchema footer-merge cost scales with file count,
    not bytes — production tables pin the merged schema in a
    catalog; this query proves the read semantics.
    """
    import tempfile

    from pyspark.sql import functions as F

    spark = documents.sparkSession
    d = tempfile.mkdtemp(prefix="schema_evo_")
    old_batch = documents.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", "source"
    )
    new_batch = documents.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang"
    )
    old_batch.write.mode("overwrite").parquet(f"{d}/batch=old")
    new_batch.write.mode("overwrite").parquet(f"{d}/batch=new")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    return (
        merged.groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("source").isNull().cast("long")).alias(
                "null_source"
            ),
            F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
        )
        .orderBy("batch")
    )


CSV_CORRUPT_EVERY = 10  # interpolated into the registry oracle


def csv_malformed_audit(
    documents: DataFrame, corrupt_every: int = CSV_CORRUPT_EVERY
) -> DataFrame:
    """PERMISSIVE CSV ingest with dead-lettering — the CSV twin of the
    JSON `etl_dead_letter` path: a CSV landing file with every Nth
    line corrupted (too few columns / non-numeric id) parses with an
    explicit schema + ``columnNameOfCorruptRecord``; good rows keep
    their values, bad lines surface in the corrupt column for a
    quarantine sink instead of vanishing. Returns the audit counts.

    The corrupt column must be REQUESTED in the projection for
    PERMISSIVE capture to populate it (same Spark contract the JSON
    path documents).
    """
    import tempfile

    from pyspark.sql import functions as F

    spark = documents.sparkSession
    d = tempfile.mkdtemp(prefix="csv_audit_")
    # build the landing file deterministically: one CSV line per doc,
    # every Nth intentionally malformed with EXCESS tokens — the
    # condition Spark's CSV parser actually flags as malformed
    # (too-few tokens merely null-pad; a bad cast merely nulls the
    # field — both would pass silently)
    lines = documents.select(
        F.when(
            F.col("doc_id") % corrupt_every == 0,
            F.concat_ws(
                ",",
                F.lit("notanint"),
                F.col("source"),
                F.col("n_chars").cast("string"),
                F.lit("EXTRA"),
                F.lit("EXTRA2"),
            ),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("doc_id").cast("string"),
                F.col("source"),
                F.col("n_chars").cast("string"),
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(d)
    parsed = (
        spark.read.schema(
            "doc_id long, source string, n_chars long, _bad string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(d)
    )
    # Spark contract: with CSV column pruning, a downstream projection
    # that doesn't request every data column makes corrupt detection
    # consider only the parsed subset (extra tokens / bad casts in
    # unrequested columns pass silently), and corrupt-only queries
    # are rejected outright. The documented pattern is to materialize
    # the FULL parse first, then query it.
    parsed = parsed.cache()
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_bad").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(F.col("_bad").isNull().cast("long")).alias("n_good"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("n_chars"))).alias(
            "good_chars"
        ),
    )
