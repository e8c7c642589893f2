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
