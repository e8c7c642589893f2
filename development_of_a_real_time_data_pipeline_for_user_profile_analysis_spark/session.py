"""SparkSession factory tuned for the engine.

Local mode is for tests/bench only; every knob here is chosen so the
same logical plans scale to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy) so shuffle partition counts self-tune with data volume.
- Broadcast threshold raised to 64 MiB: the star-schema dims
  (region/nation/supplier/part at any SF, and per-batch lookup sides)
  should never sort-merge.
- Arrow enabled for the (rare) Pandas-UDF paths.
- Session timezone pinned to UTC so event-time semantics do not
  depend on cluster locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "upa-engine",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet has drifted between nanos-int64 and micros
        # flavors across regenerations; nanos columns surface as long
        # and readers.load_table converts them explicitly. Set once
        # here — NOT toggled from per-table read paths.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write µs-annotated int64 timestamps, not the deprecated
        # INT96 default: engine-written corpora (soak replicas, wire
        # logs, sinks) must round-trip through the same footer-probe
        # read paths as the driver testdata, and INT96 is opaque to
        # the arrow-side schema probe (surfaces as ns).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine conf to an externally-created
    session (the driver hands us one we didn't build). Memoized per
    session object: this runs on EVERY registry query invocation, and
    the four py4j conf round-trips are pure overhead after the first
    call (r12 — ~2,800 calls per bench run)."""
    if getattr(spark, "_eng_conf_applied", False):
        return spark
    spark._eng_conf_applied = True
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    return spark
