"""Streaming sources beyond files/Kafka.

``rate_envelope_stream`` turns the built-in rate source into an
infinite deterministic envelope feeder — the load-generator
equivalent of the reference's randomuser.me poller (producer.py),
entirely JVM-side: the rate source's monotonically increasing
``value`` seeds the same column derivation the batch feeder uses, so
streamed users are bit-identical to batch users with the same key.
Soak tests get unbounded input with reproducible content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .synthetic import seed_user_columns


def rate_envelope_stream(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """Unbounded stream of envelope JSON values (column ``value``)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    k = F.col("value")  # rate source: 0, 1, 2, ...
    c = seed_user_columns(k)
    user = F.struct(
        c["gender"].alias("gender"),
        F.struct(
            c["title"].alias("title"), c["first"].alias("first"), c["last"].alias("last")
        ).alias("name"),
        F.struct(c["dob_str"].alias("date"), F.lit(None).cast("int").alias("age")).alias(
            "dob"
        ),
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
    return rate.select(
        F.to_json(F.struct(F.array(user).alias("results"))).alias("value")
    )
