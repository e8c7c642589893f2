"""`userfeed` — the reference's HTTP poll feeder as a first-class
Spark data source (PySpark 4 Python DataSource API).

The reference ingests by polling the randomuser.me HTTP API in a
standalone Python process and publishing each response to Kafka
(producer.py:17-44); Spark only ever sees the Kafka topic. Here the
feeder IS a Spark source: `spark.read.format("userfeed")` /
`spark.readStream.format("userfeed")` yield the same wire-format JSON
envelopes (one `{"results":[{...}]}` document per user,
producer.py:38) directly as a DataFrame, so the ingest boundary is
planned, partitioned, and checkpointed by Spark itself instead of an
unmanaged sidecar process.

Rows come from the deterministic synthetic generator
(synthetic.envelope_dict) rather than the live API — same derivation
the oracle CTE mirrors, so the full DataSource → parse → curate chain
is value-verifiable. A real HTTP deployment would only swap
`envelope_dict(k)` for a `requests.get` call inside `read()`: the
partition/offset plumbing is exactly what a rate-limited API poller
needs (one partition per key range batch-side; monotone `next_k`
offsets stream-side).

Scale posture: the batch reader splits the key range into
`partitions` independent InputPartitions (executor-parallel, no
driver fan-in) and ships Arrow RecordBatches, not per-row pickles.
The stream reader is a SimpleDataSourceStreamReader — offsets are
plain `{"next_k": int}` dicts; `readBetweenOffsets` replays any
committed range bit-for-bit (the generator is pure), which is what
makes the source exactly-once under checkpoint recovery.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .synthetic import envelope_dict

SCHEMA_DDL = "k BIGINT, value STRING"

# -- Kafka wire contract --------------------------------------------
# The exact column contract of Spark's Kafka source
# (spark-sql-kafka-0-10; what reference Real_Time_Data.py:37-45 reads
# before `CAST(value AS STRING)`). The connector jar is absent from
# this offline runtime, so this source emits the same seven columns
# with deterministic values — the downstream ETL is thereby verified
# against the real wire schema (binary key/value, metadata columns)
# even though no broker exists. Wire model mirrors the reference
# producer: topic `user_data_topic` (producer.py:15), value-only
# messages (producer.py:40 passes no key -> key NULL), one send every
# 5 s (producer.py:44) anchored at 2015-01-01, round-robin partition
# assignment ((k-1) % P at offset (k-1) // P).
KAFKA_TOPIC = "user_data_topic"
KAFKA_WIRE_SCHEMA_DDL = (
    "key BINARY, value BINARY, topic STRING, partition INT, "
    "offset BIGINT, timestamp TIMESTAMP, timestampType INT"
)
PRODUCE_EPOCH = 1420070400  # 2015-01-01T00:00:00Z
PRODUCE_PERIOD_S = 5  # producer.py:44 cadence
_TS_CREATE_TIME = 0  # Kafka TimestampType.CREATE_TIME


def _envelope_rows(start: int, end: int) -> Iterator[Tuple[int, str]]:
    for k in range(start, end):
        yield k, json.dumps(envelope_dict(k))


@dataclass
class _KeyRange(InputPartition):
    start: int
    end: int  # exclusive


class UserFeedBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.start = int(options.get("start", 1))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        per = max(1, -(-self.n // self.num_partitions))  # ceil div
        lo, hi = self.start, self.start + self.n
        return [
            _KeyRange(s, min(s + per, hi)) for s in range(lo, hi, per)
        ]

    def read(self, partition: _KeyRange):
        import pyarrow as pa

        ks, values = [], []
        for k, v in _envelope_rows(partition.start, partition.end):
            ks.append(k)
            values.append(v)
        # one Arrow batch per partition: vector transfer to the JVM,
        # no per-row pickling
        yield pa.RecordBatch.from_arrays(
            [pa.array(ks, pa.int64()), pa.array(values, pa.string())],
            names=["k", "value"],
        )


class KafkaWireBatchReader(DataSourceReader):
    """Batch twin of the Kafka source: same seven columns, Arrow
    transfer, one RecordBatch per key-range partition."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.start = int(options.get("start", 1))
        self.num_partitions = int(options.get("partitions", 8))
        self.wire_partitions = int(options.get("wire_partitions", 3))
        self.keyed = options.get("keyed", "false").lower() == "true"

    def partitions(self) -> Sequence[InputPartition]:
        per = max(1, -(-self.n // self.num_partitions))
        lo, hi = self.start, self.start + self.n
        return [_KeyRange(s, min(s + per, hi)) for s in range(lo, hi, per)]

    def read(self, partition: _KeyRange):
        import pyarrow as pa

        keys, values, parts, offsets, stamps = [], [], [], [], []
        for k in range(partition.start, partition.end):
            keys.append(str(k).encode() if self.keyed else None)
            values.append(json.dumps(envelope_dict(k)).encode())
            parts.append((k - 1) % self.wire_partitions)
            offsets.append((k - 1) // self.wire_partitions)
            stamps.append((PRODUCE_EPOCH + (k - 1) * PRODUCE_PERIOD_S) * 1_000_000)
        n = len(values)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(keys, pa.binary()),
                pa.array(values, pa.binary()),
                pa.array([KAFKA_TOPIC] * n, pa.string()),
                pa.array(parts, pa.int32()),
                pa.array(offsets, pa.int64()),
                pa.array(stamps, pa.timestamp("us", tz="UTC")),
                pa.array([_TS_CREATE_TIME] * n, pa.int32()),
            ],
            names=[
                "key", "value", "topic", "partition",
                "offset", "timestamp", "timestampType",
            ],
        )


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the wire rows; offsets are the same
    pure `{"next_k": int}` contract as UserFeedStreamReader, so
    checkpoint replay is bit-for-bit."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.start_key = int(options.get("start", 1))
        self.max_rows = int(options.get("max_rows", 0))
        self.wire_partitions = int(options.get("wire_partitions", 3))
        self.keyed = options.get("keyed", "false").lower() == "true"

    def _rows(self, lo: int, hi: int) -> list:
        import datetime as dt

        out = []
        for k in range(lo, hi):
            out.append(
                (
                    str(k).encode() if self.keyed else None,
                    json.dumps(envelope_dict(k)).encode(),
                    KAFKA_TOPIC,
                    (k - 1) % self.wire_partitions,
                    (k - 1) // self.wire_partitions,
                    dt.datetime.fromtimestamp(
                        PRODUCE_EPOCH + (k - 1) * PRODUCE_PERIOD_S,
                        tz=dt.timezone.utc,
                    ),
                    _TS_CREATE_TIME,
                )
            )
        return out

    def initialOffset(self) -> dict:
        return {"next_k": self.start_key}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lo = start["next_k"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.start_key + self.max_rows)
        return self._rows(lo, hi), {"next_k": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return self._rows(start["next_k"], end["next_k"])


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "userfeed_kafka"

    def schema(self) -> str:
        return KAFKA_WIRE_SCHEMA_DDL

    def reader(self, schema: StructType) -> KafkaWireBatchReader:
        return KafkaWireBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KafkaWireStreamReader:
        return KafkaWireStreamReader(self.options)


class UserFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch poller: each `read` serves `rows_per_batch` new
    envelopes and advances the offset; any (start, end) offset pair
    replays identically because the generator is pure."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.start_key = int(options.get("start", 1))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"next_k": self.start_key}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lo = start["next_k"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.start_key + self.max_rows)
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator on replay
        return list(_envelope_rows(lo, hi)), {"next_k": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return list(_envelope_rows(start["next_k"], end["next_k"]))


class UserFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "userfeed"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> UserFeedBatchReader:
        return UserFeedBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> UserFeedStreamReader:
        return UserFeedStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the `userfeed` format on a session."""
    spark.dataSource.register(UserFeedDataSource)


def register_kafka_wire(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)


def read_kafka_wire(
    spark,
    n: int,
    start: int = 1,
    partitions: int = 8,
    wire_partitions: int = 3,
    keyed: bool = False,
):
    """Batch: n messages in the exact Kafka source column contract."""
    register_kafka_wire(spark)
    return (
        spark.read.format("userfeed_kafka")
        .option("n", n)
        .option("start", start)
        .option("partitions", partitions)
        .option("wire_partitions", wire_partitions)
        .option("keyed", str(keyed).lower())
        .load()
    )


def read_kafka_wire_stream(
    spark,
    rows_per_batch: int = 100,
    start: int = 1,
    keyed: bool = False,
    max_rows: int = 0,
):
    """Streaming: the Kafka wire contract as an unbounded source
    (``max_rows`` > 0 bounds the feed for deterministic availableNow
    runs)."""
    register_kafka_wire(spark)
    return (
        spark.readStream.format("userfeed_kafka")
        .option("rows_per_batch", rows_per_batch)
        .option("start", start)
        .option("keyed", str(keyed).lower())
        .option("max_rows", max_rows)
        .load()
    )


def read_envelopes(spark, n: int, start: int = 1, partitions: int = 8):
    """Batch: n wire-format envelopes as (k, value) rows."""
    register(spark)
    return (
        spark.read.format("userfeed")
        .option("n", n)
        .option("start", start)
        .option("partitions", partitions)
        .load()
    )


def read_envelope_stream(spark, rows_per_batch: int = 100, start: int = 1):
    """Streaming: the poller as an unbounded micro-batch source."""
    register(spark)
    return (
        spark.readStream.format("userfeed")
        .option("rows_per_batch", rows_per_batch)
        .option("start", start)
        .load()
    )
