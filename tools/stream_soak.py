"""Multi-batch streaming soak (VERDICT r4 ask #6): the round-4 soaks
replayed the corpus in ONE availableNow micro-batch, which proves the
aggregate but not bounded state under CONTINUOUS ingest. This harness
re-runs the stateful streaming queries with maxFilesPerTrigger=1 over
the 10x soak corpus (10 part files -> 10 micro-batches) and records
per-batch input rows, trigger latency and state-store rows — the
shape that certifies state stays bounded by the watermark horizon
while batches keep arriving.

    python tools/soak.py 10              # build the corpus first
    python tools/stream_soak.py [replication]

Prints one line per micro-batch per query plus a summary.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long,"
    " event_type string, value double, props string"
)


def run_query(spark, name, build, src_dir):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    df, mode = build(stream)
    qname = f"soak_{name}_{int(time.time())}"
    ckpt = tempfile.mkdtemp(prefix=f"stream_soak_{name}_")
    t0 = time.time()
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.time() - t0
    out_rows = spark.table(qname).count()
    batches = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        batches.append(
            {
                "batch": p["batchId"],
                "in_rows": p.get("numInputRows", 0),
                "ms": (p.get("durationMs") or {}).get(
                    "triggerExecution", -1
                ),
                "state_rows": sum(
                    o.get("numRowsTotal", 0) for o in ops
                ),
                "state_updated": sum(
                    o.get("numRowsUpdated", 0) for o in ops
                ),
                "dropped_by_watermark": sum(
                    o.get("numRowsDroppedByWatermark", 0) for o in ops
                ),
            }
        )
    print(f"\n== {name}: {len(batches)} batches, wall {wall:.1f}s, "
          f"{out_rows} output rows ==")
    for b in batches:
        print(
            f"  batch {b['batch']:>2}: in={b['in_rows']:>7} "
            f"lat={b['ms']:>6}ms state={b['state_rows']:>7} "
            f"upd={b['state_updated']:>7} dropped={b['dropped_by_watermark']}"
        )
    return batches


def _time_ordered_source(spark, src, repl, n_files=10):
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = f"/tmp/stream_soak_ordered_x{repl}"
    if not os.path.exists(os.path.join(out, "_READY")):
        df = spark.read.schema(EVENTS_SCHEMA).parquet(src)
        bucketed = df.withColumn(
            "b", F.ntile(n_files).over(Window.orderBy("ts"))
        )
        for i in range(1, n_files + 1):
            (
                bucketed.filter(F.col("b") == i)
                .drop("b")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{out}/part_{i:02d}")
            )
        # flatten: one data file per bucket, mtime ascending
        import glob
        import shutil

        t0 = time.time() - 1000
        for i in range(1, n_files + 1):
            (f,) = glob.glob(f"{out}/part_{i:02d}/part-*.parquet")
            dst = f"{out}/{i:02d}.parquet"
            shutil.move(f, dst)
            os.utime(dst, (t0 + i, t0 + i))
            shutil.rmtree(f"{out}/part_{i:02d}")
        with open(os.path.join(out, "_READY"), "w") as fh:
            fh.write("ok")
    return out


def main():
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        clicks_errors_stream_outer_join,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.stateful import (
        running_user_totals,
        streaming_last_touch,
    )

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = f"/tmp/soak_x{repl}/events.parquet"

    spark = get_spark(
        "stream-soak",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Continuous-ingest shape: the replicated soak corpus repeats the
    # SAME event-time window in every part file, so a naive
    # file-per-trigger replay makes every batch after the first
    # almost-entirely late (the watermark from batch 0 already covers
    # the whole window). Re-split the corpus into 10 files by
    # EVENT-TIME RANGE with mtimes pinned ascending (FileStreamSource
    # orders pending files by mtime), so each micro-batch advances
    # event time — the shape a real topic delivers.
    src = _time_ordered_source(spark, src, repl, n_files=10)

    run_query(
        spark,
        "streaming_user_totals",
        lambda s: (running_user_totals(s), "update"),
        src,
    )
    run_query(
        spark,
        "streaming_attribution",
        lambda s: (streaming_last_touch(s), "update"),
        src,
    )
    run_query(
        spark,
        "streaming_outer_join_errors",
        lambda s: (clicks_errors_stream_outer_join(s), "append"),
        src,
    )


if __name__ == "__main__":
    main()
