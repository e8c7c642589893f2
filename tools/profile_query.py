"""Per-job profile of one (or more) registry queries.

Runs each named query in THIS process's Spark session with the event
log enabled, times the noop-sink materialization exactly like
bench.py, then parses the event log to attribute the wall to Spark
jobs (with their job descriptions / call sites) vs driver-side gaps
(plan construction, Python work, filesystem fixture staging).

Usage:
    python tools/profile_query.py <sf_dir> <query> [query ...]
    python tools/profile_query.py /root/testdata/sf0.1 quality_capacity_eval

Output per query: total wall, per-job table (start-offset, dur,
description|call site), sum-of-jobs vs gap time. The event log is a
line-per-event JSON file under /tmp/eng_eventlog_<pid>.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    evdir = f"/tmp/eng_eventlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # warmup (bench parity: JIT/codegen for the major plan shapes)
    for wname in ("total_users", "pricing_summary"):
        QUERIES[wname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # two runs per query (bench parity: min-of-2 is what the driver
    # measures); the per-job report covers the SECOND, warm run
    for name in names:
        walls = []
        for run in range(2):
            t0 = time.time()
            t0_ms = int(t0 * 1000)
            df = QUERIES[name](spark, sf_dir)
            t_plan = time.time()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            walls.append(t1 - t0)
        print(
            f"\n=== {name}: warm wall {walls[1]:.2f}s (cold {walls[0]:.2f}s; "
            f"warm construct {t_plan - t0:.2f}s, "
            f"materialize {t1 - t_plan:.2f}s)"
        )
        _report_jobs(evdir, app_id, t0_ms, int(t1 * 1000))

    spark.stop()


def _scan_events(
    path: str, jobs: dict[int, dict], t0_ms: int, t1_ms: int
) -> None:
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                ts = ev["Submission Time"]
                if ts < t0_ms or ts > t1_ms:
                    continue
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or props.get(
                    "callSite.short", ""
                )
                jobs[ev["Job ID"]] = {"start": ts, "desc": desc}
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]


def _report_jobs(evdir: str, app_id: str, t0_ms: int, t1_ms: int) -> None:
    # Spark 4 rolling layout: eventlog_v2_<appid>/events_*; fall back
    # to the single-file layouts of older versions.
    roll = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(roll):
        paths = sorted(
            os.path.join(roll, f)
            for f in os.listdir(roll)
            if f.startswith("events_")
        )
    elif os.path.exists(os.path.join(evdir, app_id + ".inprogress")):
        paths = [os.path.join(evdir, app_id + ".inprogress")]
    else:
        paths = [os.path.join(evdir, app_id)]
    jobs: dict[int, dict] = {}
    for path in paths:
        _scan_events(path, jobs, t0_ms, t1_ms)
    done = [
        (jid, j)
        for jid, j in sorted(jobs.items())
        if "end" in j
    ]
    tot_job = sum(j["end"] - j["start"] for _, j in done) / 1000.0
    wall = (t1_ms - t0_ms) / 1000.0
    print(
        f"  {len(done)} jobs, sum-of-job-time {tot_job:.2f}s, "
        f"driver gaps ~{max(0.0, wall - tot_job):.2f}s "
        "(serial-job approximation)"
    )
    for jid, j in done:
        off = (j["start"] - t0_ms) / 1000.0
        dur = (j["end"] - j["start"]) / 1000.0
        if dur < 0.05:
            continue
        print(f"  +{off:7.2f}s  {dur:6.2f}s  job {jid}  {j['desc'][:100]}")


if __name__ == "__main__":
    main()
