"""Durable erase-request ledger (round-9 ask #2): one GDPR request
must be provably applied to ALL maintained artifacts even across a
driver crash mid-sequence. The ledger records the subject set before
any artifact is touched, marks each artifact applied only after its
erase returns, surfaces the gap per (request, artifact), and resumes
by applying exactly the gap — leaning on each artifact's own
idempotent-repeat semantics so a marker lost in the crash window is
a harmless re-run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    governance as gov,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _subjects(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def test_open_is_idempotent_and_preserves_progress(spark, tmp_path):
    led = str(tmp_path / "led")
    st = gov.erase_request_open(spark, led, "r1", _subjects(spark, range(5)))
    assert st == {"request_id": "r1", "n_subjects": 5}
    gov.erase_request_mark_applied(led, "r1", "band_index")
    # re-open (replayed workflow step): same subjects, progress kept
    st2 = gov.erase_request_open(
        spark, led, "r1", _subjects(spark, range(5))
    )
    assert st2["n_subjects"] == 5
    status = {
        (r.request_id, r.artifact): r.applied
        for r in gov.erase_request_status(spark, led).collect()
    }
    assert status[("r1", "band_index")] == 1
    assert status[("r1", "shard_manifest")] == 0
    assert len(status) == len(gov.ERASURE_ARTIFACTS)
    with pytest.raises(ValueError, match="plain token"):
        gov.erase_request_open(spark, led, "a/b", _subjects(spark, [1]))
    with pytest.raises(ValueError, match="os.listdir"):
        gov.erase_request_status(spark, "s3a://bucket/led")


def test_crash_between_artifacts_resumes_exactly_the_gap(
    spark, tmp_path
):
    """The VERDICT r8 seam verbatim: the driver dies after 2 of 5
    artifacts — the ledger must report exactly the 3 pending, and
    the resume must run exactly those 3 (never re-erasing the
    applied ones)."""
    led = str(tmp_path / "led")
    gov.erase_request_open(spark, led, "r9", _subjects(spark, range(7)))
    calls = []

    def applier(name, explode_at=None):
        def f(subjects):
            if name == explode_at:
                raise RuntimeError("simulated driver crash")
            calls.append((name, subjects.count()))

        return f

    appliers = {
        a: applier(a, explode_at="cluster_labels")
        for a in gov.ERASURE_ARTIFACTS
    }
    with pytest.raises(RuntimeError, match="simulated driver crash"):
        gov.apply_erase_request(spark, led, "r9", appliers)
    # deterministic (sorted) order: band_index and chunk_digest_index
    # ran and are marked; cluster_labels crashed unmarked
    pending = sorted(
        r.artifact
        for r in gov.erase_request_status(spark, led).collect()
        if not r.applied
    )
    assert pending == [
        "cluster_labels",
        "ivfpq_codes",
        "sft_prefix_index",
        "shard_manifest",
    ]
    assert [c[0] for c in calls] == ["band_index", "chunk_digest_index"]

    # resume with healthy appliers: exactly the gap runs
    calls.clear()
    res = gov.apply_erase_request(
        spark, led, "r9", {a: applier(a) for a in gov.ERASURE_ARTIFACTS}
    )
    assert res["ran"] == [
        "cluster_labels",
        "ivfpq_codes",
        "sft_prefix_index",
        "shard_manifest",
    ]
    assert res["skipped"] == ["band_index", "chunk_digest_index"]
    assert [c[0] for c in calls] == res["ran"]
    assert all(n == 7 for _, n in calls)
    assert all(
        r.applied
        for r in gov.erase_request_status(spark, led).collect()
    )
    # fully-applied replay is a pure no-op
    calls.clear()
    res2 = gov.apply_erase_request(
        spark, led, "r9", {a: applier(a) for a in gov.ERASURE_ARTIFACTS}
    )
    assert res2["ran"] == [] and len(res2["skipped"]) == len(
        gov.ERASURE_ARTIFACTS
    )
    assert calls == []


def test_ledger_drives_real_artifacts_end_to_end(spark, tmp_path):
    """Integration: the ledger workflow drives REAL erases on two
    maintained artifacts (manifest + band index), crashes between
    them, resumes, and both artifacts verifiably exclude the
    subjects — including the manifest repeat-safety when the marker
    is lost AFTER the erase ran (the erase re-runs as a suppressed
    no-op instead of double-subtracting)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
        pipeline,
    )

    rows = [
        (int(i), " ".join(f"w{i}q{j} tok{j}" for j in range(12)))
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    subj = docs.filter(F.col("doc_id") < 5)
    mpath = str(tmp_path / "m")
    bpath = str(tmp_path / "b")
    led = str(tmp_path / "led")
    pipeline.build_manifest_artifact(docs, mpath)
    dedup.write_band_index(docs, bpath)
    gov.erase_request_open(spark, led, "req", subj.select("doc_id"))

    def erase_manifest(ids):
        pipeline.manifest_erase(
            spark, mpath, docs.join(F.broadcast(ids), "doc_id", "left_semi")
        )

    def erase_band(ids):
        dedup.band_index_erase(spark, bpath, ids)

    # crash AFTER the manifest erase ran but BEFORE its marker: the
    # worst ordering — resume re-runs the manifest erase, which must
    # be a suppressed no-op (idempotent repeat), not a double-apply
    def erase_manifest_then_crash(ids):
        erase_manifest(ids)
        raise RuntimeError("simulated crash before marker")

    with pytest.raises(RuntimeError, match="before marker"):
        gov.apply_erase_request(
            spark,
            led,
            "req",
            {"a_manifest": erase_manifest_then_crash, "b_band": erase_band},
        )
    pending = sorted(
        r.artifact
        for r in gov.erase_request_status(
            spark, led, artifacts=("a_manifest", "b_band")
        ).collect()
        if not r.applied
    )
    assert pending == ["a_manifest", "b_band"]

    res = gov.apply_erase_request(
        spark,
        led,
        "req",
        {"a_manifest": erase_manifest, "b_band": erase_band},
    )
    assert res["ran"] == ["a_manifest", "b_band"]
    # both artifacts verifiably exclude the subjects, exactly once
    fold = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, mpath).collect()
    }
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            docs.filter(F.col("doc_id") >= 5)
        ).collect()
    }
    assert fold == want
    assert (
        dedup.read_band_index_serving(spark, bpath)
        .join(F.broadcast(subj.select("doc_id")), "doc_id", "left_semi")
        .count()
        == 0
    )


def _stream_requests(spark, tmp_path, reqs):
    """Stage (request_id, doc_id) micro-batch files with pinned
    mtimes so FileStreamSource order is deterministic."""
    import glob
    import shutil
    import time

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    bt = time.time()
    for i, (rid, ids) in enumerate(reqs):
        stage = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(
            [(rid, int(d)) for d in ids], "request_id string, doc_id long"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (bt + 10 * i, bt + 10 * i))
    return in_dir


def test_erase_request_stream_applies_and_replays_as_noop(
    spark, tmp_path
):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
        pipeline,
    )

    docs = spark.createDataFrame(
        [(int(i), f"erase stream doc {i} word{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    mpath, led = str(tmp_path / "m"), str(tmp_path / "led")
    pipeline.build_manifest_artifact(docs, mpath)
    appliers = {
        "shard_manifest": lambda ids: pipeline.manifest_erase(
            spark,
            mpath,
            docs.join(F.broadcast(ids), "doc_id", "left_semi"),
        ),
    }
    in_dir = _stream_requests(
        spark, tmp_path, [("r1", range(0, 5)), ("r2", range(10, 14))]
    )

    def run(ck):
        stream = (
            spark.readStream.schema("request_id string, doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = pipeline.run_erase_request_stream(
            spark, stream, led, appliers, ck
        )
        assert q.awaitTermination(120), q.exception()

    run(str(tmp_path / "ck1"))
    assert gov.list_requests(led) == ["r1", "r2"]
    status = {
        (r.request_id, r.artifact): r.applied
        for r in gov.erase_request_status(
            spark, led, artifacts=("shard_manifest",)
        ).collect()
    }
    assert all(v == 1 for v in status.values()) and len(status) == 2
    survivors = docs.filter(
        ~F.col("doc_id").isin(*range(0, 5), *range(10, 14))
    )
    want = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(survivors).collect()
    }
    got = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, mpath).collect()
    }
    assert got == want

    # checkpoint reset: both request batches REPLAY into the same
    # ledger and artifact — idempotent re-open + applied-marker skip
    # + the artifact's own repeat suppression keep the fold identical
    run(str(tmp_path / "ck2"))
    got2 = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, mpath).collect()
    }
    assert got2 == want


def test_erase_request_stream_crash_mid_batch_resumes_gap(
    spark, tmp_path
):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
        pipeline,
    )

    docs = spark.createDataFrame(
        [(int(i), f"crash stream doc {i}") for i in range(30)],
        "doc_id long, text string",
    )
    mpath, pfx, led = (
        str(tmp_path / "m"),
        str(tmp_path / "pfx"),
        str(tmp_path / "led"),
    )
    pipeline.build_manifest_artifact(docs, mpath)
    pipeline.build_sft_prefix_index(
        docs.withColumn("text", F.concat(F.lit("u: "), F.col("text"))),
        pfx,
    )
    calls = {"n": 0}

    def flaky_prefix(ids):
        # crash on the FIRST attempt only — after the manifest
        # applier already ran and was marked
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("planted crash between artifacts")
        pipeline.sft_prefix_index_erase(spark, pfx, ids)

    appliers = {
        "a_manifest": lambda ids: pipeline.manifest_erase(
            spark,
            mpath,
            docs.join(F.broadcast(ids), "doc_id", "left_semi"),
        ),
        "b_prefix": flaky_prefix,
    }
    in_dir = _stream_requests(spark, tmp_path, [("r1", range(0, 6))])

    def run(ck):
        stream = (
            spark.readStream.schema("request_id string, doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = pipeline.run_erase_request_stream(
            spark, stream, led, appliers, ck
        )
        try:
            ok = q.awaitTermination(120)
            return ok, q.exception()
        except Exception as e:  # StreamingQueryException surfaces here
            return False, e

    ok, exc = run(str(tmp_path / "ck1"))
    assert exc is not None  # the planted crash surfaced loudly
    status = {
        r.artifact: r.applied
        for r in gov.erase_request_status(
            spark, led, artifacts=("a_manifest", "b_prefix")
        ).collect()
    }
    assert status == {"a_manifest": 1, "b_prefix": 0}  # visible gap

    # restart (fresh checkpoint — the batch replays): ONLY the gap
    # applies; the manifest applier is skipped via its marker
    ok, exc = run(str(tmp_path / "ck2"))
    assert ok and exc is None
    status = {
        r.artifact: r.applied
        for r in gov.erase_request_status(
            spark, led, artifacts=("a_manifest", "b_prefix")
        ).collect()
    }
    assert status == {"a_manifest": 1, "b_prefix": 1}
    assert (
        pipeline.read_sft_prefix_index(spark, pfx)
        .filter(F.col("doc_id") < 6)
        .count()
        == 0
    )
    # the manifest folded the subjects out exactly ONCE
    want = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            docs.filter(F.col("doc_id") >= 6)
        ).collect()
    }
    got = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, mpath).collect()
    }
    assert got == want


def test_sla_time_dimension_and_report(spark, tmp_path):
    """r11: intake/applied event times + the per-request SLA fold —
    first-intake wins on re-open, the workflow clock stamps markers,
    legacy markers read as time-unknown, and the four overdue
    quadrants fold correctly."""
    led = str(tmp_path / "led")
    t0 = 1_700_000_000
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, range(5)), intake_ts=t0
    )
    # re-open with a LATER ts: the SLA clock starts at FIRST intake
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, range(5)), intake_ts=t0 + 999
    )
    assert gov.read_intake_ts(led, "r1") == t0
    # the workflow's clock stamps each marker
    ticks = iter(range(t0 + 100, t0 + 100 + 60, 10))
    arts = list(gov.ERASURE_ARTIFACTS)
    gov.apply_erase_request(
        spark,
        led,
        "r1",
        {a: (lambda ids: None) for a in arts},
        clock=lambda: next(ticks),
    )
    # stuck request: intake only, no artifacts applied
    gov.erase_request_open(
        spark, led, "r2", _subjects(spark, [9]), intake_ts=t0
    )
    # legacy request: no intake ts, legacy "1" marker bodies
    gov.erase_request_open(spark, led, "r0", _subjects(spark, [7]))
    gov.erase_request_mark_applied(led, "r0", arts[0])
    rows = {
        r.request_id: r
        for r in gov.erase_request_sla_report(
            spark, led, deadline_seconds=3_600, as_of_ts=t0 + 10_000
        ).collect()
    }
    r1 = rows["r1"]
    assert r1.completed == 1
    assert r1.intake_ts == t0
    assert r1.completed_ts == t0 + 150  # last of 6 ticks
    assert r1.latency_seconds == 150
    assert r1.overdue == 0
    r2 = rows["r2"]
    assert (r2.completed, r2.latency_seconds) == (0, None)
    assert r2.overdue == 1  # 10_000 s past a 3_600 s deadline
    r0 = rows["r0"]
    assert r0.intake_ts is None and r0.overdue == 0  # no clock: never flags
    # within-deadline view of the same ledger: r2 not yet overdue
    rows2 = {
        r.request_id: r.overdue
        for r in gov.erase_request_sla_report(
            spark, led, deadline_seconds=3_600, as_of_ts=t0 + 1_000
        ).collect()
    }
    assert rows2["r2"] == 0


def test_erase_request_stream_stamps_sla_times(spark, tmp_path):
    """r11: the streaming intake path stamps the SLA event times —
    intake at request open, applied per artifact — and a checkpoint
    reset replay does NOT reset a request's intake clock
    (first-intake wins)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
        pipeline,
    )

    docs = spark.createDataFrame(
        [(int(i), f"sla stream doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    mpath, led = str(tmp_path / "m"), str(tmp_path / "led")
    pipeline.build_manifest_artifact(docs, mpath)
    appliers = {
        "shard_manifest": lambda ids: pipeline.manifest_erase(
            spark,
            mpath,
            docs.join(F.broadcast(ids), "doc_id", "left_semi"),
        ),
    }
    in_dir = _stream_requests(spark, tmp_path, [("r1", range(0, 3))])
    t0 = 1_700_000_000
    ticks = iter(range(t0, t0 + 10_000, 7))

    def run(ck, clk):
        stream = (
            spark.readStream.schema("request_id string, doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = pipeline.run_erase_request_stream(
            spark, stream, led, appliers, ck, clock=clk
        )
        assert q.awaitTermination(120), q.exception()

    run(str(tmp_path / "ck1"), lambda: next(ticks))
    assert gov.read_intake_ts(led, "r1") == t0
    row = gov.erase_request_sla_report(
        spark,
        led,
        deadline_seconds=3_600,
        as_of_ts=t0 + 100,
        artifacts=("shard_manifest",),
    ).collect()[0]
    assert row.completed == 1 and row.overdue == 0
    assert row.intake_ts == t0 and row.completed_ts == t0 + 7
    assert row.latency_seconds == 7
    # replay with a much later clock: intake must NOT move
    late = iter(range(t0 + 999_000, t0 + 999_100, 1))
    run(str(tmp_path / "ck2"), lambda: next(late))
    assert gov.read_intake_ts(led, "r1") == t0


def _stream_sla_events(spark, tmp_path, batches):
    """Stage SLA event micro-batch files (request_id, kind,
    artifact, doc_id, event_ts) with pinned mtimes."""
    import glob
    import shutil
    import time

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir, exist_ok=True)
    bt = time.time()
    schema = (
        "request_id string, kind string, artifact string, "
        "doc_id long, event_ts long"
    )
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"ev_stage_{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (bt + 10 * i, bt + 10 * i))
    return in_dir


def test_sla_stream_live_breach_appears_and_replay_is_identical(
    spark, tmp_path
):
    """r12 (VERDICT r11 #4): the streaming SLA monitor detects a
    LIVE breach exactly when the event-time high-water mark crosses
    intake + deadline — unflagged in batch 0, flagged in batch 1 —
    and a checkpoint-reset replay reproduces every batch report
    byte-for-byte (the ledger bookkeeps replay safety: first-intake
    wins, marker stamps idempotent, hwm derived from the ledger)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
        pipeline,
    )

    t0 = 1_700_000_000
    deadline = 3_600
    arts = ("a_manifest", "b_band")
    b0 = [
        ("r1", "intake", None, 1, t0),
        ("r1", "applied", "a_manifest", None, t0 + 50),
        ("r1", "applied", "b_band", None, t0 + 80),
        ("r2", "intake", None, 2, t0),
        ("r2", "applied", "a_manifest", None, t0 + 100),
        # r2 never completes; hwm at batch 0 is t0+100 (no breach)
    ]
    b1 = [
        # a fresh request whose events push the hwm past r2's
        # deadline — r2 must flip to a live breach
        ("r3", "intake", None, 3, t0 + 10_000),
        ("r3", "applied", "a_manifest", None, t0 + 10_050),
        ("r3", "applied", "b_band", None, t0 + 10_090),
    ]
    in_dir = _stream_sla_events(spark, tmp_path, [b0, b1])
    led = str(tmp_path / "sla_led")
    out = str(tmp_path / "sla_out")

    def run(ck):
        stream = (
            spark.readStream.schema(
                "request_id string, kind string, artifact string, "
                "doc_id long, event_ts long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = pipeline.run_erasure_sla_stream(
            spark, stream, led, deadline, out, ck, artifacts=arts
        )
        assert q.awaitTermination(180), q.exception()

    run(str(tmp_path / "sla_ck1"))

    def report(batch_id):
        return {
            r.request_id: (r.completed, r.overdue)
            for r in spark.read.parquet(
                os.path.join(out, "sla", f"batch_id={batch_id}")
            ).collect()
        }

    rep0, rep1 = report(0), report(1)
    assert rep0 == {"r1": (1, 0), "r2": (0, 0)}  # within deadline
    # batch 1: hwm = t0+10090 > t0+3600 -> r2 is a LIVE breach now
    assert rep1 == {"r1": (1, 0), "r2": (0, 1), "r3": (1, 0)}
    # subjects and stamps landed through the public ledger API
    assert gov.read_intake_ts(led, "r2") == t0
    # checkpoint reset: the full replay reproduces both reports
    run(str(tmp_path / "sla_ck2"))
    assert report(0) == rep0 and report(1) == rep1
    assert gov.read_intake_ts(led, "r1") == t0  # intake never moved
