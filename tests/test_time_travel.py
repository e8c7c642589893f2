"""Snapshot retention + time-travel reads on the fenced compaction
protocol: compacting with snapshot=True parks the old base and the
retired segments under `_snapshots/epoch=N/` (rename-only), and
read_manifest_as_of(N) folds them into exactly the state the
artifact served at commit N — reproducible reads after later
adds/erases/compactions moved the artifact on, with vacuum as the
expire-snapshots knob. Recovery honors the marker's snapshot flag,
so a crash between publish and finish cannot turn a snapshotting
compaction into a discarding one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    artifact_lifecycle as alc,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
    shard_manifest,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
    build_manifest_artifact,
    manifest_add_batch,
    manifest_compact,
    manifest_erase,
    read_manifest_as_of,
    read_manifest_serving,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, ids):
    return spark.createDataFrame(
        [(int(i), f"time travel doc {i} body {i % 7}") for i in ids],
        "doc_id long, text string",
    )


def _rows(df):
    return {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in df.select(
            "shard", "n_docs", "n_tokens", "content_xor"
        ).collect()
    }


def _rebuild(corpus):
    return shard_manifest(corpus).select(
        "shard", "n_docs", "n_tokens", "content_xor"
    )


def test_as_of_reproduces_each_commit(spark, tmp_path):
    c0 = _docs(spark, range(0, 40))
    b1 = _docs(spark, range(100, 130))
    b2 = _docs(spark, range(200, 220))
    rm = c0.filter(F.col("doc_id") % 10 == 3)
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, b1, 1)
    st1 = manifest_compact(spark, m, snapshot=True)
    manifest_add_batch(spark, m, b2, 2)
    manifest_erase(spark, m, rm, seg_id=1)
    st2 = manifest_compact(spark, m, snapshot=True)

    assert alc.snapshot_epochs(m) == [st1["epoch"], st2["epoch"]]
    want1 = _rows(_rebuild(c0.unionByName(b1)))
    assert _rows(read_manifest_as_of(spark, m, st1["epoch"])) == want1
    final = (
        c0.join(rm.select("doc_id"), "doc_id", "left_anti")
        .unionByName(b1)
        .unionByName(b2)
    )
    want2 = _rows(_rebuild(final))
    assert _rows(read_manifest_as_of(spark, m, st2["epoch"])) == want2
    assert _rows(read_manifest_serving(spark, m)) == want2


def test_discarding_compaction_retains_nothing(spark, tmp_path):
    c0 = _docs(spark, range(0, 30))
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, _docs(spark, range(50, 60)), 1)
    st = manifest_compact(spark, m)  # snapshot defaults off
    assert alc.snapshot_epochs(m) == []
    with pytest.raises(ValueError, match="no retained snapshot"):
        read_manifest_as_of(spark, m, st["epoch"])


def test_vacuum_expires_oldest(spark, tmp_path):
    c0 = _docs(spark, range(0, 30))
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, _docs(spark, range(50, 60)), 1)
    st1 = manifest_compact(spark, m, snapshot=True)
    manifest_add_batch(spark, m, _docs(spark, range(70, 80)), 2)
    st2 = manifest_compact(spark, m, snapshot=True)
    assert alc.vacuum_snapshots(m, retain_last=1) == [st1["epoch"]]
    assert alc.snapshot_epochs(m) == [st2["epoch"]]
    with pytest.raises(ValueError, match="no retained snapshot"):
        read_manifest_as_of(spark, m, st1["epoch"])
    read_manifest_as_of(spark, m, st2["epoch"]).collect()
    with pytest.raises(ValueError, match="retain_last"):
        alc.vacuum_snapshots(m, retain_last=-1)
    assert alc.vacuum_snapshots(m, retain_last=0) == [st2["epoch"]]
    assert alc.snapshot_epochs(m) == []


def test_crash_between_publish_and_finish_keeps_snapshot(
    spark, tmp_path, monkeypatch
):
    """A crash after the base swap but before segment retirement:
    recovery rolls forward using the ON-DISK marker — including its
    snapshot flag — so the retired segments still land in the
    snapshot and the as-of read serves the committed state."""
    c0 = _docs(spark, range(0, 40))
    b1 = _docs(spark, range(100, 120))
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, b1, 1)

    real_finish = alc.finish_compaction

    def boom(path, marker):
        raise RuntimeError("planted crash before ledger retirement")

    monkeypatch.setattr(alc, "finish_compaction", boom)
    with pytest.raises(RuntimeError, match="planted crash"):
        manifest_compact(spark, m, snapshot=True)
    monkeypatch.setattr(alc, "finish_compaction", real_finish)

    # next serving read repairs the torn state (roll forward) and
    # must NOT double-fold
    want = _rows(_rebuild(c0.unionByName(b1)))
    assert _rows(read_manifest_serving(spark, m)) == want
    # the roll-forward honored the snapshot flag: epoch 1 retained
    assert alc.snapshot_epochs(m) == [1]
    assert _rows(read_manifest_as_of(spark, m, 1)) == want


def test_prefix_index_snapshots_and_targeted_drop(spark, tmp_path):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        sft_prefix_digests,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        build_sft_prefix_index,
        read_sft_prefix_index,
        read_sft_prefix_index_as_of,
        sft_prefix_index_compact,
        sft_prefix_index_erase,
    )

    def prompts(ids):
        return spark.createDataFrame(
            [(int(i), f"u: question number {i}") for i in ids],
            "doc_id long, text string",
        )

    corpus, b1 = prompts(range(0, 20)), prompts(range(50, 60))
    subj = corpus.filter(F.col("doc_id") % 5 == 2).select("doc_id")
    pfx = str(tmp_path / "pfx")
    build_sft_prefix_index(corpus, pfx)
    sft_prefix_digests(b1).write.parquet(f"{pfx}/adds/batch_id=1")
    st1 = sft_prefix_index_compact(spark, pfx, snapshot=True)
    sft_prefix_index_erase(spark, pfx, subj, seg_id=1)
    st2 = sft_prefix_index_compact(spark, pfx, snapshot=True)

    def ids_of(df):
        return {r.doc_id for r in df.select("doc_id").collect()}

    subj_ids = {r.doc_id for r in subj.collect()}
    all_ids = set(range(0, 20)) | set(range(50, 60))
    # epoch 1 = pre-erase state (the leak); epoch 2 folds tombstones
    assert ids_of(read_sft_prefix_index_as_of(spark, pfx, st1["epoch"])) == all_ids
    assert (
        ids_of(read_sft_prefix_index_as_of(spark, pfx, st2["epoch"]))
        == all_ids - subj_ids
    )
    assert ids_of(read_sft_prefix_index(spark, pfx)) == all_ids - subj_ids
    # targeted drop removes ONLY the leaking epoch
    assert alc.drop_snapshot(pfx, st1["epoch"]) is True
    assert alc.drop_snapshot(pfx, st1["epoch"]) is False  # idempotent
    assert alc.snapshot_epochs(pfx) == [st2["epoch"]]
    read_sft_prefix_index_as_of(spark, pfx, st2["epoch"]).collect()
    with pytest.raises(ValueError, match="no retained snapshot"):
        read_sft_prefix_index_as_of(spark, pfx, st1["epoch"])


def test_snapshot_carries_provenance_stamp(spark, tmp_path):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        governance as gov,
    )

    c0 = _docs(spark, range(0, 30))
    b1 = _docs(spark, range(50, 60))
    b2 = _docs(spark, range(80, 90))
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    v0, n0 = gov.corpus_version_scalar(c0)
    gov.stamp_provenance(m, "shard_manifest", v0, n0)
    # the revision discipline: the DELTA stamps the provenance when
    # it lands, BEFORE any compaction — so the snapshot a later
    # compaction retains carries the version matching its own fold
    manifest_add_batch(spark, m, b1, 1)
    gov.provenance_apply_delta(m, added_docs=b1)
    v1, n1 = gov.corpus_version_scalar(c0.unionByName(b1))
    st = manifest_compact(spark, m, snapshot=True)
    snap_prov = gov.read_provenance(alc.snapshot_dir(m, st["epoch"]))
    assert snap_prov == {
        "artifact": "shard_manifest",
        "version_xor": v1,
        "n_docs": n1,
    }
    # the live artifact moves on; the snapshot's stamp stays frozen
    manifest_add_batch(spark, m, b2, 2)
    gov.provenance_apply_delta(m, added_docs=b2)
    assert gov.read_provenance(m)["version_xor"] != v1
    assert (
        gov.read_provenance(alc.snapshot_dir(m, st["epoch"]))[
            "version_xor"
        ]
        == v1
    )


def _torn_publish_state(spark, tmp_path, monkeypatch, crash_at_call):
    """Drive a real snapshotting compaction into a torn PUBLISH by
    crashing the Nth os.rename inside the swap fence (1 = after the
    marker, before the base is parked; 2 = base parked, scratch not
    yet live — the previously unrecoverable 'missing base' window)."""
    c0 = _docs(spark, range(0, 40))
    b1 = _docs(spark, range(100, 120))
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, b1, 1)
    calls = {"n": 0}
    real_rename = alc.os.rename

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] == crash_at_call:
            raise RuntimeError("torn publish")
        real_rename(src, dst)

    monkeypatch.setattr(alc.os, "rename", flaky)
    with pytest.raises(RuntimeError, match="torn publish"):
        manifest_compact(spark, m, snapshot=True)
    monkeypatch.setattr(alc.os, "rename", real_rename)
    want = _rows(_rebuild(c0.unionByName(b1)))
    return m, want


def test_torn_publish_before_park_rolls_back_cleanly(
    spark, tmp_path, monkeypatch
):
    m, want = _torn_publish_state(spark, tmp_path, monkeypatch, 1)
    # base never moved: recovery finishes the swap bookkeeping and
    # rolls the compaction back — the pre-fold serving view is
    # value-identical (fold invariance) and a retry compacts fine
    assert _rows(read_manifest_serving(spark, m)) == want
    st = manifest_compact(spark, m, snapshot=True)
    assert _rows(read_manifest_serving(spark, m)) == want
    assert _rows(read_manifest_as_of(spark, m, st["epoch"])) == want


def test_torn_publish_mid_swap_self_heals_forward(
    spark, tmp_path, monkeypatch
):
    """The window that used to LOSE the base to an invisible dot-dir
    (loud failure, manual restore): base parked, scratch complete
    but not yet live. The swap fence now rolls forward to the
    scratch, the compaction marker resolves, and the snapshot
    retention is honored — all on the next serving read."""
    m, want = _torn_publish_state(spark, tmp_path, monkeypatch, 2)
    assert _rows(read_manifest_serving(spark, m)) == want
    assert alc.snapshot_epochs(m) == [1]
    assert _rows(read_manifest_as_of(spark, m, 1)) == want
    # exactly-once: no segment survived to double-fold
    import os

    assert not os.path.isdir(f"{m}/adds")


def test_retention_enforcement_closes_both_audits(spark, tmp_path):
    """VERDICT r9 ask #4: the enforcement loop — a planted
    over-retention snapshot (pre-erase, leaking the erased subjects)
    is dropped by the keep-newest-K vacuum; afterwards ZERO snapshots
    sit past the policy AND zero retained snapshots reference erased
    subjects, while the in-policy epoch still time-travels. Re-running
    the enforcement is a no-op (idempotent)."""
    c0 = _docs(spark, range(0, 40))
    b1 = _docs(spark, range(100, 130))
    rm = c0.filter(F.col("doc_id") % 10 == 3)
    m = str(tmp_path / "m")
    build_manifest_artifact(c0, m)
    manifest_add_batch(spark, m, b1, 1)
    st1 = manifest_compact(spark, m, snapshot=True)  # leaks rm
    manifest_erase(spark, m, rm, seg_id=1)
    st2 = manifest_compact(spark, m, snapshot=True)  # clean
    subj = rm.select("doc_id")
    survivors = c0.join(subj, "doc_id", "left_anti").unionByName(b1)

    def leak(df):
        # manifest rows are shard-level: a leak = any shard row whose
        # fold differs from the subject-free rebuild
        return _rows(df) != _rows(_rebuild(survivors))

    # the planted over-retention snapshot leaks; the policy window
    # (keep=SNAPSHOT_RETAIN_LAST) has exactly st2
    assert leak(read_manifest_as_of(spark, m, st1["epoch"]))
    keep = alc.SNAPSHOT_RETAIN_LAST
    assert alc.vacuum_snapshots(m, retain_last=keep) == [st1["epoch"]]
    retained = alc.snapshot_epochs(m)
    assert retained == [st2["epoch"]]
    # post-drop audit (a): zero retained past the policy
    assert len(retained) <= keep
    # post-drop audit (b): zero erased-subject leaks in the retained
    assert not leak(read_manifest_as_of(spark, m, st2["epoch"]))
    assert not leak(read_manifest_serving(spark, m))
    # idempotent: nothing further to drop
    assert alc.vacuum_snapshots(m, retain_last=keep) == []
    assert alc.snapshot_epochs(m) == [st2["epoch"]]
