"""Torn-compaction crash fence (VERDICT r8 "What's wrong" #1 /
round-9 ask #1): every maintained-artifact compactor publishes the
folded base by rename-swap and then retires the segment ledgers. A
crash BETWEEN those two steps used to leave the folded base AND the
segments on disk — the next serving read folded the segments a
second time (duplicate band/code rows; doubled chunk refcounts and
manifest counts; xor digests self-cancelled back out).

The fence (operators/artifact_lifecycle.py) records the segment list
and target epoch in a pending marker before the fold, stamps the
epoch INTO the scratch so it publishes atomically with the base, and
recovery — run at the top of every serving read, erase, and
compactor — rolls a torn state forward (base epoch reached the
marker's target → retire exactly the listed segments) or back (base
epoch below target → drop the marker, everything still live).

Each test simulates BOTH crash points on each artifact by making the
protocol step raise mid-compaction, then asserts the serving fold is
value-identical to a never-crashed control artifact built from the
same inputs — i.e. a torn compaction can never double-fold."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    artifact_lifecycle as alc,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
    similarity,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
    load_table,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    pipeline,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, ids):
    """Deterministic tiny corpus; ids i and i+20 carry IDENTICAL text
    so chunk digests are SHARED across the erase boundary (the
    refcount case a double-applied erase would corrupt)."""
    rows = [
        (
            int(i),
            " ".join(
                f"word{(i % 20) * 7 + j % 11} tok{j}" for j in range(12)
            ),
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _crash(*_a, **_k):
    raise RuntimeError("simulated crash inside compaction")


def _run_fence_scenarios(monkeypatch, build, serve, compact, tmp_path):
    """The shared script: control path compacts cleanly; crash paths
    tear the protocol at each step; all three must converge to the
    same serving rows and the same post-compaction base."""
    paths = {n: str(tmp_path / n) for n in ("ctl", "torn_pub", "torn_fin")}
    for p in paths.values():
        build(p)
    expected = serve(paths["ctl"])
    assert len(expected) > 0

    # control: clean compaction — serving fold invariant
    compact(paths["ctl"])
    assert serve(paths["ctl"]) == expected

    # crash BEFORE the publish (marker written, fold computed, base
    # never swapped) → recovery rolls BACK: segments still live and
    # fold once; the next compaction redoes the work cleanly
    p = paths["torn_pub"]
    with monkeypatch.context() as m:
        m.setattr(alc, "publish_base", _crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            compact(p)
    assert os.path.isfile(os.path.join(p, alc.PENDING_MARKER))
    assert serve(p) == expected  # recovery ran inside the read
    assert not os.path.isfile(os.path.join(p, alc.PENDING_MARKER))
    compact(p)
    assert serve(p) == expected

    # crash AFTER the publish, BEFORE the ledger retirement — the
    # exact double-fold window: folded base AND segments both on
    # disk → recovery rolls FORWARD (retire the listed segments)
    p = paths["torn_fin"]
    with monkeypatch.context() as m:
        m.setattr(alc, "finish_compaction", _crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            compact(p)
    marker = json.load(open(os.path.join(p, alc.PENDING_MARKER)))
    assert marker["segments"]  # the hazard is real: segments linger
    assert serve(p) == expected  # NOT double-folded
    assert not os.path.isfile(os.path.join(p, alc.PENDING_MARKER))
    for rel in marker["segments"]:
        assert not os.path.isdir(os.path.join(p, rel))
    # nothing left to fold; fold invariant
    compact(p)
    assert serve(p) == expected


def test_manifest_compaction_fence(spark, tmp_path, monkeypatch):
    docs = _docs(spark, range(20))
    batch = _docs(spark, range(20, 40))
    erase = _docs(spark, range(0, 6))

    def build(path):
        pipeline.build_manifest_artifact(docs, path)
        pipeline._manifest_shard_rows(batch).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "adds", "batch_id=1"))
        batch.select("doc_id").write.mode("overwrite").parquet(
            os.path.join(path, "add_subjects", "batch_id=1")
        )
        st = pipeline.manifest_erase(spark, path, erase, seg_id=0)
        assert st["n_docs_erased"] == 6

    def serve(path):
        return sorted(
            (r.shard, r.n_docs, r.n_tokens, r.content_xor)
            for r in pipeline.read_manifest_serving(spark, path).collect()
        )

    _run_fence_scenarios(
        monkeypatch,
        build,
        serve,
        lambda p: pipeline.manifest_compact(spark, p),
        tmp_path,
    )
    # epoch advanced exactly once per published fold
    assert alc.read_base_epoch(str(tmp_path / "ctl"), "base") == 1


def test_band_index_compaction_fence(spark, tmp_path, monkeypatch):
    docs = _docs(spark, range(20))
    batch = _docs(spark, range(20, 40))

    def build(path):
        dedup.write_band_index(docs, path)
        dedup.band_index_add(spark, path, batch, 1)
        dedup.band_index_erase(
            spark,
            path,
            spark.createDataFrame([(2,), (3,)], "doc_id long"),
            seg_id=0,
        )

    def serve(path):
        return sorted(
            (r.doc_id, r.band_key)
            for r in dedup.read_band_index_serving(spark, path)
            .select("doc_id", "band_key")
            .collect()
        )

    _run_fence_scenarios(
        monkeypatch,
        build,
        serve,
        lambda p: dedup.band_index_compact(spark, p),
        tmp_path,
    )


def test_chunk_index_compaction_fence(spark, tmp_path, monkeypatch):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        cdc_chunk_table,
    )

    docs = _docs(spark, range(20))
    batch = _docs(spark, range(20, 40))
    # erase subjects whose chunks are SHARED with surviving docs
    # (i and i+20 duplicate) — a double-applied erase would drive
    # those shared digests negative and GC live content
    erase = _docs(spark, range(0, 6))

    def build(path):
        pipeline.build_chunk_digest_index(docs, path)
        marked = dedup.chunk_dedup_marked(
            dedup.chunk_digest_index(docs), cdc_chunk_table(batch)
        )
        dedup.new_digest_refs_from_marked(marked).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "adds", "batch_id=1"))
        dedup.rereference_refs_from_marked(marked).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "rerefs", "batch_id=1"))
        st = pipeline.chunk_index_erase(spark, path, erase, seg_id=0)
        assert st["n_subjects"] == 6

    def serve(path):
        return sorted(
            r.digest
            for r in pipeline.read_chunk_digest_index(spark, path)
            .select("digest")
            .distinct()
            .collect()
        )

    _run_fence_scenarios(
        monkeypatch,
        build,
        serve,
        lambda p: pipeline.chunk_index_compact(spark, p),
        tmp_path,
    )
    # the refcount fold itself (not just presence) is exactly-once:
    # crash-path base == control base, row for row
    def base_rows(p):
        return sorted(
            (r.digest, r.refs)
            for r in spark.read.parquet(
                os.path.join(p, "base")
            ).collect()
        )

    assert base_rows(str(tmp_path / "torn_fin")) == base_rows(
        str(tmp_path / "ctl")
    )
    assert base_rows(str(tmp_path / "torn_pub")) == base_rows(
        str(tmp_path / "ctl")
    )


def test_ivfpq_compaction_fence(spark, sf_dir, tmp_path, monkeypatch):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    erase = corpus.filter(F.col("vec_id") % 7 == 1).select("vec_id")
    index = similarity.build_ivfpq_index(corpus)

    def build(path):
        similarity.write_ivfpq_index(index, path)
        similarity.ivfpq_add_batch(
            similarity.read_ivfpq_index(spark, path), batch
        ).write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(path, "codes_adds", "batch_id=1")
        )
        similarity.ivfpq_erase(spark, path, erase, seg_id=0)

    def serve(path):
        return sorted(
            (r.vec_id, r.cell, r.sub_id, r.code)
            for r in similarity.read_ivfpq_index_serving(spark, path)[
                "codes"
            ].collect()
        )

    _run_fence_scenarios(
        monkeypatch,
        build,
        serve,
        lambda p: similarity.ivfpq_compact_segments(spark, p),
        tmp_path,
    )


def test_recovery_is_scoped_to_listed_segments(spark, tmp_path, monkeypatch):
    """A segment that lands AFTER the pending marker was written is
    not listed in it — roll-forward retires ONLY the folded segments,
    so the late arrival survives and still folds into the serve."""
    docs = _docs(spark, range(20))
    batch = _docs(spark, range(20, 40))
    late = _docs(spark, range(40, 50))
    path = str(tmp_path / "m")
    pipeline.build_manifest_artifact(docs, path)
    pipeline._manifest_shard_rows(batch).write.parquet(
        os.path.join(path, "adds", "batch_id=1")
    )
    with monkeypatch.context() as m:
        m.setattr(alc, "finish_compaction", _crash)
        with pytest.raises(RuntimeError):
            pipeline.manifest_compact(spark, path)
    # the late segment lands INSIDE the crash window
    pipeline._manifest_shard_rows(late).write.parquet(
        os.path.join(path, "adds", "batch_id=2")
    )
    got = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, path).collect()
    }
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            docs.unionByName(batch).unionByName(late)
        ).collect()
    }
    assert got == want
    assert os.path.isdir(os.path.join(path, "adds", "batch_id=2"))
    assert not os.path.isdir(os.path.join(path, "adds", "batch_id=1"))


def test_labels_artifact_torn_swap_self_heals(spark, tmp_path):
    """The cluster-labels artifact joins the fence (round 9): its
    per-batch rename-swap used to fail LOUDLY on a torn state
    (seed-marker + manual .labels_old_* restore); a torn FENCED swap
    now self-heals on the next lifecycle entry — the loud-fail stays
    only for non-swap wreckage (external deletion)."""
    import shutil

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        cluster_labels_erase_artifact,
    )

    docs = _docs(spark, range(20))
    lab = str(tmp_path / "lab")
    os.makedirs(lab)
    labels = spark.createDataFrame(
        [(i, i - (i % 2)) for i in range(10)], "doc_id long, cluster_id long"
    )
    labels.write.parquet(os.path.join(lab, "labels"))
    with open(os.path.join(lab, "_labels_seeded"), "w") as fh:
        fh.write("1")
    before = sorted(
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(os.path.join(lab, "labels")).collect()
    )

    # tear a fenced swap at its worst point: labels renamed away,
    # scratch (the NEW state) fully written but not yet renamed in
    scratch = os.path.join(lab, ".labels_scratch")
    shutil.copytree(os.path.join(lab, "labels"), scratch)
    json.dump(
        {"name": "labels", "old": ".labels_old_torn", "scratch": ".labels_scratch"},
        open(os.path.join(lab, "._SWAP_PENDING_labels.json"), "w"),
    )
    os.rename(
        os.path.join(lab, "labels"), os.path.join(lab, ".labels_old_torn")
    )
    assert not os.path.isdir(os.path.join(lab, "labels"))

    # the next lifecycle entry self-heals (rolls FORWARD to scratch)
    # and the erase applies normally — no RuntimeError, no manual
    # restore
    st = cluster_labels_erase_artifact(
        spark, lab, docs, spark.createDataFrame([(99,)], "doc_id long")
    )
    assert st["n_rows_before"] == 10 and st["n_erased_rows"] == 0
    after = sorted(
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(os.path.join(lab, "labels")).collect()
    )
    assert after == before

    # non-swap wreckage (external deletion, no marker) still fails
    # loudly instead of silently rebuilding from nothing
    shutil.rmtree(os.path.join(lab, "labels"))
    with pytest.raises(RuntimeError, match="seed marker"):
        cluster_labels_erase_artifact(
            spark, lab, docs, spark.createDataFrame([(1,)], "doc_id long")
        )
