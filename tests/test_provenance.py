"""Artifact provenance / version-skew audit: every pipeline run
stamps the artifacts it builds with an order-independent corpus
version digest (xor of per-doc md5 terms + row count); the audit
recomputes the current version and flags any artifact whose stamp
differs — the rebuild-needed signal after a corpus revision. The
sidecar lives at the artifact ROOT so lifecycle operations that
rename-swap the base (compaction, erase folds) must leave it
untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    governance as gov,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
    build_manifest_artifact,
    manifest_compact,
    manifest_erase,
    read_manifest_serving,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, ids):
    return spark.createDataFrame(
        [(int(i), f"doc text number {i}") for i in ids],
        "doc_id long, text string",
    )


def test_corpus_version_is_order_and_partition_independent(spark):
    docs = _docs(spark, range(40))
    a = gov.corpus_version_scalar(docs.repartition(1))
    b = gov.corpus_version_scalar(
        docs.repartition(16).orderBy(F.col("doc_id").desc())
    )
    assert a == b
    # content participates: one changed byte flips the digest
    mut = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    assert gov.corpus_version_scalar(mut) != a
    # identity participates: same bytes under a different doc_id
    shifted = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    assert gov.corpus_version_scalar(shifted) != a


def test_stamp_roundtrip_and_unstamped_row(spark, tmp_path):
    art = str(tmp_path / "art")
    gov.stamp_provenance(art, "band_index", 12345, 40)
    assert gov.read_provenance(art) == {
        "artifact": "band_index",
        "version_xor": 12345,
        "n_docs": 40,
    }
    # re-stamp overwrites atomically
    gov.stamp_provenance(art, "band_index", 99, 41)
    assert gov.read_provenance(art)["version_xor"] == 99
    assert gov.read_provenance(str(tmp_path / "missing")) is None
    with pytest.raises(ValueError, match="os.listdir"):
        gov.stamp_provenance("s3a://bucket/art", "x", 1, 1)

    docs = _docs(spark, range(10))
    v, n = gov.corpus_version_scalar(docs)
    fresh = str(tmp_path / "fresh")
    gov.stamp_provenance(fresh, "shard_manifest", v, n)
    rows = {
        r.artifact: r
        for r in gov.artifact_provenance_audit(
            spark,
            {"shard_manifest": fresh, "never_stamped": art + "_nope"},
            docs,
        ).collect()
    }
    assert rows["shard_manifest"].in_sync == 1
    assert rows["never_stamped"].in_sync == 0
    assert rows["never_stamped"].stamped_version is None
    assert rows["never_stamped"].current_version == v


def test_audit_flags_stale_artifact(spark, tmp_path):
    docs = _docs(spark, range(30))
    stale_view = docs.filter(F.col("doc_id") % 3 != 0)
    v_now, n_now = gov.corpus_version_scalar(docs)
    v_old, n_old = gov.corpus_version_scalar(stale_view)
    fresh, stale = str(tmp_path / "f"), str(tmp_path / "s")
    gov.stamp_provenance(fresh, "chunk_digest_index", v_now, n_now)
    gov.stamp_provenance(stale, "band_index", v_old, n_old)
    rows = {
        r.artifact: r.in_sync
        for r in gov.artifact_provenance_audit(
            spark,
            {"chunk_digest_index": fresh, "band_index": stale},
            docs,
        ).collect()
    }
    assert rows == {"chunk_digest_index": 1, "band_index": 0}


def test_stamp_survives_manifest_erase_and_compaction(spark, tmp_path):
    corpus = _docs(spark, range(60))
    mpath = str(tmp_path / "manifest")
    build_manifest_artifact(corpus, mpath)
    v, n = gov.corpus_version_scalar(corpus)
    gov.stamp_provenance(mpath, "shard_manifest", v, n)

    erased = corpus.filter(F.col("doc_id") < 5)
    manifest_erase(spark, mpath, erased)
    manifest_compact(spark, mpath)
    # lifecycle ops rename-swap the base subdir; the root sidecar
    # must survive them (the stamp names the corpus, not the fold)
    assert gov.read_provenance(mpath) == {
        "artifact": "shard_manifest",
        "version_xor": v,
        "n_docs": n,
    }
    # and the artifact still serves post-compaction
    assert read_manifest_serving(spark, mpath).count() > 0


def test_provenance_apply_delta_matches_recompute(spark, tmp_path):
    corpus0 = _docs(spark, range(0, 50))
    adds = _docs(spark, range(100, 120))
    removes = corpus0.filter(F.col("doc_id") % 5 == 0)
    art = str(tmp_path / "m")
    v0, n0 = gov.corpus_version_scalar(corpus0)
    gov.stamp_provenance(art, "shard_manifest", v0, n0)
    st = gov.provenance_apply_delta(
        art, added_docs=adds, removed_docs=removes
    )
    final = corpus0.join(
        removes.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(adds)
    v_fin, n_fin = gov.corpus_version_scalar(final)
    assert (st["version_xor"], st["n_docs"]) == (v_fin, n_fin)
    assert gov.read_provenance(art)["version_xor"] == v_fin
    # empty deltas are no-ops
    empty = adds.filter(F.lit(False))
    gov.provenance_apply_delta(art, added_docs=empty, removed_docs=empty)
    assert gov.read_provenance(art)["version_xor"] == v_fin
    # the documented replay hazard: re-applying the same delta
    # xor-cancels — the stamp must NO LONGER match (this is why the
    # op belongs to the batch revision pipeline, not a stream)
    gov.provenance_apply_delta(art, added_docs=adds)
    assert gov.read_provenance(art)["version_xor"] != v_fin
    with pytest.raises(ValueError, match="no stamp"):
        gov.provenance_apply_delta(str(tmp_path / "nope"), adds, None)


def test_manifest_add_batch_is_replay_safe(spark, tmp_path):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        manifest_add_batch,
    )

    corpus0 = _docs(spark, range(0, 40))
    adds = _docs(spark, range(200, 230))
    mpath = str(tmp_path / "m")
    build_manifest_artifact(corpus0, mpath)
    manifest_add_batch(spark, mpath, adds, 7)
    once = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in read_manifest_serving(spark, mpath).collect()
    }
    # replayed batch OVERWRITES its own segment: fold unchanged
    manifest_add_batch(spark, mpath, adds, 7)
    again = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in read_manifest_serving(spark, mpath).collect()
    }
    assert once == again
    want = {
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in _manifest_rebuild(spark, corpus0.unionByName(adds))
    }
    assert once == want


def _manifest_rebuild(spark, corpus):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        shard_manifest,
    )

    return shard_manifest(corpus).select(
        "shard", "n_docs", "n_tokens", "content_xor"
    ).collect()


def test_ingest_fanout_replay_is_noop_on_all_artifacts(spark, tmp_path):
    """One ingest read maintains three artifacts; a checkpoint reset
    replays both batches — batch-keyed segment overwrite on EVERY
    artifact keeps each fold identical (the bookkept discipline)."""
    import glob
    import os
    import shutil
    import time

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        sft_prefix_digests,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        build_chunk_digest_index,
        build_sft_prefix_index,
        chunk_index_compact,
        read_manifest_serving,
        read_sft_prefix_index,
        run_ingest_fanout_stream,
    )

    def mk(ids):
        return spark.createDataFrame(
            [
                (int(i), f"fanout doc {i} w{i % 6}", "en", "src0", 20)
                for i in ids
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    c0, b1, b2 = mk(range(0, 30)), mk(range(50, 70)), mk(range(80, 95))
    m, pfx, cidx = (
        str(tmp_path / "m"),
        str(tmp_path / "pfx"),
        str(tmp_path / "cidx"),
    )
    build_manifest_artifact(c0, m)
    build_sft_prefix_index(
        c0.withColumn("text", F.concat(F.lit("u: "), F.col("text"))),
        pfx,
    )
    build_chunk_digest_index(c0, cidx)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    bt = time.time()
    for i, b in enumerate((b1, b2)):
        st = str(tmp_path / f"s{i}")
        b.coalesce(1).write.mode("overwrite").parquet(st)
        part = glob.glob(f"{st}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (bt + 10 * i, bt + 10 * i))

    def run(ck):
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, "
                "source string, n_chars long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = run_ingest_fanout_stream(
            spark, stream, m, pfx, cidx, str(tmp_path / ck)
        )
        assert q.awaitTermination(120), q.exception()

    def state():
        mrows = frozenset(
            (r.shard, r.n_docs, r.n_tokens, r.content_xor)
            for r in read_manifest_serving(spark, m).collect()
        )
        prows = frozenset(
            (r.doc_id, r.u_idx, r.prefix_digest)
            for r in read_sft_prefix_index(spark, pfx).collect()
        )
        from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
            read_chunk_digest_index,
        )

        crows = frozenset(
            r.digest
            for r in read_chunk_digest_index(spark, cidx)
            .select("digest")
            .distinct()
            .collect()
        )
        return mrows, prows, crows

    run("ck1")
    s1 = state()
    run("ck2")  # fresh checkpoint: both batches REPLAY
    assert state() == s1
    # the folds equal one-shot rebuilds over corpus ∪ batches
    alld = c0.unionByName(b1).unionByName(b2)
    want_m = frozenset(
        (r.shard, r.n_docs, r.n_tokens, r.content_xor)
        for r in _manifest_rebuild(spark, alld)
    )
    assert s1[0] == want_m
    want_p = frozenset(
        (r.doc_id, r.u_idx, r.prefix_digest)
        for r in sft_prefix_digests(
            alld.withColumn(
                "text", F.concat(F.lit("u: "), F.col("text"))
            )
        ).collect()
    )
    assert s1[1] == want_p
    # chunk refcounts fold exactly at compaction
    chunk_index_compact(spark, cidx)
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.dedup import (
        chunk_digest_index,
    )

    got = {
        (r.digest, r.refs)
        for r in spark.read.parquet(f"{cidx}/base").collect()
    }
    want = {
        (r.digest, r.refs) for r in chunk_digest_index(alld).collect()
    }
    assert got == want
