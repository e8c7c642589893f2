"""Torn PARAMETER-BUILD crash fence (r12 hardening): the three
recorded-parameter builders (band index, chunk-digest index, shard
manifest) write their base FIRST and publish `_tokenizer.json`
AFTER. A crash between the two used to read as the meta-less
*whitespace* fallback on a lang_aware-built base — the silent
unit-mix the recorded parameter exists to prevent — and on a
REBUILD the stale old meta misdescribed the fresh base the same
way. The fence (artifact_lifecycle.begin_param_build /
finish_param_build) records the build intent before the base write
and clears it only after the meta publish; the parameter readers
(band_index_tokenizer / chunk_index_tokenizer / manifest_tokenizer)
refuse a path carrying the marker, so every crash inside the build
window is LOUD and a re-run of the build clears it."""

from __future__ import annotations

import os

import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    artifact_lifecycle as alc,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    pipeline,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, n=8):
    rows = [
        (int(i), " ".join(f"tok{i % 3}w{j}" for j in range(12)), "en")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


_CASES = [
    (
        "band",
        lambda docs, path: dedup.write_band_index(
            docs, path, tokenizer="lang_aware"
        ),
        dedup.band_index_tokenizer,
    ),
    (
        "chunk",
        lambda docs, path: pipeline.build_chunk_digest_index(
            docs, path, tokenizer="lang_aware"
        ),
        pipeline.chunk_index_tokenizer,
    ),
    (
        "manifest",
        lambda docs, path: pipeline.build_manifest_artifact(
            docs, path, tokenizer="lang_aware"
        ),
        pipeline.manifest_tokenizer,
    ),
]


@pytest.mark.parametrize("name,build,read_tok", _CASES, ids=[c[0] for c in _CASES])
def test_completed_build_leaves_no_marker(spark, tmp_path, name, build, read_tok):
    path = str(tmp_path / name)
    build(_docs(spark), path)
    assert not os.path.exists(os.path.join(path, alc.BUILD_PENDING_FILE))
    assert read_tok(path) == "lang_aware"


@pytest.mark.parametrize("name,build,read_tok", _CASES, ids=[c[0] for c in _CASES])
def test_torn_build_reads_loud_and_rebuild_clears(
    spark, tmp_path, name, build, read_tok, monkeypatch
):
    """Crash between the base write and the meta publish: the reader
    refuses (instead of the silent whitespace fallback); re-running
    the build clears the marker and serves the recorded mode."""
    path = str(tmp_path / name)
    docs = _docs(spark)

    # Crash the build exactly at the meta publish (the last step
    # before finish_param_build) by making os.replace raise for this
    # artifact's meta file.
    real_replace = os.replace

    def crashing_replace(src, dst, *a, **kw):
        if os.path.basename(str(dst)) == "_tokenizer.json" and str(
            dst
        ).startswith(path):
            raise RuntimeError("simulated crash before meta publish")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build(docs, path)
    monkeypatch.setattr(os, "replace", real_replace)

    # torn state: base exists, no meta, marker present → LOUD
    assert os.path.exists(os.path.join(path, alc.BUILD_PENDING_FILE))
    with pytest.raises(RuntimeError, match="_build_pending"):
        read_tok(path)

    # re-running the build clears the marker and records the mode
    build(docs, path)
    assert not os.path.exists(os.path.join(path, alc.BUILD_PENDING_FILE))
    assert read_tok(path) == "lang_aware"


def test_rebuild_crash_does_not_serve_stale_meta(spark, tmp_path, monkeypatch):
    """The rebuild flavor of the window: a whitespace artifact is
    being rebuilt lang_aware; the crash leaves the FRESH lang_aware
    base next to the STALE whitespace meta. Without the fence the
    reader would serve 'whitespace' for a lang_aware base."""
    path = str(tmp_path / "band_rebuild")
    docs = _docs(spark)
    dedup.write_band_index(docs, path, tokenizer="whitespace")
    assert dedup.band_index_tokenizer(path) == "whitespace"

    real_replace = os.replace

    def crashing_replace(src, dst, *a, **kw):
        if os.path.basename(str(dst)) == "_tokenizer.json":
            raise RuntimeError("simulated crash before meta publish")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(RuntimeError, match="simulated crash"):
        dedup.write_band_index(docs, path, tokenizer="lang_aware")
    monkeypatch.setattr(os, "replace", real_replace)

    with pytest.raises(RuntimeError, match="_build_pending"):
        dedup.band_index_tokenizer(path)

    dedup.write_band_index(docs, path, tokenizer="lang_aware")
    assert dedup.band_index_tokenizer(path) == "lang_aware"


def test_pre_fence_artifacts_unchanged(spark, tmp_path):
    """Back-compat: an artifact with no marker (every pre-r12 build)
    reads exactly as before — recorded meta, or the whitespace
    fallback when meta-less."""
    path = str(tmp_path / "legacy")
    os.makedirs(path)
    assert dedup.band_index_tokenizer(path) == "whitespace"
    assert pipeline.chunk_index_tokenizer(path) == "whitespace"
    assert pipeline.manifest_tokenizer(path) == "whitespace"
