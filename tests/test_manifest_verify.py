"""Manifest consumer closure (round-9 ask #6): the served manifest
must match the loader's packing-side recompute shard-for-shard, and
a corrupted shard must flip exactly its row."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    pipeline,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, n=40):
    rows = [
        (int(i), " ".join(f"v{i}w{j} tok{j}" for j in range(10)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verify_green_then_corruption_flips_exactly_one_shard(
    spark, tmp_path
):
    docs = _docs(spark)
    path = str(tmp_path / "m")
    pipeline.build_manifest_artifact(
        docs.filter(F.col("doc_id") % 3 != 0), path
    )
    pipeline._manifest_shard_rows(
        docs.filter(F.col("doc_id") % 3 == 0)
    ).write.parquet(os.path.join(path, "adds", "batch_id=1"))

    report = pipeline.manifest_packing_verify(spark, path, docs).collect()
    assert report and all(
        r.counts_match == 1 and r.xor_match == 1 for r in report
    )

    # plant a corruption: a bogus segment injects one phantom doc's
    # terms into a single shard — the artifact now disagrees with
    # what the loader will actually read
    bad_shard = int(report[0].shard)
    spark.createDataFrame(
        [(bad_shard, 1, 13, 9999)],
        "shard long, n_docs long, n_tokens long, content_xor long",
    ).write.parquet(os.path.join(path, "adds", "batch_id=66"))

    flipped = pipeline.manifest_packing_verify(
        spark, path, docs
    ).collect()
    bad = [r for r in flipped if r.shard == bad_shard]
    good = [r for r in flipped if r.shard != bad_shard]
    assert bad[0].counts_match == 0 and bad[0].xor_match == 0
    assert all(r.counts_match == 1 and r.xor_match == 1 for r in good)
