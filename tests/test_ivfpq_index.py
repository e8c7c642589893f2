"""Maintained IVF-PQ index artifact: build/write/read round-trip,
frozen-quantizer incremental add == full rebuild, probe-only serve
from the persisted artifact (with literal cell partition pruning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    similarity,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _corpus(spark, sf_dir):
    return _emb(spark, sf_dir).filter(
        F.col("vec_id") % similarity.IVFPQ_BATCH_MOD
        != similarity.IVFPQ_BATCH_RESIDUE
    )


def _batch(spark, sf_dir):
    return _emb(spark, sf_dir).filter(
        F.col("vec_id") % similarity.IVFPQ_BATCH_MOD
        == similarity.IVFPQ_BATCH_RESIDUE
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_artifact_roundtrip(spark, sf_dir, tmp_path):
    idx = similarity.build_ivfpq_index(_corpus(spark, sf_dir))
    path = str(tmp_path / "ivfpq")
    similarity.write_ivfpq_index(idx, path)
    back = similarity.read_ivfpq_index(spark, path)
    assert _rows(back["codes"]) == _rows(idx["codes"])
    assert _rows(back["centroids"]) == _rows(idx["centroids"])
    assert _rows(back["codebooks"]) == _rows(idx["codebooks"])
    # partition layout: one directory per cell
    assert back["codes"].schema["cell"].dataType.simpleString() == "bigint"


def test_incremental_add_equals_full_rebuild(spark, sf_dir):
    base = similarity.build_ivfpq_index(_corpus(spark, sf_dir))
    added = similarity.ivfpq_add_batch(base, _batch(spark, sf_dir))
    incremental = base["codes"].unionByName(added)
    full = similarity.build_ivfpq_index(_emb(spark, sf_dir))
    # frozen hash-slice trainer: quantizers identical, hence codes
    # identical vector-for-vector
    assert _rows(full["centroids"]) == _rows(base["centroids"])
    assert _rows(full["codebooks"]) == _rows(base["codebooks"])
    assert _rows(incremental) == _rows(full["codes"])


def test_serve_from_artifact_matches_in_memory(spark, sf_dir, tmp_path):
    vectors = _emb(spark, sf_dir)
    idx = similarity.build_ivfpq_index(_corpus(spark, sf_dir))
    path = str(tmp_path / "ivfpq_serve")
    similarity.write_ivfpq_index(idx, path)
    persisted = similarity.read_ivfpq_index(spark, path)
    a = similarity.ann_ivfpq_serve(
        idx, vectors, similarity.IVFPQ_SERVE_QUERY
    ).collect()
    b = similarity.ann_ivfpq_serve(
        persisted, vectors, similarity.IVFPQ_SERVE_QUERY
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == similarity.IVFPQ_K


def test_serve_prunes_cell_partitions(spark, sf_dir, tmp_path):
    """The probe must reach the artifact as a partition filter —
    n_probe of n_cells directories scanned, not a full-codes scan."""
    vectors = _emb(spark, sf_dir)
    idx = similarity.build_ivfpq_index(_corpus(spark, sf_dir))
    path = str(tmp_path / "ivfpq_prune")
    similarity.write_ivfpq_index(idx, path)
    persisted = similarity.read_ivfpq_index(spark, path)
    plan = (
        similarity.ann_ivfpq_serve(
            persisted, vectors, similarity.IVFPQ_SERVE_QUERY
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [cell" in plan and "cell#" in plan


def test_tuning_curve_properties(spark, sf_dir):
    """Grid shape; recall monotone non-decreasing in shortlist at
    fixed n_probe (supersets can only add hits); exactly one chosen
    config, and it satisfies the target/min-cost rule."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.registry import (
        _ivfpq_index_post_add,
    )

    rows = similarity.ivfpq_tuning_curve(
        _ivfpq_index_post_add(spark, sf_dir), _emb(spark, sf_dir)
    ).collect()
    n_configs = len(similarity.IVFPQ_TUNE_PROBES) * len(
        similarity.IVFPQ_TUNE_SHORTLISTS
    )
    assert len(rows) == n_configs
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["n_probe"], []).append(r)
    for grp in by_probe.values():
        grp.sort(key=lambda r: r["shortlist"])
        recalls = [r["recall_at_k"] for r in grp]
        assert recalls == sorted(recalls)
        # decomposition closes: hits + cell_miss + adc_miss = k * nq
        for r in grp:
            assert (
                r["n_cell_miss"] + r["n_adc_miss"] >= 0
                and r["n_cell_miss"]
                <= similarity.IVFPQ_K * similarity.IVFPQ_TUNE_QUERIES
            )
    chosen = [r for r in rows if r["chosen"] == 1]
    assert len(chosen) == 1
    c = chosen[0]
    eligible = [
        r for r in rows if r["recall_at_k"] >= similarity.IVFPQ_RECALL_TARGET
    ]
    if eligible:
        assert c["recall_at_k"] >= similarity.IVFPQ_RECALL_TARGET
        assert c["probe_cost"] == min(r["probe_cost"] for r in eligible)
    else:
        assert c["recall_at_k"] == max(r["recall_at_k"] for r in rows)
