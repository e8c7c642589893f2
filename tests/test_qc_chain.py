"""The GD chain's r12 literal-weight fold: each step's 1-row gradient
aggregate is collected and folded into literal weights driver-side
(plans stay narrow). These tests pin that the literal trajectory
equals an independent driver-side replay of the identical
floor-quantized recipe, and that the returned feats carry the final
weights as constant columns — the contract every quality-model
consumer (weights/eval/capacity/filtered-counts/stream gate) reads.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _fq(v: float) -> float:
    return math.floor(v * 1e6 + 0.5) / 1e6


def _replay(rows, n_buckets, n_steps, eta):
    """Driver-side replay of the integer-grid GD recipe over
    materialized (y, is_train, x*) rows."""
    train = [r for r in rows if r["is_train"]]
    ws = [0.0] * (n_buckets + 1)
    for _ in range(n_steps):
        resids = []
        for r in train:
            z = ws[0] + sum(
                ws[j + 1] * r[f"x{j}"] for j in range(n_buckets)
            )
            resids.append(r["y"] - 1.0 / (1.0 + math.exp(-z)))
        g = [_fq(sum(resids) / len(resids))] + [
            _fq(
                sum(
                    res * r[f"x{j}"]
                    for res, r in zip(resids, train)
                )
                / len(train)
            )
            for j in range(n_buckets)
        ]
        ws = [_fq(ws[j] + eta * g[j]) for j in range(n_buckets + 1)]
    return ws


def test_literal_trajectory_matches_replay(spark):
    docs = spark.createDataFrame(
        [
            (i, f"tok{i % 5} alpha beta{i % 3} gamma delta{i}", "en",
             "exemplar" if i % 3 == 0 else "crawl", 40)
            for i in range(60)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    feats, wcols = text._qc_gd_chain(docs, n_buckets=4, n_steps=2)
    rows = [r.asDict() for r in feats.collect()]
    want = _replay(rows, 4, 2, text.QC_ETA)

    # the returned weight columns are CONSTANT literals = the replay
    got_rows = feats.select(*wcols).distinct().collect()
    assert len(got_rows) == 1
    got = [got_rows[0][c] for c in wcols]
    assert got == pytest.approx(want, abs=0.0), (got, want)
    # quantized to the 1e-6 grid exactly
    for v in got:
        assert v == _fq(v)


def test_artifact_matches_chain_weights(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights, _thr = text.quality_model_artifact(docs)
    feats, wcols = text._qc_gd_chain(docs)
    row = feats.select(*wcols).distinct().collect()[0]
    names = ["intercept"] + [f"h{j}" for j in range(text.QC_N_FEATURES)]
    assert [weights[n] for n in names] == [row[c] for c in wcols]
