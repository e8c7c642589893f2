"""Scale soak: replicate the sf0.1 corpus ~10x (key-consistent shifts,
~= sf1: 6M lineitem rows) into /tmp and run the headline queries.

This is the 'would the plan survive a 10x scale-up' probe — run
manually, watch for spills, stragglers, or plan flips:

    python tools/soak.py [replication] [query ...]

With query names given, only those run (the full default list
otherwise). The replicated corpus lives at /tmp/soak_x{replication}
and is reused if already built (delete the dir to force a rebuild).

O(n²) brute-force ops (embedding_near_dupes) are excluded by design —
at this scale only their LSH/IVF variants are legitimate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

QUERIES_TO_RUN = [
    "etl_curate_profiles",
    "gender_distribution",
    "age_ecdf",
    "pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "customer_order_rank",
    "events_hourly",
    "events_sessionized",
    "text_stats",
    "top_ngrams",
    "dedup_exact_groups",
    "minhash_lsh_candidates",
    "near_dedup_minhash",
    "simhash_signatures",
    "cosine_topk",
    "ann_ivf_topk",
    "deterministic_split",
    "multimodal_decode",
    "conversion_funnel",
    "cohort_retention",
    "promo_revenue_share",
    "returned_items_report",
    "top_suppliers_by_revenue",
    # round-2 additions
    "events_rollup_multi",
    "waiting_suppliers",
    "near_dup_clusters",
    "ngram_jaccard_dupes",
    "profiles_quality_report",
    "approx_quantiles_check",
    # round-2 heavy dedup/similarity/entity-resolution set (soaked
    # per VERDICT r2 #2)
    "cluster_canonicals",
    "simhash_weighted_dupes",
    "source_overlap_matrix",
    "fuzzy_part_matches",
    "incremental_near_dups",
    # round-2 widening
    "volume_shipping",
    "nation_market_share",
    "product_profit",
    "customer_order_distribution",
    "min_price_supplier",
    "forecast_revenue",
    "supplier_part_breadth",
    "disjunctive_revenue",
    "idle_rich_customers",
    "duplicate_spans",
    "doc_span_uniqueness",
    "pii_redact_profiles",
    "kmeans_assignments",
    "streaming_stream_join",
    "format_roundtrip_counts",
    # round-3 second wave (retrieval / layout / mixing / graph)
    "bm25_search",
    "containment_dupes",
    "semantic_dupes",
    "event_pagerank",
    "zorder_files",
    "mixture_sampled_counts",
    "balanced_shards",
    "tfidf_top_terms",
    "timed_funnel",
    "session_paths",
    "compaction_plan",
    # round-3 third/fourth wave (LM quality / RI audit / sampling /
    # rolling sketches / winsorize / BPE)
    "unigram_logprob_quality",
    "referential_integrity_report",
    "weighted_sample_docs",
    "sliding_distinct_users_check",
    "winsorized_event_values",
    "bpe_pair_counts",
    # round-3 sixth-eighth wave (rule gate / n-gram LMs / fusion /
    # stats / smoothing / privacy / index build / drift)
    "gopher_quality_report",
    "bigram_logprob_quality",
    "hybrid_rrf_search",
    "chi2_lang_source",
    "nation_revenue_trend",
    "monthly_revenue_ewma",
    "dp_event_type_counts",
    "events_user_skew_report",
    "inverted_postings",
    "pmi_collocations",
    "embedding_centroid_shift",
    # round-3 ninth wave (bitemporal / layout eval / MV delta)
    "pit_status_enrichment",
    "scan_pruning_report",
    "incremental_nation_view",
    # round-3 tenth-fifteenth waves
    "ann_lsh_recall",
    "lineitem_column_stats",
    "events_mad_outliers",
    "minhash_accuracy_report",
    "user_cadence_stats",
    "profiles_apply_cdc",
    "grouped_split_counts",
    "user_active_islands",
    "join_cardinality_estimate",
    "audience_overlap_hll",
    "top_component_power",
    # round-4: streaming soak (multi-file events gap fixed — the
    # file-stream source now reads Spark-written directory corpora)
    "streaming_events_hourly",
    "streaming_user_totals",
    "streaming_session_windows",
    "streaming_attribution",
    "streaming_drift_monitor",
    # round-4 waves: drift test / sketch audit / PQ / ops sizing /
    # CDC chunking / LSH planning
    "ks_two_sample_drift",
    "bloom_membership_audit",
    "pq_codebook_report",
    "event_debounce_report",
    "dow_adjusted_anomalies",
    "lsh_tuning_curve",
    "watermark_lag_audit",
    "content_defined_chunks",
    "split_near_dup_leakage",
    "ivf_shard_plan",
    "customer_rfm_scores",
    "tokenizer_fertility_report",
    "dataset_card_report",
    "ann_ivfpq_topk",
    "payload_format_audit",
    "schema_evolution_counts",
    "csv_malformed_audit",
    "gdpr_erasure_plan",
    "retention_policy_audit",
    "ann_ivfpq_recall",
    "streaming_outer_join_errors",
    "offpolicy_value_eval",
    "epoch_budget_report",
    # round-5: maintained IVF-PQ lifecycle, BPE trainer, curation
    "ann_ivfpq_serve",
    "ivfpq_incremental_add",
    "ann_ivfpq_add_serve",
    "ivfpq_tuning_curve",
    "ivfpq_index_stats",
    "bpe_learned_merges",
    "bpe_fertility_report",
    "semdedup_prune_plan",
    "benchmark_ngram_contamination",
    "dsir_selection_report",
    # round-6: incremental semantic dedup, trained quality model,
    # Bloom decontamination tier, batched artifact serve
    "semdedup_incremental_prune",
    "quality_classifier_weights",
    "quality_classifier_eval",
    "benchmark_bloom_contamination",
    "ann_ivfpq_serve_batch",
    "quality_model_filtered_counts",
    "streaming_quality_gate",
    "doremi_mixture_weights",
    "near_dup_probe_indexed",
    "curriculum_phase_plan",
    "blocklist_filter_report",
    # round-6 (late waves): chunk dedup, split repair, soft dedup,
    # JL tier, governance/epoch planning
    "chunk_dedup_report",
    "dedup_funnel_report",
    "incremental_chunk_dedup",
    "split_leakage_repair",
    "soft_dedup_weights",
    "jl_shortlist_curve",
    "epoch_shuffle_plan",
    "cdc_granularity_curve",
    "generalization_ladder",
    # round-7: tombstone erasure (must stay flat — the erase is
    # request-sized and the serve is probe-only), temporal split +
    # cross-boundary audits, unicode tier, capacity eval
    "ann_ivfpq_erase_serve",
    "ivfpq_erasure_audit",
    "temporal_split_plan",
    "temporal_split_leakage",
    "temporal_contamination",
    "unicode_dedup_report",
    "quality_capacity_eval",
    "sequence_packing_plan",
    "near_dup_probe_after_erase",
    "chunk_index_gc_report",
    "temperature_mixture_curve",
    "decontaminated_docs",
    "pii_redact_documents",
    "streaming_leakage_monitor",
    "incremental_cluster_update",
    "streaming_cluster_update",
]

# (table, {col: unit}) — each replica i shifts col by i*unit so join
# keys stay consistent across tables
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 1_000_000},
    "region": {},
    "nation": {},
}


def build(spark, replication: int, dst: str) -> None:
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    os.makedirs(dst, exist_ok=True)
    for table, shifts in SHIFTS.items():
        base = load_table(spark, SRC, table)
        if not shifts:  # tiny dims copied as-is
            base.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
            continue
        reps = []
        for i in range(replication):
            df = base
            for col, unit in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * unit))
            reps.append(df)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")


def main() -> None:
    args = sys.argv[1:]
    replication = int(args[0]) if args and args[0].isdigit() else 10
    only = args[1:] if args and args[0].isdigit() else args
    dst = f"/tmp/soak_x{replication}"
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    if "SPARK_DRIVER_MEMORY" not in os.environ and replication > 30:
        # The 100x probe OOM'd the funnel's banding aggregation under
        # the 8g default. local-mode driver memory stands in for the
        # cluster's TOTAL executor memory, so it must scale with the
        # probe; on a real cluster this is executors x memory, which
        # scales by provisioning, not config.
        os.environ["SPARK_DRIVER_MEMORY"] = "48g"
        print("# SPARK_DRIVER_MEMORY=48g (replication > 30)", file=sys.stderr)
    spark = get_spark("soak")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"# reusing {dst}", file=sys.stderr)
    else:
        t0 = time.time()
        build(spark, replication, dst)
        print(
            f"# built {replication}x corpus in {time.time()-t0:.1f}s",
            file=sys.stderr,
        )

    per_query = {}
    t_all = time.time()
    for name in only or QUERIES_TO_RUN:
        t0 = time.time()
        QUERIES[name](spark, dst).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 2)
        print(f"# {name}: {per_query[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "soak_wall_time",
                "value": round(time.time() - t_all, 2),
                "unit": "sec",
                "queries": per_query,
                "replication": replication,
            }
        )
    )


if __name__ == "__main__":
    main()
