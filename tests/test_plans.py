"""Physical-plan contract tests: the properties the 100 TB design
rests on must appear in the executed plans — a perf regression that
drops a pushdown or flips a broadcast to sort-merge fails here, not
in production."""

from __future__ import annotations

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
    QUERIES,
)


def _plan(spark, name, sf_dir) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(spark, "pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_nation_revenue_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, "nation_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_top_email_domains_uses_topk_and_prunes(spark, sf_dir):
    plan = _plan(spark, "top_email_domains", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # nested pruning collapses the synthetic profile derivation to a
    # single-column scan of the customer key
    assert "ReadSchema: struct<c_custkey:bigint>" in plan


def test_jaccard_verify_is_pair_driven(spark, sf_dir):
    plan = _plan(spark, "near_dedup_minhash", sf_dir)
    # the candidate pair set must broadcast into the verify join —
    # a shingle-shingle SortMergeJoin would be the quadratic plan
    assert "BroadcastHashJoin" in plan


def test_ngram_jaccard_never_goes_quadratic(spark, sf_dir):
    plan = _plan(spark, "ngram_jaccard_dupes", sf_dir)
    # rare-shingle blocking must stay an equi-join on the shingle key;
    # any nested-loop/cartesian means the df cap got optimized away
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_etl_chain_is_narrow(spark, sf_dir):
    plan = _plan(spark, "etl_curate_profiles", sf_dir)
    assert "Exchange" not in plan  # no shuffle anywhere in the chain


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE must shrink the shuffle partition count at runtime when the
    data is small — the mechanism that lets one conf serve sf0.001
    and sf10 alike."""
    df = QUERIES["gender_distribution"](spark, sf_dir)
    df.collect()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in final


def test_observation_metrics(spark, sf_dir):
    """df.observe(): per-query metrics collected on the executors
    without a second pass (how a production job reports row counts /
    quality tallies for free)."""
    from pyspark.sql import Observation, functions as F

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.registry import (
        profiles_df,
    )

    obs = Observation("profile_metrics")
    df = profiles_df(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("title").isNull(), 1).otherwise(0)).alias("null_titles"),
    )
    n = df.count()
    assert obs.get["rows"] == n
    assert 0 <= obs.get["null_titles"] < n


def test_returned_items_pushes_returnflag_and_broadcasts(spark, sf_dir):
    plan = _plan(spark, "returned_items_report", sf_dir)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # customer, nation
    assert "TakeOrderedAndProject" in plan


def test_promo_share_broadcasts_part(spark, sf_dir):
    plan = _plan(spark, "promo_revenue_share", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_late_shipment_is_semi_join(spark, sf_dir):
    plan = _plan(spark, "late_shipment_priority", sf_dir)
    assert "LeftSemi" in plan  # EXISTS never widens the orders side


def test_driver_window_covers_component_families():
    """The external gate checks the first 50 exported queries; pin
    that every major component family has a representative inside the
    window and that each of those 50 has a full SQL oracle."""
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    first50 = names[:50]
    musts = [
        "etl_curate_profiles", "gender_distribution",
        "registrable_domains", "userfeed_profiles", "pricing_summary",
        "nation_revenue", "events_rollup_multi",
        "approx_distinct_users",
        "streaming_events_hourly",
        "streaming_session_windows", "streaming_dedup_profiles",
        # r6 fourth wave: the tier funnel carries the exact keeper
        # discipline (its tier 2) and chunk_dedup_report carries
        # ExactSubstr reconstruction; dedup_exact_groups and
        # ngram_jaccard_dupes rotated past the window (Jaccard verify
        # stays inside near_dedup_minhash)
        "dedup_funnel_report", "chunk_dedup_report",
        "near_dedup_minhash",
        "curation_pipeline",
        "multimodal_features",
        "profiles_upsert",
        "events_rollup_multi",
        # r3 second wave: data-layout (bm25_search rotated out r5 —
        # BM25 stays in-window inside hybrid_rrf_search;
        # mixture_sampled_counts rotated out r6 —
        # dsir_selection_report carries data selection/mixing)
        # (zorder_files rotated out r10 — data layout keeps
        # manifest_packing_verify, the shard-packing consumer contract)
        # r3 third wave: data-quality audit (events_sessionized
        # rotated out — streaming_session_windows carries
        # sessionization; unigram_logprob_quality rotated out r6 —
        # quality_classifier_eval carries model-based filtering)
        # (referential_integrity_report rotated out r12w9 — FK/
        # anti-join integrity stays via erasure_completeness_audit's
        # anti-join counts + the ledger audit's zero-referencing
        # checks)
        # r3 sixth wave: rule gate / stats test / retrieval fusion /
        # sequential smoothing (approx_quantiles_check, top_ngrams,
        # label_centroids, user_event_type_sets rotated out — their
        # families keep approx_distinct_users, text_stats,
        # cosine_topk/quantize_embeddings, events_rollup_multi)
        "gopher_quality_report",
        # r4 rotation: KS replaces chi2 as the stats-test rep, PQ
        # replaces int8 as the quantization rep, the Bloom audit
        # replaces split_contamination (deterministic_split carries
        # the split family); kafka_wire_roundtrip closes K4
        "kafka_wire_roundtrip", "ks_two_sample_drift",
        # (gdpr_erasure_plan rotated out r11 — erasure sizing stays
        # inside erasure_completeness_audit's n_requested; anti-join
        # discipline via its left_anti counts + split_leakage_repair)
        # r5 rotation: the maintained-index triple replaces
        # ann_ivfpq_topk / cosine_topk / bm25_search (ANN family rep
        # is now the artifact serve; exact-cosine stays via
        # embedding_near_dupes + the serve's exact re-rank)
        "ann_ivfpq_serve",
        # r6 rotation: tokenizer trainer, scale-safe DSIR selection,
        # frozen-cell SemDeDup, trained quality model, Bloom-tier
        # decontamination, IVF-PQ tuning curve enter (evicted:
        # total_users, open_not_pending_customers, event_type_pivot,
        # simhash_dupes, mixture_sampled_counts,
        # unigram_logprob_quality — each family keeps an in-window
        # rep; see QUERIES.md r6 note)
        "bpe_learned_merges", "dsir_selection_report",
        "semdedup_prune_plan", "quality_classifier_eval",
        "benchmark_bloom_contamination",
        # r7 rotation: split repair, soft dedup, JL sketch-ANN, and
        # the tombstone-erasure serve enter (evicted:
        # deterministic_split — the md5 assignment lives inside
        # split_leakage_repair; purchasing_customers — semi-join
        # discipline stays via the funnel + contamination probes;
        # customer_order_rank — ranking windows stay via the chunk
        # keeper + IVF-PQ re-ranks; embedding_near_dupes — the
        # Arrow-matmul near-dup device stays via semdedup_prune_plan)
        "split_leakage_repair", "soft_dedup_weights",
        "ann_ivfpq_erase_serve",
        # r8 rotation: boilerplate scrub, memorization/novelty curve,
        # cluster-labels erasure, and the cross-artifact erasure
        # completeness audit enter (evicted: text_stats — basic
        # corpus stats stay via gopher_quality_report + the funnel's
        # word accounting; bloom_membership_audit — the Bloom
        # build+FPR discipline stays inside
        # benchmark_bloom_contamination; near_dup_clusters — the CC
        # discipline stays inside cluster_erase_update, which builds
        # the labels it erases; ann_ivfpq_add_serve — add==rebuild
        # equivalence stays inside ann_ivfpq_erase_serve, which
        # serves from the post-ADD artifact)
        "ngram_novelty_curve",
        "cluster_erase_update", "erasure_completeness_audit",
        # r9 rotation: the chat/SFT dedup pair (whole-content +
        # prompt-prefix), the char-level edit-distance verify tier,
        # the manifest erase+fold+serve rep, the streaming
        # boilerplate gate, and the durable erase-request ledger
        # audit enter (evicted: jl_shortlist_curve — the recall-curve
        # device stays via ivfpq_tuning_curve; conversion_funnel —
        # conditional aggs stay via segment_priority_grouping_sets;
        # profiles_quality_report — rule gates stay via
        # gopher_quality_report; streaming_user_totals — custom
        # stateful ops stay pytest-covered; hybrid_rrf_search —
        # retrieval stays via the IVF-PQ serves; monthly_revenue_ewma
        # — smoothing stays oracle-covered past window)
        # (sft_user_dedup rotated out r12w10 — the keep-one-response
        # rule stays oracle-covered past window; the chat family
        # keeps streaming_sft_prefix_gate +
        # preference_pair_near_dup_audit + rougel_instruction_dupes)
        # (edit_distance_dupes rotated out r10w6 — candidate verify
        # stays via near_dedup_minhash's content-addressed stage)
        "streaming_boilerplate_scrub",
        "erasure_request_ledger_audit",
        # r9 second rotation: artifact provenance (version-skew
        # stamps), snapshot time travel on the fenced lifecycle, and
        # the snapshot×erasure leak audit enter (evicted:
        # boilerplate_scrub_report — the family keeps
        # streaming_boilerplate_scrub, same maintained template
        # artifact, same oracle; ivfpq_incremental_add — add==rebuild
        # stays inside ann_ivfpq_erase_serve, which serves from the
        # post-ADD artifact; ivfpq_tuning_curve — the recall-curve
        # device stays oracle-covered past window, ANN keeps serve +
        # erase-serve reps)
        # (snapshot_erasure_audit rotated out r10w4 —
        # snapshot_retention_enforce composes the same leak audit)
        # r10 rotation (VERDICT r9 ask #2): the five unwatched
        # round-9 families enter — lang-aware tokenization tier,
        # manifest consumer/packing closure, incremental provenance,
        # the streaming prefix gate, and RLHF pair hygiene (evicted:
        # sft_prefix_dedup — prefix dedup stays in-window inside
        # streaming_sft_prefix_gate, same maintained chain index;
        # artifact_provenance_audit — the stamp/recompute/stale-flag
        # discipline stays inside provenance_incremental_audit;
        # shard_manifest_time_travel — snapshot as-of folds stay
        # value-checked inside snapshot_erasure_audit;
        # shard_manifest_erase_serve — manifest erase+fold stays via
        # erasure_completeness_audit + erasure_request_ledger_audit;
        # zorder_files — data layout keeps manifest_packing_verify,
        # z-order clustering stays oracle-covered past window)
        # (manifest_packing_verify rotated out r12 — the consumer
        # closure + corrupted-shard flip stay in-window inside
        # manifest_packing_verify_lang_aware, family superset with
        # the recorded token unit on top; whitespace recorded mode
        # stays oracle-covered past window + pytest back-compat)
        "provenance_incremental_audit", "streaming_sft_prefix_gate",
        # r10 second rotation: the round's own additions enter so the
        # external gate watches them this round — the tokenizer-
        # parametric band artifact and the retention-enforcement loop
        "lang_band_index_probe", "snapshot_retention_enforce",
        # r11 rotation (VERDICT r10 asks #1/#2/#5): the lang-aware
        # chunk artifact probe, the wider RLHF hygiene audit, and the
        # erasure-latency SLA report enter (evicted:
        # preference_pair_audit — exact-degenerate + canned-prompt
        # counting stay inside preference_pair_near_dup_audit, family
        # superset; lang_dedup_delta_report — the lang-aware tier
        # keeps near_dedup_minhash + lang_band_index_probe +
        # chunk_dedup_report in-window; gdpr_erasure_plan — erasure
        # sizing stays inside erasure_completeness_audit)
        "lang_chunk_index_probe", "preference_pair_near_dup_audit",
        "erasure_sla_audit",
        # r12 rotation (VERDICT r11 asks #1/#2): the token-budget
        # honest unit reaching the MAINTAINED manifest artifact —
        # the packing family's first in-window rep counts in the
        # RECORDED lang-aware unit over the planted de-spaced CJK
        # corpus (evicts manifest_packing_verify, see above)
        "manifest_packing_verify_lang_aware",
        # r12 second rotation (wave 9): decontamination's STREAMING
        # twin enters — the last curation family without an
        # ingest-time mode (evicts referential_integrity_report, see
        # above; batch contamination keeps
        # benchmark_bloom_contamination in-window)
        "streaming_decontamination_gate",
        # r12 third rotation (wave 10): ROUGE-L instruction near-dup
        # — the self-instruct 0.7 rule, ORDER-aware similarity with
        # the full LCS dynamic program replayed by the oracle as an
        # anti-diagonal recursive CTE (evicts sft_user_dedup, see
        # above)
        "rougel_instruction_dupes",
    ]
    assert [m for m in musts if m not in first50] == []
    assert [n for n in first50 if n not in oracles] == []
    assert len(names) == len(set(names))


def test_queries_md_count_matches_registry():
    """VERDICT r9 #2: the QUERIES.md header count drifted once
    (292 vs 342) because it was hand-maintained. It is now synced by
    tools/sync_queries_header.py; this contract makes drift a test
    failure: header count == registry count == numbered table rows."""
    import re
    from pathlib import Path

    import __spark_entry__ as e

    n = len(e.queries())
    text = (Path(__file__).parent.parent / "QUERIES.md").read_text()
    m = re.search(r"^(\d+) queries, ALL (\d+) verified", text, re.M)
    assert m, "QUERIES.md header count line missing"
    assert int(m.group(1)) == int(m.group(2)) == n, (
        f"QUERIES.md header says {m.group(1)} but the registry has "
        f"{n} — run tools/sync_queries_header.py"
    )
    rows = sum(
        1 for ln in text.splitlines() if re.match(r"^\| \d+ \| `", ln)
    )
    assert rows == n, (
        f"QUERIES.md table has {rows} numbered rows vs {n} registry "
        "queries — add the missing row(s)"
    )


def test_rollup_reaggregates_partials_not_raw(spark, sf_dir):
    """Hypertable rollup: hour/day grains must read the materialized
    minute partials (InMemoryTableScan), not re-scan raw parquet —
    the continuous-aggregate dataflow the 100 TB design rests on.
    (The FileScan string appears once per branch because the plan
    printer inlines the cached relation's child; the scan itself runs
    once, to populate the cache.)"""
    plan = _plan(spark, "events_rollup_multi", sf_dir)
    assert plan.count("InMemoryTableScan") == 3
    # coarser grains cascade partials: map-side partial_sum over the
    # finer grain's n_events, never a recount of raw rows
    assert "partial_sum(n_events" in plan


def test_waiting_suppliers_no_nested_loop(spark, sf_dir):
    """Q21 shape: the EXISTS/NOT EXISTS inequality residuals must ride
    on l_orderkey equi-joins — a CartesianProduct or
    BroadcastNestedLoopJoin means the residual became the join key."""
    plan = _plan(spark, "waiting_suppliers", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_contamination_probe_is_semi_join(spark, sf_dir):
    """The train-shingle probe must stay a keyed semi join — a
    nested-loop or cartesian means the IN-subquery decorrelation
    failed and the audit goes quadratic."""
    plan = _plan(spark, "split_contamination", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_volume_shipping_broadcasts_both_nation_copies(spark, sf_dir):
    """Q7 shape: both nation copies + supplier + customer broadcast;
    the only line-level shuffle is lineitem⋈orders."""
    plan = _plan(spark, "volume_shipping", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_forecast_revenue_pushes_all_predicates(spark, sf_dir):
    """Q6 shape: discount/quantity predicates must reach the parquet
    scan, and the single-value aggregate must not shuffle rows."""
    plan = _plan(spark, "forecast_revenue", sf_dir)
    # PushedFilters renders truncated; the Filter node carries the
    # full predicate set
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)" in plan
    assert "< 24.0)" in plan


def test_min_price_supplier_windows_by_part_key(spark, sf_dir):
    """Q2 shape: the min-per-part window must be partitioned (keyed),
    never a global single-partition sort over offers."""
    plan = _plan(spark, "min_price_supplier", sf_dir)
    assert "partitionBy" not in plan or True  # window spec not in text
    assert "row_number" in plan
    # keyed window ⇒ hashpartitioning on the part key, not SinglePartition
    assert "hashpartitioning(l_partkey" in plan


def test_idle_rich_customers_anti_join_and_date_pushdown(spark, sf_dir):
    """Q22 shape: the no-recent-orders test is an anti join with the
    date filter pushed into the orders scan."""
    plan = _plan(spark, "idle_rich_customers", sf_dir)
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_customer_order_distribution_is_left_outer(spark, sf_dir):
    """Q13 shape: zero-order customers must survive — left outer, not
    inner."""
    plan = _plan(spark, "customer_order_distribution", sf_dir)
    assert "LeftOuter" in plan


def test_duplicate_spans_is_topk(spark, sf_dir):
    """The memorization scan must end in TakeOrderedAndProject (per-
    partition heaps), never a global sort of all spans."""
    plan = _plan(spark, "duplicate_spans", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [n_docs" not in plan


def test_pii_redact_is_narrow(spark, sf_dir):
    """Redaction is a pure map over the profile chain — no shuffle."""
    plan = _plan(spark, "pii_redact_profiles", sf_dir)
    assert "Exchange" not in plan


def test_kmeans_broadcasts_centroids_only(spark, sf_dir):
    """Lloyd's iterations must broadcast the k centroids (nested-loop
    over a k-row build side is the right plan) — never sort-merge or
    shuffle the corpus against itself."""
    plan = _plan(spark, "kmeans_assignments", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_merge_upsert_is_one_window_no_join(spark, sf_dir):
    """Upsert = union + window top-1: no join anywhere, and the
    row_number filter is pushed map-side (WindowGroupLimit) so only
    candidate winners cross the exchange."""
    plan = _plan(spark, "profiles_upsert", sf_dir)
    assert "Join" not in plan
    assert "WindowGroupLimit" in plan


def test_scd2_single_shuffle_shared_by_windows(spark, sf_dir):
    """lag (run collapse) and lead (interval assignment) must share
    one exchange on the entity key — a second shuffle here doubles
    the dominant cost at scale."""
    plan = _plan(spark, "customer_status_history", sf_dir)
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_anti_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "incremental_dedup_new_docs", sf_dir)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_sample_per_source_pushes_group_topk(spark, sf_dir):
    """Rank filter must compile to WindowGroupLimit on BOTH sides of
    the exchange: each map task keeps ≤k rows per stratum before the
    shuffle, so the exchange moves O(k·strata), not the corpus."""
    plan = _plan(spark, "docs_sample_per_source", sf_dir)
    assert plan.count("WindowGroupLimit") >= 2


def test_quantize_embeddings_is_narrow(spark, sf_dir):
    plan = _plan(spark, "quantize_embeddings", sf_dir)
    assert "Exchange" not in plan  # pure per-row array HOFs, no shuffle
    assert "pythonUDF" not in plan.lower()


def test_cluster_canonicals_single_agg_no_window(spark, sf_dir):
    # the keeper argmax is max(struct(quality, -doc_id)) — a partial-
    # aggregable groupBy, never a per-cluster window sort
    plan = _plan(spark, "cluster_canonicals", sf_dir)
    assert "Window" not in plan


def test_cosine_topk_batch_group_limit_and_broadcast(spark, sf_dir):
    plan = _plan(spark, "cosine_topk_batch", sf_dir)
    assert "WindowGroupLimit" in plan  # map-side size-k heap per query
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_probe_joins_broadcast(spark, sf_dir):
    # the depth x width cell table is the only thing that moves — it
    # must broadcast into the probe join, never sort-merge
    plan = _plan(spark, "cms_user_event_counts", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_refresh_broadcasts_dirty_buckets(spark, sf_dir):
    # the dirty-bucket set must broadcast into both the anti-join
    # (drop stale buckets) and the semi-join (recompute scan)
    plan = _plan(spark, "rollup_incremental_refresh", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_basket_pairs_topk_no_global_sort(spark, sf_dir):
    plan = _plan(spark, "basket_pairs", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_anomaly_days_broadcasts_stats(spark, sf_dir):
    plan = _plan(spark, "events_anomaly_days", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


# -- round-3: plan contracts for the round-2 heavy dedup/ER set ------


def test_simhash_weighted_never_goes_quadratic(spark, sf_dir):
    # df-weight join must stay an equi-join on the shingle key and
    # band pairing an equi-join on (band, band_bits) — any nested-loop
    # means the banding collapsed to all-pairs
    plan = _plan(spark, "simhash_weighted_dupes", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_overlap_self_join_is_keyed(spark, sf_dir):
    # the per-source distinct bounds each shingle to |sources| rows;
    # the overlap self-join must remain keyed on shingle (the
    # source_a < source_b predicate is a post-join filter, never the
    # join itself)
    plan = _plan(spark, "source_overlap_matrix", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_near_dups_broadcasts_batch_probe(spark, sf_dir):
    # the ingest batch's band table is the small side — it must
    # broadcast into the corpus band join (the corpus is never
    # re-banded or self-joined)
    plan = _plan(spark, "incremental_near_dups", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_matches_resolves_on_name_domain(spark, sf_dir):
    # entity resolution runs on DISTINCT names: levenshtein is
    # verify-only behind the prefix equi-key, best-match is a
    # partial-aggregable argmin (no window over row-level pairs), and
    # the resolution table broadcasts back onto the feed
    plan = _plan(spark, "fuzzy_part_matches", sf_dir)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_topk_and_broadcast_stats(spark, sf_dir):
    """BM25 head must be TakeOrderedAndProject (no global sort) and
    the df/corpus-stats joins must broadcast — the hits-only tf table
    is the only large shuffle input."""
    plan = _plan(spark, "bm25_search", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join


def test_chi2_scans_documents_once(spark, sf_dir):
    # the single-scan rewrite: marginals come from window functions
    # over the tiny cell relation, not from re-executing the scan
    plan = _plan(spark, "chi2_lang_source", sf_dir)
    assert plan.count("Scan parquet") == 1
    assert "ReadSchema: struct<lang:string,source:string>" in plan


def test_gopher_report_single_token_shuffle(spark, sf_dir):
    plan = _plan(spark, "gopher_quality_report", sf_dir)
    # explode → tf agg → per-doc agg → per-source agg: 3 exchanges max
    # (token key, doc key, source key) — no join, no sort
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 4


def test_nation_trend_broadcasts_nation_dim(spark, sf_dir):
    plan = _plan(spark, "nation_revenue_trend", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_ewma_reduces_before_single_row_fold(spark, sf_dir):
    # the sequential fold must sit on TOP of a distributed monthly
    # aggregate — the scan side keeps its partial aggregation
    plan = _plan(spark, "monthly_revenue_ewma", sf_dir)
    assert "partial_sum" in plan  # distributed monthly partials
    assert "Exchange SinglePartition" in plan  # then the tiny fold
    assert plan.count("Scan parquet") == 1


def test_hybrid_rrf_inputs_are_topk(spark, sf_dir):
    plan = _plan(spark, "hybrid_rrf_search", sf_dir)
    # both retrieval arms end in bounded heads before the fusion join
    assert "TakeOrderedAndProject" in plan


def test_skew_report_histogram_not_sort(spark, sf_dir):
    plan = _plan(spark, "events_user_skew_report", sf_dir)
    # exact percentiles via count-of-counts — no global row sort of
    # the per-key counts
    assert "TakeOrderedAndProject" not in plan
    assert plan.count("Scan parquet") == 1


def test_pit_join_single_key_shuffle_no_range_join(spark, sf_dir):
    plan = _plan(spark, "pit_status_enrichment", sf_dir)
    # union-asof pattern: no join operator at all, just windowing
    # over one key-partitioned sort
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "Window" in plan


def test_incremental_view_delta_joins_broadcast_dims(spark, sf_dir):
    plan = _plan(spark, "incremental_nation_view", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_simhash_banded_self_join_reads_cache(spark, sf_dir):
    # the persist boundary must hold: both join sides read the
    # materialized banded table instead of re-deriving signatures
    plan = _plan(spark, "simhash_dupes", sf_dir)
    assert plan.count("InMemoryTableScan") >= 2


def test_semantic_dupes_self_join_reads_cache(spark, sf_dir):
    plan = _plan(spark, "semantic_dupes", sf_dir)
    assert plan.count("InMemoryTableScan") >= 2


# -- round-3 wave: rules/graph/attribution/sampling plan contracts --


def test_basket_rules_topk_and_keyed_joins(spark, sf_dir):
    plan = _plan(spark, "basket_rules", sf_dir)
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort
    # pair generation + count joins stay equi-joins; the only
    # nested-loop is the broadcast 1-row basket total
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_triangle_census_equi_joins_only(spark, sf_dir):
    plan = _plan(spark, "part_triangle_stats", sf_dir)
    # wedge build + closing probe are equi-joins on node keys; only
    # the two 1-row stat combines are nested-loop broadcasts
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_contrastive_negatives_no_window_no_smj(spark, sf_dir):
    plan = _plan(spark, "contrastive_negatives", sf_dir)
    # pool is broadcast (bounded fan-out) and per-anchor ranking is an
    # aggregate slice, not a window sort
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_last_touch_attribution_single_user_shuffle(spark, sf_dir):
    plan = _plan(spark, "last_touch_attribution", sf_dir)
    # exactly one hashpartitioning on user_id feeds the window; the
    # channel rollup re-shuffles <=6 rows
    assert plan.count("hashpartitioning(user_id") == 1


def test_decay_scores_single_agg_no_window(spark, sf_dir):
    plan = _plan(spark, "user_decay_scores", sf_dir)
    assert "Window" not in plan  # pure partial-aggregable groupBy
    assert "SortMergeJoin" not in plan  # anchor is broadcast


def test_registry_wide_no_cartesian_products(spark, sf_dir):
    """Repo-wide guard: NO query in the registry may plan a
    CartesianProduct — the all-pairs shape that cannot survive scale.
    Scalar 1-row combines must come through as broadcast nested-loop
    joins (bounded), never unkeyed partition-pair products. Planning
    all ~210 queries takes ~100 s and catches an accidental crossJoin
    regression anywhere in the surface."""
    offenders, errors = [], []
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 - collect, report all
            errors.append((name, str(ex)[:120]))
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not errors, errors
    assert not offenders, offenders


def test_sampling_and_ann_queries_are_deterministic(spark, sf_dir):
    """Every sampling/clustering/ANN query must be RNG-free: two
    invocations in the same session return byte-identical results
    (the property the md5-hash sampling design buys — resumable,
    auditable corpus construction)."""
    names = [
        "weighted_sample_docs",
        "docs_sample_per_source",
        "kmeans_assignments",
        "contrastive_negatives",
        "mixture_sampled_counts",
        "balanced_shards",
    ]
    for name in names:
        a = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        b = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        assert a == b, f"{name} is not deterministic"


def test_cbo_reorders_star_join_from_analyzed_stats(spark, sf_dir):
    """Cost-based optimization evidence: after ANALYZE TABLE, the
    optimizer holds exact rowCounts and the join reorderer rewrites a
    deliberately bad join order (fact x dim first) so the filtered
    tiny dimension joins before the fact table — the decision that
    matters when 'fact' is 100 TB. Catalog tables + confs are
    restored afterwards."""
    import re

    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        for t in ("nation", "customer", "orders"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
                "overwrite"
            ).saveAsTable(f"cbo_{t}")
            spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def bad_order():
            return (
                spark.table("cbo_orders")
                .join(
                    spark.table("cbo_customer"),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
                .join(
                    spark.table("cbo_nation").filter("n_name = 'FRANCE'"),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                .groupBy("n_name")
                .count()
            )

        stats = (
            spark.table("cbo_orders")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
        assert "rowCount" in stats  # ANALYZE populated exact cardinality
        on = bad_order()._jdf.queryExecution().optimizedPlan().toString()
        order_on = re.findall(r"cbo_(\w+)", on)
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        off = bad_order()._jdf.queryExecution().optimizedPlan().toString()
        order_off = re.findall(r"cbo_(\w+)", off)
        # without stats the written (bad) order survives: fact first
        assert order_off[0] == "orders"
        # with CBO the dims join first and the fact moves last
        assert order_on[0] != "orders" and order_on[2] == "orders"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        for t in ("nation", "customer", "orders"):
            spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


# -- round-3 session-5 wave: inference/survival/ACF/GD contracts --


def test_bootstrap_fanout_partially_aggregates_before_shuffle(spark, sf_dir):
    """The ×R/4 Poisson fan-out must reduce map-side: each task
    partial-aggregates its generated rows per replicate id, so the
    replicate shuffle carries ≤ R rows per task, never the ×R data."""
    plan = _plan(spark, "bootstrap_order_mean_ci", sf_dir)
    assert "partial_sum" in plan  # map-side combine under the explode
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # CI + point are 1-row combines


def test_churn_hazard_single_custkey_shuffle_then_small_series(spark, sf_dir):
    """Lifetimes come from ONE custkey aggregation; everything after
    (at-risk suffix sum, hazard prefix sum) runs over |lifetimes|
    rows — no join operator other than the broadcast corpus-max."""
    plan = _plan(spark, "customer_churn_hazard", sf_dir)
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_acf_shares_one_window_ordering_for_all_lags(spark, sf_dir):
    """All 7 lag columns must collapse into a single Window node over
    one day-ordering — a per-lag self-join (or per-lag window) would
    multiply the series scan by max_lag."""
    plan = _plan(spark, "daily_revenue_acf", sf_dir)
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_logistic_gd_all_joins_broadcast(spark, sf_dir):
    """The GD chain folds each 1-row gradient back with broadcast
    nested-loop combines; the feature build joins broadcast stats.
    Nothing in the loop may shuffle-join or sort."""
    plan = _plan(spark, "logistic_churn_model", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_auc_rank_arithmetic_on_bounded_series(spark, sf_dir):
    """AUC = one custkey shuffle → per-score groups → rank window
    over |distinct scores| rows. No sort-merge join, no cartesian."""
    plan = _plan(spark, "churn_score_auc", sf_dir)
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kfold_protocol_is_one_custkey_pass(spark, sf_dir):
    """Per-fold train rates come from inclusion–exclusion via a
    window over the k-row fold table and the Brier expands
    algebraically — the protocol must NOT re-run the custkey pass
    for the global totals (exactly one custkey exchange; the only
    scans are the label build and the corpus-max bound)."""
    plan = _plan(spark, "kfold_churn_baseline", sf_dir)
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert plan.count("Scan parquet") == 2
    assert "SortMergeJoin" not in plan


def test_quantile_norm_histogram_relations_and_broadcast_probe(spark, sf_dir):
    """The corpus is scanned exactly twice (source×score cells,
    global histogram); the per-mille range probe is a broadcast
    nested-loop over bounded relations and the final map join is a
    broadcast equi-join — never a shuffle join."""
    plan = _plan(spark, "quality_quantile_norm", sf_dir)
    assert plan.count("Scan parquet") == 2
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_psi_pivot_not_outer_join(spark, sf_dir):
    """The half×bin pivot must be conditional sums in ONE aggregate —
    an outer join of per-half relations would both double the scan
    and drop the smoothing floor on absent bins."""
    plan = _plan(spark, "feature_psi_drift", sf_dir)
    assert plan.count("Scan parquet") == 2  # binning + the max bound
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_conformal_quantile_is_histogram_cdf(spark, sf_dir):
    """The conformal quantile must come from the binned-residual
    histogram CDF — no global sort of residuals, model join
    broadcast."""
    plan = _plan(spark, "conformal_order_intervals", sf_dir)
    assert "BroadcastHashJoin" in plan  # 5-row model join
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" not in plan


def test_calibration_train_eval_pivot_is_one_pass(spark, sf_dir):
    """Train and eval rates come from conditional sums in ONE
    per-score aggregate — a filter-twice-and-join shape would run
    the custkey pass once per branch."""
    plan = _plan(spark, "score_calibration_report", sf_dir)
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert plan.count("hashpartitioning(s#") == 1
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan  # no join anywhere


def test_copurchase_eval_keyed_joins_only(spark, sf_dir):
    """Pair generation rides the l_orderkey key (basket-bounded
    fan-out), recommendations are an argmax groupBy, and both eval
    joins are equi-joins — nothing nested-loop, no global sort."""
    plan = _plan(spark, "copurchase_hitrate", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" not in plan


# -- round-4: plan contracts for the remaining statistical family
# (VERDICT r3 #7; churn_score_auc + bootstrap already pinned above) --


def test_psi_drift_is_one_bin_pivot_no_self_join(spark, sf_dir):
    """PSI must come from ONE conditional-sum pivot over the bin key
    (n_a/n_b as filtered sums), never an outer self-join of the two
    md5 halves — and the smoothing fold runs as a window over the
    n_bins-row relation. One orders scan for the binning, one for
    the broadcast max bound; no shuffle join, no cartesian."""
    plan = _plan(spark, "feature_psi_drift", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 2  # binning + max-bound
    assert "Window" in plan
    assert "partial_sum" in plan  # map-side combine on the bin pivot


def test_conformal_intervals_histogram_cdf_no_global_sort(spark, sf_dir):
    """The conformal quantile must run over the $100-binned residual
    histogram (bounded relation), not a global residual sort; the
    5-row priority model joins back as a broadcast equi-join. No
    sort-merge join, no cartesian beyond 1-row stat combines."""
    plan = _plan(spark, "conformal_order_intervals", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # model -> calibration probe
    # the only Sort feeds the bounded histogram window, not the data
    assert "partial_count" in plan or "partial_sum" in plan


def test_bootstrap_single_orders_scan_for_fanout(spark, sf_dir):
    """The xR/4 replicate fan-out must read orders ONCE for the
    resample (plus one scan for the point estimate) — a per-replicate
    re-scan would multiply the 100 TB read by R."""
    plan = _plan(spark, "bootstrap_order_mean_ci", sf_dir)
    assert plan.count("Scan parquet") == 2


def test_churn_auc_no_cartesian_guarded_null(spark, sf_dir):
    """Degenerate-corpus guard (ADVICE r3) must not change the plan
    shape: corpus-max still rides in as a broadcast 1-row combine,
    and the guard is a projection, not a join."""
    plan = _plan(spark, "churn_score_auc", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan  # 1-row corpus_max bound
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 2


# -- round-4 waves: plan contracts --


def test_ks_drift_one_scan_bounded_windows(spark, sf_dir):
    """KS: ONE orders scan feeds the bin pivot; both windows (CDF +
    totals) run over the bounded bin histogram. No join at all."""
    plan = _plan(spark, "ks_two_sample_drift", sf_dir)
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "partial_sum" in plan  # map-side combine on the pivot


def test_bloom_probe_is_broadcast_single_pass(spark, sf_dir):
    """The ≤m-row filter relation must broadcast into the probe scan
    (never shuffle-join the probe corpus), and pass/fail must come
    from ONE probe-keyed aggregation — no join back to the probes."""
    plan = _plan(spark, "bloom_membership_audit", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_codebook_broadcast_no_selfjoin(spark, sf_dir):
    """PQ assignment: codebook broadcasts into one narrow corpus
    scan; the corpus is never self-joined or globally sorted beyond
    the k-row codebook init."""
    plan = _plan(spark, "pq_codebook_report", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Scan parquet") == 2  # corpus + codebook init


def test_debounce_single_keyed_window(spark, sf_dir):
    plan = _plan(spark, "event_debounce_report", sf_dir)
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_watermark_audit_block_relation_broadcasts(spark, sf_dir):
    """Lateness joins the bounded block-watermark relation back as a
    broadcast equi-join; the prefix-max window runs over |blocks|
    rows, never the event corpus."""
    plan = _plan(spark, "watermark_lag_audit", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Scan parquet") == 2


def test_cdc_chunking_per_doc_windows_digest_rollup(spark, sf_dir):
    """CDC chunk ids come from PER-DOC windows (partitionBy doc_id —
    bounded by doc length); the dedup rollup shuffles on the uniform
    digest key. No join."""
    plan = _plan(spark, "content_defined_chunks", sf_dir)
    assert "Join" not in plan
    assert "hashpartitioning(doc_id" in plan
    assert "Window" in plan


# -- round-4 later waves: plan contracts --


def test_rfm_uncached_broadcast_scores_no_smj(spark, sf_dir):
    """r5: the per-customer metric persist was DROPPED after the
    A/B (PERF.md round-5 table — uncached ties or wins at sf0.1, 10x
    and 30x, and the cache's first-touch spike was the r4 bench
    regression). Contract now: re-running the cheap custkey shuffle
    per branch is fine, but the three quintile score maps must stay
    broadcast and nothing may flip to SortMergeJoin/cartesian."""
    plan = _plan(spark, "customer_rfm_scores", sf_dir)
    assert "InMemoryTableScan" not in plan  # the persist stays gone
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gdpr_plan_broadcast_semi_joins_only(spark, sf_dir):
    """Every erasure count is a broadcast semi-join driven by the
    request-queue-sized subject set — no shuffle join of any fact
    table."""
    plan = _plan(spark, "gdpr_erasure_plan", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_all_cross_plan_relations_broadcast(spark, sf_dir):
    """Centroids, codebooks, ADC table, probe cells and the query
    vector all broadcast; nothing corpus-shaped shuffle-joins."""
    plan = _plan(spark, "ann_ivfpq_topk", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dataset_card_no_corpus_window(spark, sf_dir):
    """The card is independent small aggregates combined by 1-row
    broadcast combines — no window over the corpus, no shuffle
    join."""
    plan = _plan(spark, "dataset_card_report", sf_dir)
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


# -- round-5 additions: plan contracts --


def test_contamination_benchmark_grams_broadcast(spark, sf_dir):
    """The benchmark gram set must broadcast into the semi-join —
    shuffling the training corpus on the gram key would be the
    wrong plan at any scale."""
    plan = _plan(spark, "benchmark_ngram_contamination", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_pairs_form_per_cell_only(spark, sf_dir):
    """SemDeDup's pair compare must happen INSIDE cells: one Arrow
    group per cell through the BLAS kernel (FlatMapGroupsInPandas
    keyed on the cell), never a global cartesian — and since r6 the
    cells come from the MAINTAINED IVF-PQ artifact's frozen centroid
    table (a parquet scan + broadcast assignment), not a
    per-invocation k-means retrain."""
    plan = _plan(spark, "semdedup_prune_plan", sf_dir)
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(cell" in plan
    # frozen quantizer: the centroid relation is READ (artifact
    # parquet), not derived from the embedding corpus in-plan
    assert "centroids" in plan


def test_semdedup_incremental_reads_touched_cells_only(spark, sf_dir):
    """Incremental SemDeDup must semi-join the corpus side onto the
    batch's touched-cell set (broadcast, bounded by n_cells) before
    any pair work — the cell-partition-pruned read shape — and the
    pair compare stays per-cell Arrow BLAS."""
    plan = _plan(spark, "semdedup_incremental_prune", sf_dir)
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastHashJoin [cell" in plan and "LeftSemi" in plan


def test_ivfpq_serve_partition_prunes_artifact(spark, sf_dir):
    """The registry serve query must read the persisted codes with a
    cell partition filter (n_probe of n_cells directories)."""
    plan = _plan(spark, "ann_ivfpq_serve", sf_dir)
    assert "PartitionFilters: [cell" in plan


def test_dsir_selection_no_corpus_global_rank(spark, sf_dir):
    """DSIR's top-k selection must be the histogram-CDF cut (VERDICT
    r5 ask #1): the deterministic doc_id tie rule runs as a window
    KEYED ON THE SCORE (per-partition width = ties per score), and no
    row_number window anywhere in the plan is partition-less — the
    r5 global rank over the whole scored corpus is gone. The one
    SinglePartition window left is the CDF over the distinct-score
    histogram."""
    plan = _plan(spark, "dsir_selection_report", sf_dir)
    rn_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn_lines, "tie rule must still rank at the cut"
    assert all(
        "windowspecdefinition(avg_micro" in l for l in rn_lines
    ), "every row_number window must be score-keyed"


def test_bloom_contamination_no_gram_corpus_shuffle(spark, sf_dir):
    """The Bloom decontamination tier must probe with broadcast
    map-side joins: k bit-relation joins + the exact-tier gram join
    all broadcast, never a sort-merge or cartesian — the training
    gram relation is only ever shuffled on doc_id (the rollup)."""
    plan = _plan(spark, "benchmark_bloom_contamination", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        text,
    )

    # one broadcast probe join per hash + the exact gram tier
    assert plan.count("BroadcastHashJoin") >= text.BLOOM_GRAM_K + 1
    assert "BroadcastHashJoin [pos_0" in plan


def test_ivfpq_batch_serve_prunes_and_partitions_by_query(spark, sf_dir):
    """The batched serve must keep cell partition pruning on the
    artifact (union of probed cells as a literal filter) and run its
    shortlist/re-rank windows PARTITIONED BY qid — batching queries
    must not cost either property."""
    plan = _plan(spark, "ann_ivfpq_serve_batch", sf_dir)
    assert "PartitionFilters: [cell" in plan
    assert "windowspecdefinition(qid" in plan
    rn_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn_lines and all(
        "windowspecdefinition(qid" in l or "WindowGroupLimit [qid" in l
        for l in rn_lines
    ), "no global (partition-less) window may appear in the serve"
    # map-side group-limit pruning fires for both ranking tiers
    assert "WindowGroupLimit [qid" in plan


def test_band_index_probe_reads_artifact_broadcasts_batch(spark, sf_dir):
    """The indexed near-dup probe must read corpus bands from the
    persisted artifact (no in-plan re-banding of the corpus: exactly
    one minhash chain — the batch's) and broadcast the batch side
    into the band-key join."""
    plan = _plan(spark, "near_dup_probe_indexed", sf_dir)
    assert "BroadcastHashJoin [band_key" in plan
    # the artifact scan shows up as a plain parquet read of band rows
    assert "band_index_v2_" in plan
    assert "CartesianProduct" not in plan


def test_doremi_single_token_pass_no_windows(spark, sf_dir):
    """DoReMi reweighting must be one token pass + |sources|-row
    mixture math: no window anywhere (the normalizing sum is a 1-row
    aggregate), no join wider than the broadcast stats, no sort of
    the corpus."""
    plan = _plan(spark, "doremi_mixture_weights", sf_dir)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_quality_filter_threshold_is_broadcast_boundary(spark, sf_dir):
    """The trained keep-threshold must reach the corpus scoring scan
    as a 1-row broadcast: no global rank anywhere in the gate (the
    only Window is the descending train-score histogram CDF), no
    sort-merge join, and every nested-loop join is one of the
    designed 1-row planner scalars (GD weight folds + the boundary —
    the constant-key joins Catalyst collapses to BNLJ broadcasts)."""
    plan = _plan(spark, "quality_model_filtered_counts", sf_dir)
    assert "row_number" not in plan
    assert "SortMergeJoin" not in plan
    w_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert w_lines and all("DESC" in l for l in w_lines)  # CDF only


def test_chunk_dedup_windows_are_per_doc_only(spark, sf_dir):
    """Chunk-substring dedup must never sort or window globally: the
    only windows are the per-doc chunk-id running sum and the
    per-digest keeper rank — both keyed; no cartesian anywhere."""
    plan = _plan(spark, "chunk_dedup_report", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "doc_id" in line or "digest" in line


def test_normalized_dedup_report_is_one_scan_no_join(spark, sf_dir):
    """The normalization-tier audit is one scan + one aggregate:
    both digests computed map-side, no join, no window, no sort."""
    plan = _plan(spark, "normalized_dedup_report", sf_dir)
    assert "Join" not in plan
    assert "Window" not in plan


def test_dedup_funnel_no_global_window_or_cartesian(spark, sf_dir):
    plan = _plan(spark, "dedup_funnel_report", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "doc_id" in line or "digest" in line


def test_jl_projection_is_literal_folded_single_equijoin(spark, sf_dir):
    """The JL sketch must cost one scan + one vec_id equi-join: the
    sign matrix is baked into the plan as literals (no runtime md5,
    no sign-table join), no cartesian, no Python UDF."""
    plan = _plan(spark, "jl_projection_distortion", sf_dir)
    assert "md5" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_jl_recall_rankings_are_per_query_windows(spark, sf_dir):
    """Both ANN arms rank per probe query: every window is
    partitioned by q_id (WindowGroupLimit-prunable), the probe set
    broadcasts, and no Python UDF appears."""
    plan = _plan(spark, "ann_jl_recall", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "q_id" in line


def test_epoch_shuffle_is_one_scan_no_selfjoin(spark, sf_dir):
    """The epoch shuffle audit must be one corpus scan: move flags
    come from adjacent elements of the per-row shard array, so no
    join and no doc-keyed window may appear."""
    plan = _plan(spark, "epoch_shuffle_plan", sf_dir)
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 1


def test_jl_shortlist_curve_no_nonequi_join(spark, sf_dir):
    """The config dimension must be an exploded literal over the
    shortlisted slice — no nested-loop/non-equi join, no cartesian;
    ranking windows keyed by q_id."""
    plan = _plan(spark, "jl_shortlist_curve", sf_dir)
    # exactly one BNLJ is designed: the 8-row broadcast probe join
    # (the ann_lsh_recall device); the CONFIG dimension must be an
    # explode, never a second nested-loop
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "q_id" in line


def test_temporal_leakage_and_contamination_stay_keyed(spark, sf_dir):
    """The temporal-boundary audits must ride equi-joins: the only
    nested-loop joins allowed are the deliberate 1-row scalar
    broadcasts (the n_base count and the hour-CDF cutoff riding
    crossJoin) — every BNLJ must be a Cross build, and no
    CartesianProduct may appear (a row-vs-row cartesian means the
    split-tag join or the gram probe decorrelated wrong)."""
    for q in ("temporal_split_leakage", "temporal_contamination"):
        plan = _plan(spark, q, sf_dir)
        assert "CartesianProduct" not in plan, q
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_scalar_cross = plan.count(
            "BroadcastNestedLoopJoin BuildRight, Cross"
        )
        assert n_bnlj == n_scalar_cross, q


def test_band_probe_after_erase_broadcasts_batch(spark, sf_dir):
    """The erased band index probe keeps the incremental shape: the
    banded batch broadcasts into the corpus-band join (the corpus
    side never shuffles on the band key)."""
    plan = _plan(spark, "near_dup_probe_after_erase", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_windows_are_per_shard(spark, sf_dir):
    """The running-offset window must be PARTITIONED by shard — a
    global (empty-partition) window would serialize the corpus
    through one task."""
    import re as _re

    plan = _plan(spark, "sequence_packing_plan", sf_dir)
    assert "CartesianProduct" not in plan
    # every Window's partition spec (2nd bracket group) must be
    # non-empty and keyed on shard
    specs = _re.findall(r"Window \[[^\]]*\], \[(shard[^\]]*)\],", plan)
    assert len(specs) >= 1
    assert plan.count("Window [") == len(specs)


def test_boilerplate_scrub_broadcasts_templates(spark, sf_dir):
    """The template set is threshold-bounded — it must ride into the
    scrub as a broadcast join, never a shuffle of the corpus side."""
    plan = _plan(spark, "boilerplate_scrub_report", sf_dir)
    assert "BroadcastHashJoin" in plan
    # the cover anti-join on (doc_id, pos) is doc-keyed, fine either
    # way, but no cartesian/nested-loop may appear anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_edit_distance_dp_stage_is_wide_and_checkpointed(spark, sf_dir):
    """The Levenshtein stage is CPU-bound: the plan must read both
    intermediates from checkpoints (no re-execution of the banded
    pipeline — the measured 30-scan/zero-reuse failure mode) and the
    DP must sit above an explicit-width repartition, not an
    AQE-coalesced shuffle."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )

    df = QUERIES["edit_distance_dupes"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both eager checkpoints feed the final plan as scans, so the
    # parquet source appears nowhere in it
    assert "Scan ExistingRDD" in plan
    assert "documents" not in plan
    assert "levenshtein" not in plan  # DP already materialized


def test_cluster_labels_erase_untouched_pass_is_one_anti_join(spark):
    """Untouched clusters must stream through a broadcast anti-join —
    no star rounds over the artifact, no sort-merge against the
    request-sized erase set."""
    C = [f"core{i}" for i in range(42)]
    P = [f"pp{i}" for i in range(42)]
    docs = spark.createDataFrame(
        [(1, " ".join(C), "en", "s", 0), (2, " ".join(C + P), "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )

    labels = dedup.near_dup_clusters_checkpointed(docs)
    erase = spark.createDataFrame([(1,)], "doc_id long")
    plan = (
        dedup.cluster_labels_erase(labels, docs, erase)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_novelty_curve_single_gram_shuffle(spark, sf_dir):
    """Grams travel as md5 digests through ONE keyed pre-aggregate;
    the first-seen window partitions by gram (bounded rows), never a
    global sort of occurrences."""
    plan = _plan(spark, "ngram_novelty_curve", sf_dir)
    assert "md5" in plan
    # exactly one window (the per-gram min-bucket); its partition key
    # is the gram
    assert plan.count("Window") >= 1
    assert "partial_count" in plan or "partial_sum" in plan


def test_corpus_version_is_one_partial_aggregable_reduce(spark, sf_dir):
    """The provenance stamp's whole 100 TB argument: the corpus
    version digest folds to ONE row through map-side partials — the
    plan must show the two-phase xor aggregate (partial + final) and
    a single-partition exchange, never a wide shuffle or a sort."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        governance as gov,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        gov.corpus_version(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("bit_xor") >= 2  # partial + final phases
    assert "SinglePartition" in plan
    assert "Sort" not in plan


def test_lineage_probe_broadcasts_the_label_joins(spark, sf_dir):
    """doc_lineage_probe's point lookups must stay broadcast-shaped:
    the sampled docs join the maintained labels without a sort-merge
    shuffle of either side."""
    plan = _plan(spark, "doc_lineage_probe", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_preference_near_dup_audit_is_keyed_aggregate_only(spark, sf_dir):
    """The within-pair verify must stay ONE (pair_id, shingle) keyed
    aggregate — the pair relation scales with the corpus, so a
    SortMergeJoin of shingle tables (or a corpus-sized broadcast)
    would be the wrong plan at 100 TB. The only nested-loop joins
    allowed are the three 1-row scalar attaches."""
    plan = _plan(spark, "preference_pair_near_dup_audit", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3  # 1-row attaches


def test_lang_band_probe_broadcasts_batch_and_prunes(spark, sf_dir):
    """The lang-aware band-index probe (inner operator — the
    registered query returns a published parquet read) must broadcast
    the batch bands into the artifact join and never form a
    cartesian."""
    import os
    import shutil
    import tempfile

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    cdocs = dedup.with_cjk_docs(docs)
    base = cdocs.filter(F.col("doc_id") < dedup.CJK_VARIANT_ID_OFFSET)
    batch = cdocs.filter(
        F.col("doc_id") >= dedup.CJK_VARIANT_ID_OFFSET
    )
    work = tempfile.mkdtemp(prefix="plan_bidx_")
    try:
        dedup.write_band_index(
            base, os.path.join(work, "b"), tokenizer="lang_aware"
        )
        plan = (
            dedup.incremental_near_dups_indexed(
                spark, os.path.join(work, "b"), base, batch
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        shutil.rmtree(work, ignore_errors=True)
