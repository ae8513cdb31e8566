"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

The headline workload is the north-star metric: per-turn Readability
extraction over a skewed synthetic transcripts table whose HTML payloads are
the reference fixture corpus (equality-gated by the test suite), through the
full salted/partitioned mapInPandas pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# ---- host-capacity calibration ---------------------------------------------
# This VM's effective CPU capacity fluctuates ±50% over minutes, which made
# round-over-round wall-time deltas ambiguous (is a 40% swing a regression or
# the host?).  A fixed deterministic single-thread CPython work unit, timed
# before AND after the run, gives every bench artifact its own capacity index:
#   capacity_index = PROBE_NOMINAL_SEC / measured_probe_sec   (1.0 ≈ nominal)
#   <metric>_normalized = <metric> / capacity_index
# PROBE_NOMINAL_SEC anchors the index at this host's FULL-capacity window
# (calibrated 2026-08-17 via the node cross-check: probe_sec × node_docs/s is
# ~constant across capacity windows since both are single-thread CPU-bound;
# probe=0.157 s at node=50 docs/s → ~0.105 s/24 iter at node=75 docs/s full
# capacity → 0.42 s at 96 iter).  The absolute anchor is arbitrary — the
# point is that the SAME constant makes rounds comparable to each other.
PROBE_NOMINAL_SEC = 0.42
_PROBE_ITERS = 96
_REF_FIXTURES = "/root/reference/test/test-pages"
_NODE_PROBE_DOCS = 12


def cpy_probe(iters: int = _PROBE_ITERS) -> float:
    """Deterministic single-thread CPython work unit (string/dict/regex/md5
    churn, the op mix the extraction kernel is bound by); returns wall sec."""
    t0 = time.perf_counter()
    words = [f"w{i % 997}" for i in range(20000)]
    text = " ".join(words)
    rx = re.compile(r"w(\d+)")
    total = 0
    for _ in range(iters):
        parts = text.split(" ")
        d: dict[str, int] = {}
        for p in parts:
            d[p] = d.get(p, 0) + 1
        total += sum(int(m) for m in rx.findall(text[: len(text) // 2]))
        total += int(hashlib.md5(text.encode()).hexdigest()[:8], 16) & 7
        text = text[1:] + "x"
    assert total >= 0
    return time.perf_counter() - t0


def node_probe() -> float | None:
    """Reference-side capacity probe: docs/sec for node running the actual
    reference library over a fixed 12-fixture subset.  GROSS of node
    process startup and JSON (de)serialization — a capacity INDEX to
    compare across bench runs, NOT comparable to tools/head_to_head.py's
    startup-net full-corpus docs/s (the capacity_index itself is anchored
    on cpy_probe; this value is corroborating context only).  None if node
    or the fixture corpus is unavailable."""
    try:
        docs = []
        for d in sorted(os.listdir(_REF_FIXTURES))[:_NODE_PROBE_DOCS]:
            p = os.path.join(_REF_FIXTURES, d, "source.html")
            if os.path.exists(p):
                with open(p, encoding="utf-8") as fh:
                    docs.append(fh.read())
        if not docs:
            return None
        t0 = time.perf_counter()
        out = subprocess.run(
            ["node", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tools", "ref_extract.mjs")],
            input=json.dumps(docs), capture_output=True, text=True, timeout=300,
        )
        dt = time.perf_counter() - t0
        if out.returncode != 0:
            return None
        return round(len(docs) / dt, 2)
    except Exception:
        return None


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    from pyspark.sql import functions as F

    from readability_1_spark.pipeline import extract_transcripts
    from readability_1_spark.queries import QUERIES
    from readability_1_spark.session import get_spark
    from readability_1_spark.transcripts import scaled_transcripts

    sf = infer_sf(SF_DIR)
    probe_pre = round(cpy_probe(), 4)
    node_pre = node_probe()
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict = {"cpus": CPUS}

    # ---- headline: extraction over skewed fixture-HTML transcripts --------
    # capped so the whole bench stays inside a few minutes; best-of-2 because
    # this VM's effective CPU capacity fluctuates over minutes
    n_turns = max(3000, min(int(600_000 * sf), 15_000))
    transcripts = scaled_transcripts(spark, n_turns).persist()
    n_html = transcripts.filter(
        F.col("text").isNotNull() & F.col("text").rlike("(?i)<html")
    ).count()  # materializes the persist before timing the kernel

    best_dt, agg = None, None
    for _attempt in range(2):
        t0 = time.time()
        extracted = extract_transcripts(transcripts, num_parts=max(CPUS * 2, 64))
        agg = extracted.groupBy("status").count().collect()
        dt = time.time() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    timings["extract_transcripts"] = round(best_dt, 3)
    extra["extract_html_turns"] = n_html
    extra["turns_per_sec"] = round(n_html / best_dt, 2)
    extra["status_counts"] = {r["status"]: r["count"] for r in agg}

    # Payload-dedup path: agent transcripts repeat fetched pages, so the
    # kernel runs once per DISTINCT page and joins back (same per-turn
    # output, tested) — the dominant saving on real transcript corpora.
    t0 = time.time()
    extract_transcripts(
        transcripts, num_parts=max(CPUS * 2, 64), dedup_payloads=True
    ).groupBy("status").count().collect()
    dt = time.time() - t0
    timings["extract_transcripts_dedup"] = round(dt, 3)
    extra["turns_per_sec_dedup"] = round(n_html / dt, 2)
    transcripts.unpersist()

    # ---- secondary headliners over the sf tables ---------------------------
    for name in (
        "q1_pricing_summary",
        "top_revenue_orders",
        "events_sessionize",
        "dedup_minhash_lsh",
        "dedup_minhash_clusters",
        "dedup_ngram_jaccard",
        "text_quality",
        "doc_fingerprint",
        "ann_cosine_topk",
        "ann_ivf_probe",
        "dedup_embedding_lsh",
        # round 5: tokenized shards end-to-end + trained classifier.
        # bpe_tokenize_ids pays the (memoized) 50-iteration trainer;
        # pack_token_ids reuses it.  Excluded from the r04-comparable
        # subtotal below.
        "bpe_tokenize_ids",
        "pack_token_ids",
        "doc_quality_classifier",
        # round 5, second wave: BM25 retrieval + Bloom cross-snapshot dedup.
        # Also excluded from the r04-comparable subtotal.
        "bm25_search_topk",
        "dedup_bloom_membership",
        "gopher_quality_filters",
        "dsir_importance_weights",
        "dedup_containment",
        "pmi_collocations",
        "source_overlap_minhash",
        "ccnet_perplexity_buckets",
        "source_token_kl",
        "domain_cap_sample",
        "doclen_quantile_sketch",
        # round 5, sixth wave: SemDeDup, n-gram novelty, split leakage.
        # Also excluded from the r04-comparable subtotal.
        "semdedup",
        "doc_ngram_novelty",
        "split_leakage_check",
        "ann_pq_adc_topk",
        "ann_ivf_pq_topk",
        "unimax_allocation",
        # round 5, fourteenth wave: C4 battery over extracted text, tf-idf
        # keywords, Zipf fit, unigram entropy.  Also excluded from the
        # r04-comparable subtotal.
        "extract_c4_filters",
        "tfidf_top_terms",
        "token_zipf_fit",
        "doc_unigram_entropy",
        # round 5, fifteenth wave: clustering-quality audit + held-out LM
        # evaluation.  Also excluded from the r04-comparable subtotal.
        "kmeans_silhouette",
        "lm_perplexity_heldout",
        # round 5, sixteenth wave: Gopher repetition battery, two-stage PQ
        # re-rank, conversation rollup.  Excluded from the r04 subtotal.
        "extract_repetition_filters",
        "ann_ivfpq_rerank_topk",
        "transcript_conversation_stats",
        "small_quantity_revenue",
        # round 5, eighteenth wave: dedup histogram + dataset card.
        "dedup_cluster_stats",
        "corpus_datacard",
        # round 5, nineteenth wave: link graph over extracted HTML.
        "extract_outlinks",
        "outlink_host_indegree",
        "outlink_host_pagerank",
        "extract_url_normalize",
        # round 5, twentieth wave: anchor text + crawl frontier.
        "anchor_text_terms",
        "crawl_frontier_topk",
        # round 5, twenty-first wave: C4 span dedup + temperature mixing.
        "dedup_sentence_spans",
        "mix_temperature_weights",
        # round 5, twenty-second wave: URL blocklist + RAG chunks + SFT ctx.
        "url_blocklist_filter",
        "doc_chunk_windows",
        "sft_context_windows",
        # round 5, twenty-third wave: exact prefix-filter similarity join +
        # edit-distance verification over LSH candidates.
        "dedup_prefixfilter_pairs",
        "dedup_editdistance_pairs",
        # round 5, twenty-fourth wave: transcript-corpus analytics.
        "conversation_dedup",
        "role_transition_stats",
        "turn_reply_latency",
        "agent_loop_detect",
        # round 5, twenty-fifth wave: SQ8 quantization, ANN recall eval,
        # classifier calibration.  Excluded from the r04 subtotal.
        "embedding_scalar_quantize",
        "ann_recall_eval",
        "quality_calibration_bins",
        # round 5, twenty-sixth wave: tokenizer fertility, minhash
        # estimator audit, snapshot delta.  Excluded from the r04 subtotal.
        "tokenizer_fertility",
        "minhash_estimate_error",
        "corpus_snapshot_delta",
        # round 5, twenty-seventh wave: boilerplate lines, tool triage,
        # length batching.  Excluded from the r04 subtotal.
        "boilerplate_line_filter",
        "tool_call_stats",
        "length_group_batching",
        # round 5, twenty-eighth wave: HTML triage, integrity gate, vocab
        # coverage.  Excluded from the r04 subtotal.
        "turn_html_stats",
        "transcript_integrity_check",
        "token_coverage_vocab_size",
        # round 5, twenty-ninth wave: embedding outlier flags.  Excluded
        # from the r04 subtotal.
        "kmeans_outlier_flags",
        # round 5, thirtieth wave: near-repeat loop detection.  Excluded
        # from the r04 subtotal.
        "agent_loop_neardup",
        # round 5, thirty-first wave: conversation split + BPE roundtrip.
        # Excluded from the r04 subtotal.
        "conversation_split_assign",
        "bpe_roundtrip_check",
        # round 5, thirty-second wave: LSH banding planner + duplicated
        # passage mining.  Excluded from the r04 subtotal.
        "minhash_lsh_param_plan",
        "dup_ngram_topk",
        # round 5, thirty-third wave: hybrid RRF fusion, preference pairs,
        # tool-output collapse.  Excluded from the r04 subtotal.
        "hybrid_rrf_fusion",
        "preference_pair_mining",
        "tool_output_collapse",
        # round 5, thirty-fourth wave: incremental LSH probe, filter
        # agreement, skew audit.  Excluded from the r04 subtotal.
        "dedup_index_lookup",
        "filter_agreement_matrix",
        "partition_skew_audit",
        # round 5, thirty-fifth wave: encoding triage, shuffle plan,
        # license scan.  Excluded from the r04 subtotal.
        "mojibake_detect",
        "training_shuffle_plan",
        "license_notice_scan",
        # round 5, thirty-sixth wave: unicode triage, A-ES weighted
        # sampling, soft dedup weights.  Excluded from the r04 subtotal.
        "unicode_normalize_stats",
        "weighted_sample_aes",
        "dedup_soft_weights",
        # round 5, thirty-seventh wave: slop triage, pass@k, GRPO
        # advantages.  Excluded from the r04 subtotal.
        "synthetic_text_flags",
        "eval_pass_at_k",
        "group_advantage_normalize",
        # round 5, thirty-eighth wave: groundedness, contrastive pairs,
        # FIM planning.  Excluded from the r04 subtotal.
        "grounding_overlap_score",
        "contrastive_pair_mining",
        "fim_span_plan",
        # round 5, thirty-ninth wave: prefix-cache audit, OCR triage,
        # instruction complexity.  Excluded from the r04 subtotal.
        "shared_prefix_stats",
        "ocr_garbage_detect",
        "instruction_complexity",
        # round 5, fortieth wave: special-token hygiene + SFT
        # serialization.  Excluded from the r04 subtotal.
        "special_token_leakage",
        "chat_template_render",
        "loss_mask_spans",
        # round 5, forty-first wave: clustering eval, packed attention,
        # shard sizing.  Excluded from the r04 subtotal.
        "kmeans_cluster_purity",
        "packing_attention_spans",
        "shard_size_plan",
        # round 5, forty-second wave: temporal split, refusal triage,
        # known-item MRR.  Excluded from the r04 subtotal.
        "time_split_assign",
        "refusal_rate_scan",
        "search_mrr_eval",
        # round 5, forty-third wave: lexical diversity, code routing,
        # markdown triage.  Excluded from the r04 subtotal.
        "lexical_diversity",
        "code_detect",
        "markdown_structure_stats",
        # round 5, forty-fourth wave: readability scores, Luhn CC scan,
        # toxicity triage.  Excluded from the r04 subtotal.
        "readability_scores",
        "pii_luhn_scan",
        "toxicity_wordlist_scan",
        # round 5, forty-fifth wave: Heaps'-law vocabulary growth, source
        # keyness, verbosity trend.  Excluded from the r04 subtotal.
        "heaps_law_fit",
        "source_keyness",
        "assistant_verbosity_trend",
        # round 5, forty-sixth wave: embedding-space PCA health, context
        # budget planning, truncation triage.  Excluded from the r04
        # subtotal.
        "embedding_pca_power",
        "context_budget_plan",
        "truncation_artifact_detect",
        # round 5, forty-seventh wave: injection scan, CoT structure,
        # prompt-conflict mining.  Excluded from the r04 subtotal.
        "prompt_injection_scan",
        "cot_structure_detect",
        "sft_prompt_conflicts",
        # round 5, forty-eighth wave: trajectory success filter, Q4-shape
        # late shipments, cross-split prompt leakage.  Excluded from the
        # r04 subtotal.
        "trajectory_success_filter",
        "late_shipment_orders",
        "sft_split_prompt_leakage",
        # round 5, forty-ninth wave: CDC chunk dedup, Q13 histogram, RAKE
        # keywords.  Excluded from the r04 subtotal.
        "cdc_chunk_dedup",
        "customer_order_distribution",
        "rake_keywords",
        # round 5, fiftieth wave: bipartite HITS, Q22 idle balances, T5
        # span-corruption planning.  Excluded from the r04 subtotal.
        "outlink_host_hits",
        "idle_customer_balance",
        "span_corruption_plan",
        # round 5, fifty-first wave: Q15 top supplier, Bradley-Terry
        # strengths, MRL truncation audit.  Excluded from the r04 subtotal.
        "top_supplier_revenue",
        "bradley_terry_strength",
        "embedding_dim_truncation",
        # round 5, fifty-second wave: event funnel, retention cohorts,
        # negative-sampling table.  Excluded from the r04 subtotal.
        "event_funnel",
        "retention_cohorts",
        "negative_sampling_plan",
        # round 5, fifty-third wave: Q18/Q21 shapes + host-graph
        # components.  Excluded from the r04 subtotal.
        "large_volume_orders",
        "sole_late_supplier",
        "outlink_host_components",
        # round 5, fifty-fourth wave: title collisions, column profile,
        # uncertainty sampling.  Excluded from the r04 subtotal.
        "extract_title_collisions",
        "data_profile_orders",
        "uncertainty_sample_topk",
        # round 5, fifty-fifth wave: nDCG eval, rate anomaly flags,
        # length-bias audit.  Excluded from the r04 subtotal.
        "ndcg_eval",
        "event_rate_anomaly",
        "preference_length_bias",
        # round 5, fifty-sixth wave: Poisson bootstrap CI, per-tool error
        # rates, classifier ECE.  Excluded from the r04 subtotal.
        "bootstrap_mean_ci",
        "tool_error_rate_by_tool",
        "classifier_ece",
        # round 5, fifty-seventh wave: tool-chain mining, error recovery,
        # citation grounding.  Excluded from the r04 subtotal.
        "tool_chain_topk",
        "agent_error_recovery",
        "citation_url_check",
        # round 5, fifty-eighth wave: Q5 local-supplier volume, Q14 promo
        # share, canned-response audit.  Excluded from the r04 subtotal.
        "local_supplier_volume",
        "promo_revenue_share",
        "assistant_canned_responses",
        # round 5, fifty-ninth wave: Q7 volume shipping, Q10 returned-item
        # revenue, JSONL ingestion audit.  Excluded from the r04 subtotal.
        "volume_shipping_pairs",
        "returned_item_revenue",
        "jsonl_transcript_ingest",
        # round 5, sixtieth wave: Q8 market share, Q19 disjunctive revenue,
        # Q6 pushdown probe.  Excluded from the r04 subtotal.
        "nation_market_share",
        "disjunctive_part_revenue",
        "forecast_revenue_change",
        # round 5, sixty-first wave: PDF round-trip extraction (the north
        # rule's PDF/layout-parse clause).  Excluded from the r04 subtotal.
        "pdf_text_extract",
        "pdf_page_stats",
        # round 5, sixty-second wave: source concentration, distinct-n
        # diversity, cross-source dup matrix.  Excluded from the r04 subtotal.
        "source_concentration",
        "corpus_distinct_ngrams",
        "cross_source_dup_matrix",
        # round 5, sixty-third wave: TPC-H Q2/Q9/Q12 shapes.  Excluded
        # from the r04 subtotal.
        "min_cost_supplier",
        "product_type_profit",
        "shipment_priority_classes",
        # round 5, sixty-fourth wave: TPC-H Q11/Q16/Q20 shapes.  Excluded
        # from the r04 subtotal.
        "important_part_stock",
        "supplier_part_counts",
        "excess_stock_suppliers",
        # round 5, sixty-fifth wave: backoff LM, df spectrum, RI audit.
        # Excluded from the r04 subtotal.
        "trigram_backoff_score",
        "shingle_df_spectrum",
        "referential_integrity_audit",
        # round 5, sixty-sixth wave: hard-negative mining, tool output
        # stats.  Excluded from the r04 subtotal.
        "embedding_hard_negatives",
        "tool_output_stats",
        # round 5, sixty-seventh wave: ROUGE pair verification, robots
        # meta flags, TextRank keywords.  Excluded from the r04 subtotal.
        "rouge_overlap_pairs",
        "robots_meta_flags",
        "textrank_keywords",
        # round 5, sixty-eighth wave: robots.txt politeness, digest
        # birthday audit, label-noise flags.  Excluded from the r04
        # subtotal.
        "robots_txt_frontier_filter",
        "digest_collision_audit",
        "label_noise_flags",
        # round 5, sixty-ninth wave: MLM masking plan, HLL pairwise
        # intersections, tool runtime stats.  Excluded from the r04
        # subtotal.
        "mlm_masking_plan",
        "hll_intersection_estimate",
        "tool_runtime_stats",
        # round 5, seventieth wave: triangle counts, burstiness,
        # canonical agreement.  Excluded from the r04 subtotal.
        "host_triangle_counts",
        "term_burstiness",
        "canonical_content_agreement",
        # round 5, seventy-first wave: 1-bit minhash, split balance,
        # length bias.  Excluded from the r04 subtotal.
        "bbit_minhash_estimate",
        "split_balance_audit",
        "quality_length_bias",
        # round 5, waves 72-76 (this session): market-basket affinity,
        # centroid separation, Wilson CI, dup-graph degrees, dow
        # seasonality, RFM, crawl budget, revision distance, reorder
        # cadence, latency anomalies, fulfillment lag, norm outliers,
        # language confusion, band occupancy, context growth.  Excluded
        # from the r04 subtotal.
        "part_affinity_lift",
        "label_centroid_similarity",
        "quality_wilson_ci",
        "dup_graph_degree_stats",
        "event_dow_seasonality",
        "customer_rfm_scores",
        "host_crawl_budget",
        "turn_revision_distance",
        "order_reorder_interval",
        "tool_latency_anomaly",
        "supplier_fulfillment_lag",
        "embedding_norm_outliers",
        "doc_language_confusion",
        "minhash_band_occupancy",
        "conversation_context_growth",
        # round 5, seventy-seventh wave: storage-layout planning
        # (postings varint sizing, zone-map pruning, encoding choice).
        # Excluded from the r04 subtotal.
        "postings_compression_estimate",
        "zonemap_pruning_estimate",
        "column_dictionary_stats",
        # round 5, seventy-eighth wave: LPA communities, NN-descent
        # round, Brier decomposition.  Excluded from the r04 subtotal.
        "host_label_propagation",
        "knn_graph_nndescent",
        "brier_decomposition",
        # round 5, seventy-ninth wave: shard manifests, k-anonymity,
        # watermark lateness.  Excluded from the r04 subtotal.
        "shard_integrity_manifest",
        "k_anonymity_audit",
        "late_event_watermark_audit",
        # round 5, eightieth wave: chrF pairs, join cardinality audit,
        # KM reorder survival.  Excluded from the r04 subtotal.
        "chrf_pair_scores",
        "join_cardinality_estimate",
        "kaplan_meier_retention",
        # round 5, eighty-first wave: z-order layout, Neyman allocation,
        # seasonal decomposition.  Excluded from the r04 subtotal.
        "zorder_layout_plan",
        "neyman_allocation_plan",
        "event_seasonal_decompose",
        # round 5, eighty-second wave: vocab front coding, salt plan,
        # Markov stationary.  Excluded from the r04 subtotal.
        "vocab_front_coding_estimate",
        "skew_salt_plan",
        "session_markov_stationary",
        # round 5, eighty-third wave: URL templates, KS drift, BM25 PRF.
        # Excluded from the r04 subtotal.
        "url_template_mining",
        "ks_drift_test",
        "bm25_prf_expansion",
        # round 5, eighty-fourth wave: seeded pagerank, k-core, cluster
        # diameter.  Excluded from the r04 subtotal.
        "host_seeded_pagerank",
        "host_kcore_membership",
        "dedup_cluster_diameter",
        # round 5, eighty-fifth wave: sliding HLL, TextTiling, McNemar.
        # Excluded from the r04 subtotal.
        "sliding_hll_users",
        "texttiling_boundaries",
        "filter_mcnemar_test",
        # round 5, eighty-sixth wave: phrase search, Kendall tau,
        # trimmed stats.  Excluded from the r04 subtotal.
        "phrase_search",
        "ranking_kendall_tau",
        "source_trimmed_stats",
        # round 5, eighty-seventh wave: BPE stability, survivor bias,
        # hourly ACF.  Excluded from the r04 subtotal.
        "bpe_merge_stability",
        "dedup_survivor_bias",
        "event_hourly_autocorrelation",
        # round 5, eighty-eighth wave: kappa, threshold sweep, topic
        # shifts.  Excluded from the r04 subtotal.
        "filter_cohen_kappa",
        "dedup_threshold_sweep",
        "conversation_topic_shift",
        # round 5, eighty-ninth wave: quant recall curve, assortativity,
        # effect size.  Excluded from the r04 subtotal.
        "embedding_quant_recall_curve",
        "host_degree_assortativity",
        "role_length_effect_size",
        # round 5, ninetieth wave: shuffle runs test, overdispersion,
        # embedding MMD.  Excluded from the r04 subtotal.
        "shuffle_runs_test",
        "event_overdispersion",
        "embedding_mmd_poly",
        # round 5, ninety-first wave: filtered ANN, incremental merge,
        # vocab overlap.  Excluded from the r04 subtotal.
        "ann_filtered_topk",
        "dedup_incremental_merge",
        "source_vocab_overlap",
        # round 5, ninety-second wave: kNN label agreement, temperature
        # sweep, k-center coreset.  Excluded from the r04 subtotal.
        "knn_label_agreement",
        "mix_temperature_sweep",
        "coreset_kcenter",
        # round 5, ninety-third wave: Benford audit, revenue Gini.
        # Excluded from the r04 subtotal.
        "order_value_benford",
        "customer_revenue_gini",
    ):
        fn, _sql = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    _R5_NEW = (
        "bpe_tokenize_ids",
        "pack_token_ids",
        "doc_quality_classifier",
        "bm25_search_topk",
        "dedup_bloom_membership",
        "gopher_quality_filters",
        "dsir_importance_weights",
        "dedup_containment",
        "pmi_collocations",
        "source_overlap_minhash",
        "ccnet_perplexity_buckets",
        "source_token_kl",
        "domain_cap_sample",
        "doclen_quantile_sketch",
        "semdedup",
        "doc_ngram_novelty",
        "split_leakage_check",
        "ann_pq_adc_topk",
        "ann_ivf_pq_topk",
        "unimax_allocation",
        "extract_c4_filters",
        "tfidf_top_terms",
        "token_zipf_fit",
        "doc_unigram_entropy",
        "kmeans_silhouette",
        "lm_perplexity_heldout",
        "extract_repetition_filters",
        "ann_ivfpq_rerank_topk",
        "transcript_conversation_stats",
        "small_quantity_revenue",
        "dedup_cluster_stats",
        "corpus_datacard",
        "extract_outlinks",
        "outlink_host_indegree",
        "outlink_host_pagerank",
        "extract_url_normalize",
        "anchor_text_terms",
        "crawl_frontier_topk",
        "dedup_sentence_spans",
        "mix_temperature_weights",
        "url_blocklist_filter",
        "doc_chunk_windows",
        "sft_context_windows",
        "dedup_prefixfilter_pairs",
        "dedup_editdistance_pairs",
        "conversation_dedup",
        "role_transition_stats",
        "turn_reply_latency",
        "agent_loop_detect",
        "embedding_scalar_quantize",
        "ann_recall_eval",
        "quality_calibration_bins",
        "tokenizer_fertility",
        "minhash_estimate_error",
        "corpus_snapshot_delta",
        "boilerplate_line_filter",
        "tool_call_stats",
        "length_group_batching",
        "turn_html_stats",
        "transcript_integrity_check",
        "token_coverage_vocab_size",
        "kmeans_outlier_flags",
        "mojibake_detect",
        "training_shuffle_plan",
        "license_notice_scan",
        "unicode_normalize_stats",
        "weighted_sample_aes",
        "dedup_soft_weights",
        "synthetic_text_flags",
        "eval_pass_at_k",
        "group_advantage_normalize",
        "grounding_overlap_score",
        "contrastive_pair_mining",
        "fim_span_plan",
        "shared_prefix_stats",
        "ocr_garbage_detect",
        "instruction_complexity",
        "special_token_leakage",
        "chat_template_render",
        "loss_mask_spans",
        "kmeans_cluster_purity",
        "packing_attention_spans",
        "shard_size_plan",
        "time_split_assign",
        "refusal_rate_scan",
        "search_mrr_eval",
        "lexical_diversity",
        "code_detect",
        "markdown_structure_stats",
        "readability_scores",
        "pii_luhn_scan",
        "toxicity_wordlist_scan",
        "heaps_law_fit",
        "source_keyness",
        "assistant_verbosity_trend",
        "embedding_pca_power",
        "context_budget_plan",
        "truncation_artifact_detect",
        "prompt_injection_scan",
        "cot_structure_detect",
        "sft_prompt_conflicts",
        "trajectory_success_filter",
        "late_shipment_orders",
        "sft_split_prompt_leakage",
        "agent_loop_neardup",
        "conversation_split_assign",
        "bpe_roundtrip_check",
        "minhash_lsh_param_plan",
        "dup_ngram_topk",
        "hybrid_rrf_fusion",
        "preference_pair_mining",
        "tool_output_collapse",
        "dedup_index_lookup",
        "filter_agreement_matrix",
        "partition_skew_audit",
        "cdc_chunk_dedup",
        "customer_order_distribution",
        "rake_keywords",
        "outlink_host_hits",
        "idle_customer_balance",
        "span_corruption_plan",
        "top_supplier_revenue",
        "bradley_terry_strength",
        "embedding_dim_truncation",
        "event_funnel",
        "retention_cohorts",
        "negative_sampling_plan",
        "large_volume_orders",
        "sole_late_supplier",
        "outlink_host_components",
        "extract_title_collisions",
        "data_profile_orders",
        "uncertainty_sample_topk",
        "ndcg_eval",
        "event_rate_anomaly",
        "preference_length_bias",
        "bootstrap_mean_ci",
        "tool_error_rate_by_tool",
        "classifier_ece",
        "tool_chain_topk",
        "agent_error_recovery",
        "citation_url_check",
        "local_supplier_volume",
        "promo_revenue_share",
        "assistant_canned_responses",
        "volume_shipping_pairs",
        "returned_item_revenue",
        "jsonl_transcript_ingest",
        "nation_market_share",
        "disjunctive_part_revenue",
        "forecast_revenue_change",
        "pdf_text_extract",
        "pdf_page_stats",
        "source_concentration",
        "corpus_distinct_ngrams",
        "cross_source_dup_matrix",
        "min_cost_supplier",
        "product_type_profit",
        "shipment_priority_classes",
        "important_part_stock",
        "supplier_part_counts",
        "excess_stock_suppliers",
        "trigram_backoff_score",
        "shingle_df_spectrum",
        "referential_integrity_audit",
        "embedding_hard_negatives",
        "tool_output_stats",
        "rouge_overlap_pairs",
        "robots_meta_flags",
        "textrank_keywords",
        "robots_txt_frontier_filter",
        "digest_collision_audit",
        "label_noise_flags",
        "mlm_masking_plan",
        "hll_intersection_estimate",
        "tool_runtime_stats",
        "host_triangle_counts",
        "term_burstiness",
        "canonical_content_agreement",
        "bbit_minhash_estimate",
        "split_balance_audit",
        "quality_length_bias",
        "part_affinity_lift",
        "label_centroid_similarity",
        "quality_wilson_ci",
        "dup_graph_degree_stats",
        "event_dow_seasonality",
        "customer_rfm_scores",
        "host_crawl_budget",
        "turn_revision_distance",
        "order_reorder_interval",
        "tool_latency_anomaly",
        "supplier_fulfillment_lag",
        "embedding_norm_outliers",
        "doc_language_confusion",
        "minhash_band_occupancy",
        "conversation_context_growth",
        "postings_compression_estimate",
        "zonemap_pruning_estimate",
        "column_dictionary_stats",
        "host_label_propagation",
        "knn_graph_nndescent",
        "brier_decomposition",
        "shard_integrity_manifest",
        "k_anonymity_audit",
        "late_event_watermark_audit",
        "chrf_pair_scores",
        "join_cardinality_estimate",
        "kaplan_meier_retention",
        "zorder_layout_plan",
        "neyman_allocation_plan",
        "event_seasonal_decompose",
        "vocab_front_coding_estimate",
        "skew_salt_plan",
        "session_markov_stationary",
        "url_template_mining",
        "ks_drift_test",
        "bm25_prf_expansion",
        "host_seeded_pagerank",
        "host_kcore_membership",
        "dedup_cluster_diameter",
        "sliding_hll_users",
        "texttiling_boundaries",
        "filter_mcnemar_test",
        "phrase_search",
        "ranking_kendall_tau",
        "source_trimmed_stats",
        "bpe_merge_stability",
        "dedup_survivor_bias",
        "event_hourly_autocorrelation",
        "filter_cohen_kappa",
        "dedup_threshold_sweep",
        "conversation_topic_shift",
        "embedding_quant_recall_curve",
        "host_degree_assortativity",
        "role_length_effect_size",
        "shuffle_runs_test",
        "event_overdispersion",
        "embedding_mmd_poly",
        "ann_filtered_topk",
        "dedup_incremental_merge",
        "source_vocab_overlap",
        "knn_label_agreement",
        "mix_temperature_sweep",
        "coreset_kcenter",
        "order_value_benford",
        "customer_revenue_gini",
    )
    extra["total_r04_comparable"] = round(
        sum(v for k, v in timings.items() if k not in _R5_NEW), 3
    )
    spark.stop()

    # Post-run capacity probes; the index is the mean of pre/post so a
    # capacity shift MID-run is averaged rather than attributed to the code.
    probe_post = round(cpy_probe(), 4)
    node_post = node_probe()
    cap_idx = round(PROBE_NOMINAL_SEC / ((probe_pre + probe_post) / 2), 3)
    extra["capacity"] = {
        "cpy_probe_sec": [probe_pre, probe_post],
        "capacity_index": cap_idx,
        "probe_nominal_sec": PROBE_NOMINAL_SEC,
        "node_probe_docs_per_sec": [node_pre, node_post],
    }
    extra["turns_per_sec_normalized"] = round(extra["turns_per_sec"] / cap_idx, 2)
    extra["turns_per_sec_dedup_normalized"] = round(
        extra["turns_per_sec_dedup"] / cap_idx, 2
    )

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
