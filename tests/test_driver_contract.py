"""Driver-contract regression: __spark_entry__ must work when the driver
process is launched from OUTSIDE the repo (executor Python workers import
the package via the runtime-shipped zip, not the driver's cwd)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "%s/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
assert len(mod.queries()) == len(mod.oracle_sql()) >= 30
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("driver-contract")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n = mod.entry(spark).count()
assert n > 0, n
m = mod.queries()["extract_status_counts"](spark, "/root/testdata/sf0.01").count()
assert m >= 2, m
spark.stop()
print("DRIVER_CONTRACT_OK")
""" % REPO


def test_entry_from_foreign_cwd(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", CODE],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "DRIVER_CONTRACT_OK" in out.stdout, out.stderr[-3000:]


# The driver's external correctness harness checks only the FIRST ~50
# registry entries, so dict insertion order is a load-bearing contract
# (ADVICE round 4): pin the window membership so accidental insertions or
# reorders fail loudly.  Update this list ONLY together with a deliberate
# rotation (see the registry-order note atop QUERIES in queries.py).
DRIVER_WINDOW_50 = [
    "extract_fixture_turns", "extract_status_counts", "readerable_flags",
    "extraction_lineage", "turn_ordering_check", "html_gate_selectivity",
    "bpe_tokenize_ids",
    "pack_token_ids", "doc_quality_classifier",
    "dedup_minhash_clusters",
    "extract_repetition_filters", "ann_ivfpq_rerank_topk",
    # sixth (final) rotation: novel-code-path waves-25-28 operators in
    # for first-round driver attestation
    "embedding_scalar_quantize", "boilerplate_line_filter",
    "length_group_batching", "turn_html_stats",
    "transcript_integrity_check", "corpus_snapshot_delta",
    "semdedup", "doc_ngram_novelty", "split_leakage_check",
    "ann_pq_codes",
    "dedup_exact_substring", "dedup_minhash_keep_best",
    "inverted_index_postings", "bm25_search_topk", "dedup_bloom_membership",
    "gopher_quality_filters", "dsir_importance_weights", "dedup_containment",
    "dedup_cluster_stats", "corpus_datacard",
    "extract_outlinks", "outlink_host_indegree", "outlink_host_pagerank",
    "extract_url_normalize", "anchor_text_terms", "crawl_frontier_topk",
    "ccnet_keep_policy", "dedup_sentence_spans", "mix_temperature_weights",
    "url_blocklist_filter", "doc_chunk_windows", "sft_context_windows",
    "dedup_prefixfilter_pairs", "dedup_editdistance_pairs",
    "conversation_dedup", "role_transition_stats", "turn_reply_latency",
    "agent_loop_detect",
]


def test_registry_window_pinned():
    from readability_1_spark.queries import QUERIES

    names = list(QUERIES)
    assert names[:50] == DRIVER_WINDOW_50, (
        "first-50 registry window changed - if this is a deliberate "
        "rotation, update DRIVER_WINDOW_50 and regenerate "
        "CORRECTNESS_LOCAL.json; otherwise move the new entry past "
        "position 50"
    )
    # every registered query has an oracle twin slot (None = rows-only)
    assert all(isinstance(v, tuple) and len(v) == 2 for v in QUERIES.values())
