"""Per-query physical-plan audit: for every registered query, count the
plan's exchanges / broadcasts / sort-merge joins / cartesian products and
pair them with a hand-written 100 TB scale classification.

Writes BENCH/SCALE_AUDIT.md.  Run: python3 tools/gen_scale_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

# Hand-written scale classes (audited, not generated):
#   linear      — one pass / map-side work, shuffles keyed on high-cardinality cols
#   shuffle     — O(n) with k shuffles, no quadratic term
#   broadcast   — big side linear, small side broadcast (bounded)
#   bucketed    — candidate generation bounded by bucket sizes (tunable)
#   baseline    — exact small-scale validation twin of a bucketed variant
SCALE_CLASS = {
    "extract_fixture_turns": ("shuffle", "salt scatter -> Arrow kernel; kernel cost dominates"),
    "extract_status_counts": ("shuffle", "kernel + tiny status rollup"),
    "extract_paragraph_dedup": ("shuffle", "kernel -> posexplode (linear) -> first-occurrence window hashed on paragraph digest -> turn rollup; the para-key shuffle is the one corpus-wide exchange"),
    "readerable_flags": ("shuffle", "kernel gate only"),
    "extraction_lineage": ("shuffle", "kernel + part_id rollup (map-side combine)"),
    "turn_ordering_check": ("shuffle", "one window partition per conv_id"),
    "html_gate_selectivity": ("linear", "pushdown filter + rollup"),
    "q1_pricing_summary": ("linear", "scan + partial agg + 6-group exchange"),
    "top_revenue_orders": ("broadcast", "dim broadcast + TakeOrderedAndProject"),
    "nation_revenue": ("broadcast", "two dim broadcasts, fact stays put"),
    "order_priority_rank": ("shuffle", "window per priority group"),
    "events_user_stats": ("shuffle", "one groupBy(user_id)"),
    "events_sessionize": ("shuffle", "one window partition per user_id"),
    "events_asof_orders": ("shuffle", "union + last-over-window, no range cross"),
    "value_band_range_join": ("broadcast", "range join as bucketed equi-join"),
    "revenue_rollup": ("linear", "ROLLUP = 3 grouping sets, partial agg"),
    "revenue_cube": ("linear", "CUBE = 4 grouping sets, partial agg"),
    "events_set_ops": ("shuffle", "two distinct shuffles on user_id"),
    "big_spender_exists": ("broadcast", "EXISTS as left-semi on filtered side"),
    "events_resample_hourly": ("shuffle", "date_trunc groupBy"),
    "customers_without_orders": ("broadcast", "left-anti join"),
    "events_pivot": ("shuffle", "pivot with fixed column set"),
    "lineitem_percentiles": ("shuffle", "exact percentile per 3 groups (bounded groups)"),
    "dedup_exact": ("shuffle", "hash groupBy on digest"),
    "dedup_exact_normalized": ("shuffle", "hash groupBy on fingerprint"),
    "dedup_ngram_jaccard": ("baseline", "quadratic shingle self-join; sf<=0.1 validation twin of minhash LSH"),
    "dedup_minhash_lsh": ("bucketed", "single signature scan, bucket-group-and-pair"),
    "dedup_minhash_clusters": ("bucketed", "LSH pairs + large-star/small-star CC (O(log n) rounds, diameter-independent), checkpointed per round"),
    "dedup_simhash": ("shuffle", "token agg then 16 codegen bit sums"),
    "dedup_embedding_cosine": ("baseline", "all-pairs; validation twin of dedup_embedding_lsh"),
    "dedup_embedding_lsh": ("bucketed", "bucket equi-join; bit count scales with corpus"),
    "dedup_embedding_clusters": ("bucketed", "LSH pairs + large-star/small-star CC (O(log n) rounds, diameter-independent), checkpointed per round"),
    "doc_fingerprint": ("shuffle", "rolling-hash fold + fingerprint group sizes"),
    "doc_winnow_fingerprints": ("linear", "per-row array expressions only"),
    "token_cms_heavy_hitters": ("linear", "fixed 256-cell sketch, map-side combine"),
    "text_redact_pii": ("linear", "regex expressions per row"),
    "doc_repetition": ("shuffle", "per-doc shingle counts"),
    "benchmark_contamination": ("broadcast", "benchmark shingle set broadcast"),
    "text_quality": ("linear", "per-row expressions"),
    "token_counts": ("linear", "per-row expressions"),
    "lang_id": ("linear", "per-row expressions"),
    "extract_quality_filter": ("shuffle", "kernel + per-row gates"),
    "multimodal_binary_stats": ("linear", "binary column expressions"),
    "embedding_norms": ("linear", "per-row array fold"),
    "ann_cosine_topk": ("broadcast", "K queries broadcast; partial top-k before exchange"),
    "ann_lsh_bucketed": ("linear", "bucket id per row + histogram"),
    "ann_lsh_topk": ("bucketed", "multi-probe bucket equi-join; probes multiply only the query side"),
    "ann_ivf_assign": ("broadcast", "centroid set broadcast, codegen assignment"),
    "ann_ivf_probe": ("broadcast", "probe lists only (centroid equi-join)"),
    "dedup_simhash_pairs": ("bucketed", "nibble-band equi-join candidates + exact Hamming re-check; widen fingerprint at scale"),
    "ann_ivf_kmeans": ("broadcast", "Lloyd iterations: centroid broadcast assignment + (centroid,dim) groupBy update; checkpointed per iteration"),
    "events_rolling_stats": ("shuffle", "one user_id exchange serves all three window frames"),
    "events_json_props": ("linear", "JVM-side JSON extraction + small-cardinality rollup"),
    "bpe_learn_merges": ("shuffle", "iterates over the DISTINCT-word table (tiny vs corpus); pair groupBy with map-side combine, 1-row winner broadcast, checkpointed state"),
    "bpe_tokenize_stats": ("shuffle", "segmentation computed once per distinct word, joined back on the word key; corpus side does one hash join"),
    "corpus_sample_stratified": ("broadcast", "O(#languages) rate map broadcast; content-hash keep filter, no shuffle"),
    "corpus_sample_topn": ("linear", "TakeOrdered: per-partition top-N, single N-row driver merge, no global sort"),
    "doc_lm_score": ("shuffle", "bigram/history count groupBys (map-side combine) + two equi-joins; vocab is a 1-row broadcast"),
    "doc_quality_rank": ("shuffle", "LM-score subplan + one lang-partitioned window (5 partitions; percentile per language)"),
    "distinct_hll_estimate": ("linear", "2^p-register sketch (default p=11, 2048): shuffle carries <=2048 rows per mapper regardless of corpus size (truth column is validation-only)"),
    "hll_merge_by_source": ("linear", "per-source registers (2048 x #sources rows) then bucket-max merge; mergeability = free global rollup"),
    "data_split_assign": ("linear", "content-hash bucket, zero shuffles"),
    "domain_mix_resample": ("broadcast", "O(#sources) weight map broadcast + linear explode"),
    "sequence_packing": ("shuffle", "one shard shuffle, then linear per-shard pandas pass; fill_ratio via one window over (shard, pack_id)"),
    "sequence_packing_ffd": ("shuffle", "token-desc first-fit within shard: same one-shuffle shape; open-pack scan bounded by packs-per-shard"),
    "sequence_packing_stats": ("shuffle", "two packing subplans + 1-row aggregates; comparison output is O(#variants)"),
    "bpe_tokenize_ids": ("shuffle", "per-distinct-word id segmentation (vocab-sized) hash-joined to positional occurrences; per-doc order restored JVM-side (array_sort), one doc_id exchange"),
    "pack_token_ids": ("shuffle", "two-pass distributed prefix sum (range partition + per-partition window, one bounded driver collect of per-partition totals) -> linear posexplode -> one seq_id exchange; no global single-partition window"),
    "doc_quality_classifier": ("shuffle", "feature scan is linear JVM expressions; each training iteration is ONE aggregation job with map-side combine (21 sums); scoring pass linear"),
    "dedup_exact_substring": ("shuffle", "one wide exchange on the 16-hex window hash (projected before the exchange), per-key rank window; coverage explode bounded by K x dup windows; rebuild is per-doc array filter"),
    "dedup_minhash_keep_best": ("bucketed", "minhash pairs + CC as dedup_minhash_clusters, then ONE ranking window per cluster_id (already the partitioning key)"),
    "inverted_index_postings": ("shuffle", "(tok,doc) pre-agg with map-side combine, then per-tok rollup; posting prefix rank-filtered BEFORE collect so per-token state is cap-bounded"),
    "bm25_search_topk": ("shuffle", "per-(tok,doc) tf + per-doc length are linear map-side-combine aggs; 8-row query-term table BROADCAST so candidates come only from query-term postings (no per-query corpus scan); term pick is TakeOrdered, not a vocab-wide window; per-query ranking window over candidates only"),
    "dedup_bloom_membership": ("bucketed", "set-bit table bounded by BLOOM_BITS rows regardless of prior-corpus size -> broadcast equi-join on bit position + per-doc rollup; prior corpus never shuffled against the new slice; exact actual_dup twin is a linear digest join kept for FP attestation"),
    "gopher_quality_filters": ("linear", "single projection over the scan - every Gopher stat is a JVM-side array/regexp expression on the doc's own text; no explode, no join, no shuffle; whole-stage codegen"),
    "dsir_importance_weights": ("broadcast", "feature explode collapses to (doc_id, bucket, k) with map-side combine; both count tables bounded by DSIR_BUCKETS rows regardless of corpus size -> broadcast equi-joins + 1-row totals broadcast; corpus shuffled once on (doc_id, bucket)"),
    "dedup_containment": ("bucketed", "candidates only from RARE shingles (df <= CONTAIN_DF_CAP) so per-shingle self-join groups are cap-bounded, never the hot-key quadratic blowup; exact two-direction containment via postings equi-joins restricted to candidate pairs; sizes = per-doc agg with map-side combine"),
    "pmi_collocations": ("shuffle", "unigram/bigram counts = groupBy aggs with map-side combine over one scan each; MIN_COUNT filter shrinks the bigram table before the unigram hash joins; totals are a 1-row broadcast; top-K is TakeOrdered (per-partition heap + K-row driver merge), no global sort"),
    "ccnet_perplexity_buckets": ("shuffle", "doc_lm_score subplan (count-table equi-joins, map-side combine) + ONE ntile window partitioned by source; sources = crawl snapshots (dozens at 100 TB), each slice ranked in parallel like every CCNet shard"),
    "source_token_kl": ("shuffle", "scan collapses to (source, word, k) with map-side combine; corpus count table is vocab-sized and equi-joins per word (never broadcast-assumed); totals 1-row broadcast; per-word log-ratios round-6 BEFORE the weighted sum; output |sources| rows"),
    "domain_cap_sample": ("shuffle", "one row_number window partitioned by source (single shuffle on the domain key, streaming rank, <= CAP rows emitted per group); megadomain skew is bounded by the cap itself"),
    "doclen_quantile_sketch": ("shuffle", "scan collapses to (source, bucket, cnt) with map-side combine - at most 4x64 integer log-buckets per source regardless of corpus size; quantile read-out is one window over that bounded table; all-integer bucket math (no log2 ulp risk)"),
    "source_overlap_minhash": ("broadcast", "each shingle md5-hashed ONCE (32-bit base), all 64 min-hashes are cheap affine permutations as aggregate expressions in ONE groupBy(source) with map-side partial min (shuffle carries #sources x 64 partials per mapper, never shingles x 64); signature table is #sources rows (snapshots = dozens at 100 TB) so pairing is a broadcast nested-loop over a bounded table"),
    "semdedup": ("bucketed", "kmeans assignment = broadcast centroids (no corpus shuffle); the pair stage is ONE equi-join on centroid_id whose products are bounded by cluster size - k grows with the corpus so clusters stay bounded, the published algorithm's own contract (clustering exists to avoid the corpus-wide quadratic)"),
    "doc_ngram_novelty": ("shuffle", "distinct shingle explode, ONE groupBy(shingle) min-aggregate with map-side combine, one equi-join back on shingle, one groupBy(doc) - linear, two shuffles, no windows"),
    "split_leakage_check": ("shuffle", "train shingle set too large to broadcast at 100 TB -> membership is ONE shuffle equi-join on shingle (dedup_bloom_membership is the constant-memory approximate alternative); per-doc rollup with map-side combine; eval side is 2% of the corpus by the split itself"),
    "ann_pq_codes": ("broadcast", "all PQ_M codebooks train TOGETHER in one long-format frame keyed by subspace - PQ_ITERS Spark jobs total, not PQ_M x PQ_ITERS; per iteration one broadcast equi-join on s (PQ_M x PQ_K codewords) + one grouped average with map-side combine, bounded lineage via localCheckpoint; no corpus shuffle anywhere"),
    "ann_pq_adc_topk": ("broadcast", "distance table is PQ_NQ x PQ_M x PQ_K rows (broadcast); codes join it by (subspace, code) equi-join; one groupBy(query, vec) sums exactly PQ_M terms with map-side combine; per-query ranking window over candidates only; IVF restriction shrinks the scan side to probed lists"),
    "ann_ivf_pq_topk": ("bucketed", "FAISS IVFPQ search shape: coarse assignment + query probing are broadcasts of the tiny centroid set; candidates from ONE equi-join on centroid_id (list-bounded products = partition pruning at scale); ADC is the broadcast distance-table join restricted to candidates"),
    "unimax_allocation": ("linear", "per-language token totals = one linear groupBy with map-side combine; the waterfill is O(#languages) sequential by construction and runs driver-side over the collected language table (dozens of rows at 100 TB - same bounded-collect discipline as the BPE trainer); result re-joined as a broadcast"),
    "ccnet_keep_policy": ("shuffle", "the bucket subplan's cost (doc_lm_score count-table joins + one per-source window); the keep policy itself is a pure salted-hash row expression, zero additional shuffles"),
    "embedding_random_projection": ("linear", "pure zero-shuffle projection: one scan, each output value a codegen'd fold over the row's own array; the 16x64 sign matrix is a compile-time literal on both engines (md5-parity, no trained state)"),
    "extract_c4_filters": ("shuffle", "the extraction kernel dominates (salt scatter -> Arrow kernel); the C4 battery itself is one projection of JVM-side array/regexp expressions per row - no explode, no join, no added shuffle"),
    "tfidf_top_terms": ("shuffle", "token explode collapses to the (doc, tok) count table with map-side combine; df is a vocab rollup of that table; N is a 1-row broadcast; doc_len and top-K share ONE doc_id window partitioning - linear, two key shuffles"),
    "token_zipf_fit": ("shuffle", "corpus side is one token-count rollup with map-side combine; the rank window runs over the VOCAB-sized frequency table (single partition, bounded further by ZIPF_MAX_RANK for the fit); regression sums are exact integers so the 1-row reduce is order-free"),
    "doc_unigram_entropy": ("shuffle", "token explode collapses to the (doc, tok) count table with map-side combine; ONE doc_id window partitioning serves length + rollup; integer micro-nat terms make per-doc sums order-free; left join back on the doc key - linear"),
    "kmeans_silhouette": ("broadcast", "training is the kmeans loop (broadcast assignment + map-side-combine updates, checkpointed); scoring is ONE broadcast crossJoin of K centroid rows + ONE vec_id window (a and b from the same rank window via lead) - no corpus-vs-corpus join"),
    "lm_perplexity_heldout": ("shuffle", "doc_lm_score's shape with the count tables restricted to the train split: collapsed (split, doc, bigram, k) table materialized once feeding train counts AND scoring; LEFT equi-joins keep OOV rows; 1-row vocab broadcast; final rollup is 3 groups"),
"extract_repetition_filters": ("shuffle", "kernel output materialized ONCE (localCheckpoint - feeds line and both n-gram paths); each path is explode -> groupBy(turn, key) with map-side combine -> per-turn rollup; joins on the turn key - linear"),
    "ann_ivfpq_rerank_topk": ("bucketed", "stage 1 is ann_ivf_pq_topk unchanged (centroid_id partition pruning + broadcast ADC); the exact re-rank touches nq x IVFPQ_TOPK candidate rows only - vec_id equi-join for raw vectors, tiny query broadcast, one window over nq partitions"),
    "transcript_conversation_stats": ("shuffle", "ONE groupBy(conv_id) with map-side combine over pure JVM row expressions - a single key shuffle at any corpus size"),
    "small_quantity_revenue": ("shuffle", "TPC-H Q17 decorrelation: per-part average = one groupBy(partkey) with map-side combine over the brand-filtered slice; join back is a partkey equi-join; brand filter pushes to both scans; 1-row final aggregate"),
    "dedup_cluster_stats": ("bucketed", "the cluster subplan is q_dedup_minhash_clusters unchanged (checkpointed pairs + star-round CC); the histogram adds two tiny groupBys (cluster_id, then cluster_size) with map-side combine"),
    "corpus_datacard": ("shuffle", "one narrow per-doc pass into the source rollup (map-side combine), one (source, lang) count, ONE token explode collapsing to distinct (source, tok) - the only corpus-heavy stage (hll_merge_by_source is the sketch drop-in at 100 TB); joins on the O(#sources) key"),
    "extract_outlinks": ("linear", "the extraction kernel dominates; the link stats are one projection of JVM-side regexp/array expressions per row - no explode, no join, no added shuffle (plan-gated zero-exchange after the kernel)"),
    "outlink_host_indegree": ("shuffle", "one explode (linear in links) into a host groupBy with map-side combine; top-K is TakeOrdered (per-partition heap + K-row driver merge), no global sort"),
    "outlink_host_pagerank": ("bucketed", "pair generation self-joins on the TURN key (bounded by per-page host-set size, never corpus-quadratic); each of the 10 iterations is ONE equi-join on src + ONE dst groupBy with map-side combine over the HOST table (orders of magnitude smaller than pages); dangling mass is a 1-row broadcast; per-iteration localCheckpoint bounds lineage; all-BIGINT floor-div arithmetic is summation-order-free"),
    "extract_url_normalize": ("linear", "zero-exchange scan projection after the kernel: every stat is an in-row array expression (canonicalize + array_distinct within the row)"),
    "anchor_text_terms": ("shuffle", "in-row regexp pair extraction (href + anchor text zipped positionally), one explode into a (host, term) groupBy with map-side combine, ONE host-partitioned rank window - the tfidf_top_terms two-exchange budget"),
    "crawl_frontier_topk": ("bucketed", "kernel output checkpointed ONCE feeds the URL explode AND the PageRank subplan (shared-subplan discipline); priority join is on the HOST key against the host-sized rank table; top-K is TakeOrdered, no global sort"),
    "dedup_sentence_spans": ("shuffle", "sentence extract-all + sliding 3-span window are in-row; ONE corpus-wide shuffle on the span digest (first-occurrence window - how a production span dedup shards) + the turn-key rollup"),
    "mix_temperature_weights": ("linear", "one (source) groupBy with map-side combine; weight table is O(#sources); totals are a 1-row broadcast; sqrt is IEEE-correctly-rounded so the integer micro-unit masses are bit-deterministic"),
    "url_blocklist_filter": ("shuffle", "the frontier's distinct-canonical-URL shuffle (already paid to form the frontier); suffix + bad-word checks are in-row scan projections; at UT1 scale (~4M domains) the suffix list becomes a broadcast join on the reversed-host prefix, verdict logic unchanged"),
    "doc_chunk_windows": ("linear", "pure in-row array expressions (split, sequence, slice, md5) - a zero-exchange linear scan; output rows ~ n_tokens/stride per doc"),
    "sft_context_windows": ("shuffle", "one conv_id window for the prefix sums + one conv_id equi-join of assistant targets against turns with in-row inequality filters; per-target work bounded by conversation length (bounded entity, same contract as the kernel)"),
    "dedup_prefixfilter_pairs": ("bucketed", "AllPairs prefix filter: only the first sz-ceil(t*sz)+1 rarest-globally shingles per doc feed the candidate equi-join (~(1-t) of the shingle rows), and rarest-first ordering keeps per-shingle join groups near-singleton (hot boilerplate shingles sort last and rarely enter a prefix); exact verification is two postings equi-joins on candidates only; recall 1.0 by the prefix pigeonhole, no banding probability"),
    "dedup_editdistance_pairs": ("bucketed", "candidates are the minhash-LSH pairs (linear in corpus via banding, never all-pairs); the |len_a-len_b| <= EDIT_MAX lower-bound prefilter drops hopeless pairs before any DP; Spark's banded levenshtein caps per-pair work at O(len x EDIT_MAX) - constant-bounded per candidate"),
    "conversation_dedup": ("shuffle", "one conv_id groupBy whose collect_list state is bounded by conversation length (bounded entity, same contract as the kernel) + one digest-keyed window - two key shuffles, all-hex/integer rows"),
    "role_transition_stats": ("shuffle", "one conv_id window for lag (state = one row) + one (prev_role, role) groupBy with map-side combine + one window over the bounded-cardinality role-pair table"),
    "turn_reply_latency": ("linear", "ONE conv_id window, per-row state bounded by conversation length; no joins, integer output"),
    "agent_loop_detect": ("shuffle", "one (conv_id, digest) groupBy with map-side combine + one conv_id rollup + one conv_id left join for coverage rows - all shuffles on the conversation key"),
    "embedding_scalar_quantize": ("linear", "per-dim min/max ranges are ONE aggregation collapsing to a single 2xEMB_DIM-scalar row (map-side combine, bounded 1-row driver collect) re-broadcast as literals; the encode pass is a zero-shuffle linear projection of the corpus"),
    "ann_recall_eval": ("shuffle", "both inputs are per-query top-K tables (bounded K x Q rows; the expensive bucketed candidate work is audited on their own entries); the eval is one tiny (query_id, vec_id) equi-join + a per-query rollup"),
    "quality_calibration_bins": ("shuffle", "reuses the memoized classifier weights + checkpointed feature frame; binning is a zero-exchange projection over the scored frame and ONE 10-group aggregation with map-side combine (fixed-width bins, no global-order ntile window)"),
    "tokenizer_fertility": ("shuffle", "segmentation exists once per DISTINCT word (memoized vocab-bounded trainer state); the corpus-sized side is one hash join on the word key + one doc_id join for source, then a bounded per-source rollup with map-side combine"),
    "minhash_estimate_error": ("shuffle", "the shingle table is checkpointed ONCE and feeds signatures, candidate generation, and exact verification; exact Jaccard runs on CANDIDATES only via shingle equi-joins - never all pairs; signature compare is a per-pair row expression"),
    "corpus_snapshot_delta": ("shuffle", "ONE full outer equi-join on the doc key between two digest projections - linear in snapshot sizes, the Iceberg snapshot-diff shape; digests are in-row md5"),
    "boilerplate_line_filter": ("shuffle", "kernel output checkpointed ONCE feeds the line explode and the coverage join; line document-frequency is a digest-key groupBy with map-side combine; the boiler set joins back by digest equi-join; per-turn rollup shuffles on the turn key - all linear"),
    "tool_call_stats": ("shuffle", "ONE tool-key groupBy with map-side combine; the grand total is a 1-row bounded broadcast nested loop (same shape as the temperature-mix totals)"),
    "length_group_batching": ("shuffle", "one exchange on the (bucket, shard) key + a streaming rank window per key; LB_SHARDS bounds per-bucket worker width (raise it until a shard fits an executor at 100 TB; batches only need same-bucket members so sharding costs nothing in quality)"),
    "turn_html_stats": ("linear", "zero-exchange scan projection - every stat is one JVM-side regexp over the row's own text; the HTML-gate predicate pushes to the scan like the extraction pipeline's"),
    "transcript_integrity_check": ("shuffle", "one conv_id window (lag) + one conv_id groupBy - a single key exchange; everything else map-side"),
    "token_coverage_vocab_size": ("shuffle", "corpus collapses to a (token, count) table with map-side combine; ranking is a window over the VOCAB-sized table (bounded, the zipf-fit precedent); K thresholds and totals join as tiny broadcasts"),
    "kmeans_outlier_flags": ("shuffle", "assignment = broadcast K-row crossJoin + ONE vec_id window (the kmeans recipe's shape); outlier rank = ONE centroid_id window whose per-key width is the cluster size - the bound semdedup's pair stage already accepts; threshold is integer ceil, no second pass"),
    "agent_loop_neardup": ("shuffle", "one conv_id window (lag) + one conv_id groupBy + one conv_id coverage join; per-pair edit-distance DP is constant-bounded by the band and a length prefilter skips far pairs entirely"),
    "conversation_split_assign": ("linear", "zero-shuffle scan projection - the bucket is an in-row md5 polynomial of conv_id only, so all turns of a conversation land in one split by construction (no join needed to enforce it)"),
    "bpe_roundtrip_check": ("shuffle", "runs on the memoized trainer state - the VOCAB-sized distinct-word table - so cost is independent of corpus row count; the verdict is an in-row string expression"),
    "minhash_lsh_param_plan": ("bucketed", "signature/pair machinery identical to dedup_minhash_lsh (single shingle scan, bucket-group-and-pair); the planner's own aggregates run over a 5x99 constant grid and the CANDIDATE-bounded pair table; all arithmetic is integer micro-units so both engines agree bit-for-bit"),
    "dup_ngram_topk": ("shuffle", "one token-array scan explodes into an ngram groupBy with map-side combine; the top-K cut is TakeOrdered over the duplicated subset, never a vocab-wide window"),
    "hybrid_rrf_fusion": ("bucketed", "both retrieval legs are query-bounded broadcasts: lexical candidates come only from an equi-join on the 4 query docs' df-capped tokens (the BM25 candidate discipline - the df cap bounds per-token join groups), semantic candidates from broadcast query vectors; the df-capped token table is checkpointed once and feeds sizes, the query side and candidates; every ranking window partitions by query over candidate-bounded sets"),
    "preference_pair_mining": ("shuffle", "ONE conv_id groupBy (bounded per-conversation state) + two conv_id equi-joins back - every wide operation keys on conv_id, the corpus's natural partition key; the literal multi-turn fixture is a constant-size union"),
    "tool_output_collapse": ("shuffle", "one (conv_id, tool, digest) window + one conv_id groupBy + one conv_id coverage join - all keys carry bounded per-conversation state"),
    "dedup_index_lookup": ("bucketed", "signatures from ONE groupBy over the shingle scan (checkpointed - feeds bands on both sides AND the est re-check); the probe is a (band, sig) equi-join where the index side is exactly the sharded state an incremental system keeps; signature re-check joins candidates only - never batch x batch or a corpus self-join"),
    "filter_agreement_matrix": ("shuffle", "pure composition of three attested subtrees (gopher scan projection, memoized classifier features, LM count tables) joined on doc_id and collapsed to a <=8-cell rollup with map-side combine"),
    "partition_skew_audit": ("shuffle", "one (bucket, conv_id) groupBy with bounded per-conversation state + one bucket rollup over SKEW_BUCKETS rows; the grand total is a 1-row broadcast; empty buckets come from a constant range join"),
    "mojibake_detect": ("linear", "zero-exchange scan projection - every stat is a JVM-side length/replace substring-count identity or one bounded regexp over the row's own text; no shuffle anywhere"),
    "training_shuffle_plan": ("shuffle", "epoch fan-out is a 2-element array explode (map-side); the ONLY exchange is the (epoch, shard) partition for the slot window, whose groups are corpus/SHARDS-bounded and shrink as SHARDS scales with the cluster"),
    "license_notice_scan": ("linear", "zero-exchange scan projection - every flag is a lowercase + substring position scan of the row's own text; the HTML gate predicate pushes to the scan"),
    "unicode_normalize_stats": ("linear", "zero-exchange scan projection - every count is a JVM-side length/replace substring identity over the row's own text; no shuffle anywhere"),
    "weighted_sample_aes": ("linear", "one scan projection (in-row md5-polynomial key) + orderBy.limit compiling to TakeOrdered - per-partition top-K then a single K-row driver merge, never a global sort"),
    "dedup_soft_weights": ("shuffle", "one distinct-(doc_id, shingle) exchange + one shingle-keyed df count with map-side combine + one doc_id rollup over exact BIGINT micro-units + one doc_id left join - all linear in corpus size; df is a count, never a pair list, so no per-shingle blowup"),
    "synthetic_text_flags": ("linear", "zero-exchange scan projection - every count is a JVM-side lowercase + length/replace substring identity over the row's own text; no shuffle anywhere"),
    "eval_pass_at_k": ("shuffle", "ONE user-keyed count aggregation with map-side combine; the per-k estimator is in-row BIGINT product-ratio arithmetic on the n/c rollup (exact up to ~2M attempts per group at k<=3)"),
    "group_advantage_normalize": ("shuffle", "ONE (user_id, event_type) exchange shared by all three window aggregates; group state is bounded by rollouts-per-prompt (the natural RL batch shape); moments are exact BIGINT milli-unit sums so no summation-order drift"),
    "grounding_overlap_score": ("shuffle", "LINEAR gram stream: tokens explode once, the 8-token window id is an integer lead() fold over the per-turn token order (the naive per-window array slice is O(turn_len^2) - measured catastrophic on 100KB tool outputs on BOTH engines); wide ops are one per-turn window sort, one (conv_id, gram) first-evidence agg with map-side combine, one (conv_id, gram) equi-join - all conversation-keyed, no turn self-join"),
    "contrastive_pair_mining": ("bucketed", "chunking and anchor/positive pairing are IN-ROW on each doc's token array; the negative assignment is two map-side-combined aggregations over a 16-row bucket key space broadcast back; the head lookup is one doc_id equi-join"),
    "fim_span_plan": ("linear", "zero-exchange scan projection - every span field is in-row integer arithmetic on the row's own length and doc_id hash"),
    "shared_prefix_stats": ("shuffle", "one turn_idx=0 scan (predicate pushes to the parquet scan) + ONE digest-keyed aggregation with map-side combine; group state is two counters"),
    "ocr_garbage_detect": ("linear", "zero-exchange scan projection - every signal is a JVM-side regexp/length identity over the row's own text"),
    "instruction_complexity": ("linear", "zero-exchange scan projection over user turns - every count is a substring/regexp identity on the row's own text; integer score arithmetic only"),
    "special_token_leakage": ("linear", "zero-exchange scan projection - every count is a JVM-side length/replace substring identity over the row's own text"),
    "chat_template_render": ("shuffle", "ONE conv_id aggregation; per-group state is the conversation's own turns (the natural SFT unit of work); only the md5 digest and sizes leave the executors, never the rendered string"),
    "loss_mask_spans": ("shuffle", "ONE conv_id window (running sum of piece lengths in turn order); per-group state is the conversation's own turns; integer arithmetic only"),
    "kmeans_cluster_purity": ("bucketed", "assignment is the kmeans recipe's broadcast crossJoin (K rows) + ONE vec_id window; purity is one (cluster, label) count with map-side combine + one cluster-keyed majority window over <=|labels| rows per cluster"),
    "packing_attention_spans": ("shuffle", "reuses the pack pipeline (range-partition prefix sums, one seq_id exchange); the span construction is IN-ROW array arithmetic over each <=SEQ_LEN id array - no additional exchange"),
    "shard_size_plan": ("shuffle", "ONE source-keyed aggregation with map-side combine; plan arithmetic is in-row integer ceil-division on the per-source rollup"),
    "time_split_assign": ("linear", "one 1-row min/max aggregation broadcast back + an in-row integer banding comparison; no per-event shuffle (NTZ-safe timestampdiff from a literal epoch - no timezone dependence)"),
    "refusal_rate_scan": ("shuffle", "the flag is an in-row lowercase substring scan; the rollup is ONE conv_id aggregation with map-side combine"),
    "search_mrr_eval": ("bucketed", "the (tok, doc, tf) table aggregates once (map-side combine) and checkpoints; query docs via content-hash TakeOrdered; per-query terms rank inside the query doc's OWN token set; candidates only from postings of the <=QxT rare query terms (broadcast equi-join), never a per-query corpus scan; ranking windows per query over candidate-bounded sets"),
    "lexical_diversity": ("shuffle", "one token explode feeds ONE (doc_id, tok) count with map-side combine, then ONE doc_id rollup; all diversity ratios are in-row arithmetic on exact counts; the empty-doc join-back is broadcast"),
    "code_detect": ("linear", "zero-exchange scan projection - brace/semicolon/keyword counts are exact substring identities, indentation and camelCase are per-row line/regexp scans; the routing verdict is in-row boolean arithmetic"),
    "markdown_structure_stats": ("linear", "zero-exchange scan projection - header/table/quote lines via per-row line filters, fences via an exact substring identity, links via one regexp pass; the routing verdict is in-row"),
    "readability_scores": ("linear", "zero-exchange scan projection - words/sentence-runs/vowel-group syllables are in-row regexp passes plus one HOF fold per row; score arithmetic is in-row on round-6 ratios"),
    "pii_luhn_scan": ("linear", "zero-exchange scan projection - digit-run extraction is one regexp pass; the Luhn checksum is an in-row HOF fold over each <=19-digit candidate"),
    "toxicity_wordlist_scan": ("linear", "zero-exchange scan projection - |lexicon| word-boundary regexp counts per row summed in-row; the rate and verdict are in-row arithmetic"),
    "heaps_law_fit": ("shuffle", "one token-mass rollup + one per-type min(doc_id) rollup (map-side combine on both); checkpoint banding is in-row arithmetic vs a broadcast 1-row min/max; the cumulative window and least-squares fit run over the fixed HEAPS_BUCKETS-row rollup only (no global per-doc window)"),
    "source_keyness": ("shuffle", "one (source, token) count rollup with map-side combine; token and source totals are rollups of the rollup; log-odds is in-row integer-micro arithmetic; top-K per source via ONE rank window partitioned by source over the count table (bounded by |vocab|x|sources|, far smaller than the corpus)"),
    "assistant_verbosity_trend": ("shuffle", "one per-conv rank window on the natural (conv_id, turn_idx) key + one per-conv aggregation of 5 integer sums with map-side combine; slope/trend are in-row arithmetic on the 1-row-per-conv rollup - no global window, no collect"),
    "embedding_pca_power": ("shuffle", "corpus-side work is ONE in-row (i,j) expansion (posexplode x sequence, no self-join) into a DIM^2-cell integer rollup with map-side combine; the PCA_ITERS eigen-solve runs driver-side on the collected DIM^2 covariance table (bounded by the embedding width, independent of corpus size - the BPE-trainer budget); per-term integer micro-unit quantization makes partial sums exact under any aggregation tree"),
    "context_budget_plan": ("shuffle", "one conv-keyed suffix-sum window + one conv rollup sharing the same hash partitioning (single exchange); token costs are in-row split/filter arithmetic; integer-only outputs"),
    "truncation_artifact_detect": ("linear", "zero-exchange scan projection - trailing-ws strip and final-char class are per-row regexps, bracket/quote balance via the length-delta-of-replace identity, teaser markers are exact substring hits; the verdict is in-row boolean arithmetic"),
    "prompt_injection_scan": ("linear", "zero-exchange scan projection over the tool/user rows - |markers| length-delta-of-replace occurrence counts per row (exact integers), in-row verdict"),
    "cot_structure_detect": ("linear", "zero-exchange scan projection over assistant rows - one line split + |connectives| word-boundary regexp counts per row, answer markers are substring hits, in-row verdict"),
    "sft_prompt_conflicts": ("shuffle", "ONE conv_id window pairs user turns with the next assistant turn (min-over-following on a turn_idx-prefixed digest, no self-join) + one (prompt,response) rollup + one prompt rollup, all with map-side combine; output bounded by distinct prompts"),
    "trajectory_success_filter": ("shuffle", "in-row marker flags (specific-phrase + one regexp count per row) then ONE conv_id rollup with map-side combine; the final-turn lookup is a max-over-group on a turn_idx-prefixed key - no join, no window"),
    "late_shipment_orders": ("shuffle", "EXISTS decorrelated to a LEFT SEMI join on the natural l_orderkey shuffle (semi-join early-out stops probing at the first late lineitem; never materializes the duplicate-producing inner join) + two bounded priority rollups joined broadcast"),
    "sft_split_prompt_leakage": ("shuffle", "split assignment is the in-row conv_id hash (zero extra shuffle, composes with conversation_split_assign); ONE prompt-digest rollup with map-side combine; output bounded by distinct prompts"),
    "cdc_chunk_dedup": ("shuffle", "ONE doc_id exchange serves the running boundary-count window; chunk digests aggregate on the (doc_id, chunk_idx) prefix of the same partitioning; ownership is one digest-keyed rollup with map-side combine + one digest equi-join back - content-defined boundaries re-align after insertions so dedup survives shifted offsets; no max-cut means a boundary-free run yields one long chunk (documented)"),
    "customer_order_distribution": ("shuffle", "orders pre-aggregate per custkey with map-side combine BEFORE the outer join (join probes one row per customer, not one per order); the histogram rollup is bounded by distinct order counts - the Q13 shape whose zero bucket only the outer join produces"),
    "rake_keywords": ("shuffle", "every exchange rides the doc_id partitioning family (boundary window, phrase/word groups, score join-back, per-doc top-K rank window); word scores are integer micro-units so phrase sums are exact BIGINTs; no corpus-wide window, no cross join"),
    "outlink_host_hits": ("iterative", "HITS_ITERS synchronous rounds, each ONE page-keyed equi-join + host groupBy (map-side combine) and the mirror pair; L1 normalization totals are 1-row aggregates broadcast back; per-iteration localCheckpoint bounds lineage; kernel output checkpointed once (shared-subplan discipline); integer micro-units make every value summation-order-proof"),
    "idle_customer_balance": ("shuffle", "Q22 shape - balance threshold and epoch-us recency cutoff are 1-row aggregates broadcast in; NOT EXISTS decorrelates to a LEFT ANTI join whose probe side pre-shrinks to above-threshold customers and whose build side is the DISTINCT recently-ordering custkeys (map-side combine); segment-bounded rollup"),
    "span_corruption_plan": ("linear", "zero-shuffle scan projection - span count/lengths are exact integer arithmetic on the row's own token count, starts hash-drawn within per-span segments (never overlap by construction), array built in-row and exploded in the next select (generator cannot nest)"),
    "top_supplier_revenue": ("shuffle", "Q15 shape - per-line revenue quantizes to exact integer cents; date-window min and the revenue max are 1-row aggregates broadcast in; per-suppkey rollup with map-side combine; the name lookup broadcasts the supplier dimension; ties at the max ALL return (the Q15 subtlety)"),
    "bradley_terry_strength": ("iterative", "match mining is ONE user-keyed lag window over the events scan; everything after collapses to the (type x type) pair table - bounded by the type vocabulary squared, not corpus size - which collects once for the driver-side integer MM iteration (embedding_pca_power pattern); BIGINT floor division + L1 renorm each round make it summation-order-proof"),
    "embedding_dim_truncation": ("linear", "zero-shuffle scan projection - per (vector, k) energies are in-row sequential folds (the _dot contract); k expands from a 4-element literal array in-row"),
    "event_funnel": ("shuffle", "one user-keyed min-aggregation per funnel step, each joined back on the SAME user_id key family (no windows over raw events, no self-joins wider than user x step-min); step counts are 1-row aggregates; output is |steps| rows"),
    "retention_cohorts": ("shuffle", "one user-keyed min for cohort assignment + one (user, week) distinct + one user equi-join back + a cohort-bounded rollup; every exchange rides user_id or the bounded cohort key; output is weeks squared, not users"),
    "negative_sampling_plan": ("shuffle", "one token explode into a vocab-bounded count with map-side combine; top-K via TakeOrdered (total order: count DESC, token ASC); x^0.75 via sqrt(x*sqrt(x)) - correctly-rounded IEEE ops only, no transcendentals - then integer micro-units so the share total is an exact BIGINT"),
    "large_volume_orders": ("shuffle", "Q18 shape - the quantity rollup pre-aggregates per orderkey with map-side combine and the HAVING filter shrinks it to the heavy tail BEFORE any join; orders join on the natural orderkey shuffle; the customer dimension broadcasts"),
    "sole_late_supplier": ("shuffle", "Q21 shape - the double-correlated EXISTS/NOT-EXISTS collapses into ONE orderkey rollup (two countDistincts + conditional min classify every order in a single pass); supplier rollup is supplier-bounded; dimension broadcasts; TakeOrdered cut"),
    "outlink_host_components": ("iterative", "co-citation pairs from the per-TURN self-join (bounded by per-page host-set size, the pagerank edge discipline); kernel output checkpointed once; large-star/small-star CC rounds (diameter-independent) on host string keys with per-round localCheckpoint"),
    "extract_title_collisions": ("shuffle", "kernel output projects to the title column and aggregates on the title key with map-side combine; the owner is a min over the tab-joined turn key - no window, no join; output bounded by distinct titles"),
    "data_profile_orders": ("linear", "ONE aggregation computes every metric in a single scan (multi-distinct expands in-engine, expand factor = |columns| - the standard profiling trade); the 1-row result restructures driver-side into the bounded per-column table"),
    "uncertainty_sample_topk": ("shuffle", "rides the memoized classifier subtree (zero extra training); selection is TakeOrdered over a zero-exchange margin projection with integer micro-unit margins + doc_id tiebreaks - no global sort, no window"),
    "ndcg_eval": ("shuffle", "both inputs are bounded per-query top-K tables (attested on their own entries); the eval is one (query, vec) equi-join + a rank->discount literal-array lookup + a per-query rollup of exact BIGINTs; discounts precomputed in-process, no engine-side transcendentals"),
    "event_rate_anomaly": ("shuffle", "one (type, hour) rollup with map-side combine; the full hour grid (empty hours included - a dead hour IS the anomaly) expands in-row from a 1-row min/max broadcast; z = (n*c - S1)/sqrt(n*S2 - S1^2) over exact BIGINT moments (group_advantage recipe) - one sqrt + one rounded division"),
    "preference_length_bias": ("shuffle", "rides the pair miner's conv_id-keyed subtree (plus the branch-coverage literal fixture); the audit itself is ONE 1-row aggregation of exact BIGINTs with a null-safe win-rate division"),
    "bootstrap_mean_ci": ("shuffle", "Poisson bootstrap (Chamandy et al.): B replicate weights expand in-row from the content hash (inverse-CDF micro-unit literals, no RNG state), B x rows into a 32-group rollup with map-side combine - ONE pass and ONE bounded exchange regardless of corpus size"),
    "tool_error_rate_by_tool": ("shuffle", "in-row marker flags (the trajectory_success_filter battery, shared constants) then ONE tool-keyed rollup with map-side combine; output bounded by the tool vocabulary"),
    "classifier_ece": ("shuffle", "rides the attested calibration-bin subtree (bounded 10 rows); ECE folds in exact micro-unit integers with a single final division - a 1-row aggregation"),
    "tool_chain_topk": ("shuffle", "one conv_id rollup (per-conversation state bounded by CHAIN_CAP after the slice) then one chain-keyed rollup with map-side combine; top-K via TakeOrdered, no global sort, no joins"),
    "agent_error_recovery": ("shuffle", "in-row marker flags (shared trajectory battery), ONE (conv_id, tool) window with per-key state bounded by conversation length, a conv_id rollup and a conv_id-keyed coverage left join - every wide op keys on the conversation"),
    "citation_url_check": ("shuffle", "in-row URL extraction (JVM regex, no per-row Python), a (conv_id, url) rollup on the tool side, a (conv_id, url) equi-join (never broadcasting the tool-URL universe), a conv_id rollup + coverage join"),
    "local_supplier_volume": ("broadcast", "TPC-H Q5: two fact-side equi-join shuffles (lineitem-orders on orderkey, -customer on custkey, AQE skew-safe), supplier/nation/region broadcast with the Q5 c_nationkey=s_nationkey equality folded into the supplier join; region + date filters push to the scans; one bounded nation groupBy"),
    "promo_revenue_share": ("broadcast", "TPC-H Q14: year filter pushed to the lineitem scan, part broadcast (the classic Q14 dimension plan), ONE bounded 12-group aggregation with map-side combine; the share divides the two already-rounded sums in the final projection"),
    "assistant_canned_responses": ("shuffle", "in-row normalization + md5, ONE digest-keyed rollup (countDistinct expands to the standard two-phase distinct agg on the same key) - no joins, no windows; output bounded by distinct assistant outputs"),
    "volume_shipping_pairs": ("broadcast", "TPC-H Q7: two-year ship-date filter pushed to the lineitem scan, orders/customer key joins (AQE skew-safe), supplier + BOTH nation roles broadcast, pair filter prunes before a bounded 4-group agg"),
    "returned_item_revenue": ("broadcast", "TPC-H Q10: returnflag filter pushed to the lineitem scan, orders/customer key joins, nation broadcast, custkey-bounded rollup then top-20 via TakeOrderedAndProject - no global sort materialization"),
    "jsonl_transcript_ingest": ("linear", "text source splits by line across partitions; JSON-path extraction is in-row JVM work; ONE rollup (two-phase distinct aggs for the conv/key counts) - no joins, no windows"),
    "nation_market_share": ("broadcast", "TPC-H Q8: order-year filter pushed to the orders scan and part-type filter to the part scan, lineitem/orders/customer key joins (AQE skew-safe), part + supplier + both nation roles + region broadcast, ONE bounded 2-group agg; share divides already-rounded sums"),
    "disjunctive_part_revenue": ("broadcast", "TPC-H Q19: part broadcast, OR-of-conjuncts filter evaluated JVM-side after the join (per-branch conjuncts prune), ONE bounded 3-group agg with map-side combine"),
    "forecast_revenue_change": ("linear", "TPC-H Q6: ALL predicates (shipdate/discount/quantity) push to the parquet scan, 4-column ReadSchema, single-row agg = map-side partial + 1-row exchange"),
    "pdf_text_extract": ("linear", "PDF round trip: encode + decode are two chained mapInPandas Arrow kernels - narrow maps, ZERO exchanges end-to-end; per-doc cost linear in document bytes; oracle equality attests writer+parser per document"),
    "pdf_page_stats": ("linear", "same zero-exchange chained-kernel plan; the per-page explode happens inside the Arrow kernel (bounded by doc_len/400); DuckDB twin regenerates pagination with substr arithmetic"),
    "source_concentration": ("shuffle", "ONE groupBy(source) with map-side combine collapses the corpus to a bounded source table; the DESC row_number window and final agg run on that bounded table only; all stats from integer sums with one final round-6 division"),
    "corpus_distinct_ngrams": ("shuffle", "n-gram arrays built IN-ROW with slice/zip_with (no window/self-join); ONE explode feeds a 3-group count/countDistinct (two-phase distinct agg on the gram key)"),
    "cross_source_dup_matrix": ("bucketed", "candidates from the banded-signature bucket plan (never all-pairs); two doc_id-keyed source joins; output bounded by |sources|^2"),
    "min_cost_supplier": ("shuffle", "TPC-H Q2 decorrelation: part filter + region-resident suppliers broadcast into the offer scan; offers collapse via ONE groupBy(part,supp) with map-side combine; per-part min + join-back shuffle on partkey only (bounded by |part|); min-suppkey tiebreak kills cost-tie dup rows"),
    "product_type_profit": ("shuffle", "TPC-H Q9: part/supplier/nation broadcast; the only big shuffle is the lineitem-orders orderkey equi-join (AQE skew-safe); profit is an exact BIGINT e4 sum (zero summation-order risk) with a bounded nation x year rollup"),
    "shipment_priority_classes": ("shuffle", "TPC-H Q12: ship-year filter pushes to the lineitem scan; ONE fact-fact orderkey equi-join carrying the non-equi lateness predicate; bounded 3-group CASE-sum rollup with map-side combine"),
    "important_part_stock": ("shuffle", "TPC-H Q11: supplier window broadcasts into the scan; ONE groupBy(partkey) with map-side combine; grand total = 1-row agg of the bounded per-part table crossJoin-broadcast back; membership decided by integer cross-multiplication"),
    "supplier_part_counts": ("shuffle", "TPC-H Q16: complaint suppliers = bounded broadcast anti-join; ONE distinct on (partkey, suppkey) with partial agg; part attrs broadcast; bounded two-phase count-distinct rollup"),
    "excess_stock_suppliers": ("shuffle", "TPC-H Q20 decorrelation: year filter pushes to scan; groupBy(part,supp) with map-side combine; per-part total joined back on partkey (bounded); dominance = integer cross-multiply; supplier/nation broadcast decoration"),
    "trigram_backoff_score": ("shuffle", "stupid backoff (Brants 2007, the web-scale LM that shards counts without normalization): corpus collapses to (doc, gram, k) tables with map-side combine (trigram table checkpointed once - feeds train counts AND scoring); train count tables join back on vocab-bounded gram keys; per-doc mean is an exact integer half-up division (no float-boundary round)"),
    "shingle_df_spectrum": ("shuffle", "in-row shingle arrays -> ONE explode+distinct on (doc, shingle) -> shingle-keyed df rollup with map-side combine -> <=64-row bit-length bucket rollup (the doclen-sketch all-integer contract)"),
    "referential_integrity_audit": ("shuffle", "per FK relation: child FK column left-joins the parent DISTINCT key and folds straight into a 1-row aggregate (children shuffle on their natural join keys - the same exchange production joins pay); 7-row union output"),
    "embedding_hard_negatives": ("broadcast", "kmeans training is the shared checkpointed Lloyd loop; the assignment table materializes ONCE (feeds query + corpus sides); the 5-row query set broadcasts so candidate generation is corpus x K (bounded crossJoin), never corpus x corpus; ONE query-partitioned rank window over K bounded groups"),
    "tool_output_stats": ("linear", "role filter pushes to the scan; ONE bounded groupBy(tool) with map-side combine (countDistinct two-phase on the same key); half-up integer mean, no float boundary"),
    "rouge_overlap_pairs": ("bucketed", "candidates from minhash LSH (checkpointed ONCE - feeds the unigram AND bigram overlap joins), never all-pairs; per-doc n-gram count tables build with map-side combine and checkpoint (each feeds both pair sides); every metric is a round-6 integer quotient (F1 via the Dice identity 2ov/(na+nb))"),
    "robots_meta_flags": ("linear", "zero-exchange scan projection - every column is a JVM-side regexp/array expression over the row's own text (the turn_html_stats discipline); NULL-text turns keep coverage rows"),
    "textrank_keywords": ("shuffle", "edge extraction linear in the corpus (in-row window-2 adjacency of the stopword-filtered stream); the graph is VOCAB-bounded so the 10 integer PageRank iterations run on a table orders of magnitude smaller than the corpus (host-graph economics); edges/nodes checkpoint once; top-K via TakeOrdered"),
    "robots_txt_frontier_filter": ("broadcast", "frontier URL set = the one distinct-canonical shuffle the crawl already pays; the parsed robots rule table is tiny and BROADCASTS into a (host, prefix) join bounded by rules-per-host; ONE url-partitioned rank window picks the longest-match rule (Google tie semantics)"),
    "digest_collision_audit": ("shuffle", "one digest scan exploded x5 prefix lengths -> ONE (k, prefix) exchange with map-side combine for the two-phase distinct -> 5-group rollup; expectation is integer-times-power-of-two scaling (exact) before the single round-6"),
    "label_noise_flags": ("broadcast", "scoring reuses the memoized checkpointed classifier feature frame (zero parquet re-scan); per-class thresholds are ONE 1-row aggregation broadcast back; integer micro-unit comparisons (half-up mean recipe), no float boundary"),
    "mlm_masking_plan": ("broadcast", "in-row posexplode + content-stable hash buckets (linear); the vocab index is VOCAB-bounded (one bounded window) and BROADCASTS into the replacement equi-join that only the ~1.5% random-branch rows take; only selected positions emit rows"),
    "hll_intersection_estimate": ("bucketed", "distinct (source, shingle) table checkpoints ONCE (feeds registers + exact counts + exact pair intersections); registers are <=2^11 rows/source and checkpoint once; the source-pair table broadcasts; pair union = register max-merge (rows = pairs x registers-hit, corpus never re-scanned); the exact rider is a shingle equi-join self-reporting sketch error"),
    "tool_runtime_stats": ("shuffle", "ONE conv_id window (lead) + ONE bounded groupBy(tool) with map-side combine; integer second deltas, half-up integer mean"),
    "host_triangle_counts": ("shuffle", "degree-ordered compact-forward triangle count (Suri & Vassilvitskii): orientation from the (degree, host)-smaller endpoint bounds wedge fan-out by the LOW endpoint's degree (the power-law-graph property); the oriented edge table checkpoints ONCE and feeds both wedge sides + the closing-edge equi-join; all host-keyed equi-joins"),
    "term_burstiness": ("shuffle", "ONE (doc, term) exchange with map-side combine -> ONE term rollup -> TakeOrdered top-K; burstiness = tf/df integer-quotient round-6"),
    "canonical_content_agreement": ("shuffle", "canonical extraction is a zero-exchange scan projection; one (conv, turn) equi-join against the kernel output; ONE bounded groupBy(canonical_url) with two-phase countDistinct"),
    "bbit_minhash_estimate": ("bucketed", "Li & Konig b=1 minhash: shingle table checkpoints ONCE (signatures + candidates + exact verify, the minhash_estimate_error discipline); packed 16-bit signatures compare via ONE BIGINT xor+bit_count per LSH candidate pair; every estimate an integer quotient (1/16 multiples, exactly representable)"),
    "split_balance_audit": ("broadcast", "one (source, split) groupBy with map-side combine; the margin tables are bounded and broadcast to build the COMPLETE grid incl. zero-observed cells; chi-square contribution = integer-over-integer quotient round-6 (micro-unit expected)"),
    "quality_length_bias": ("broadcast", "scoring reuses the memoized checkpointed classifier frame; ONE aggregation job of five exact-integer regression sums (summation-order-proof, the token_zipf_fit discipline) collapsing to a single row; only the final r/slope expressions touch doubles"),
    "part_affinity_lift": ("shuffle", "DISTINCT (order, part) = one exchange; pair expansion self-joins ON the order key so blowup is C(basket, 2) per order (bounded by basket size, never corpus-quadratic); pair rollup has map-side combine; per-part counts hash-join back; top-K via TakeOrdered; all metrics integer-quotient round-6"),
    "label_centroid_similarity": ("shuffle", "corpus-sized work is ONE (label, dim) rollup with map-side combine over micro-unit-quantized terms (summation-order-proof, the pca_power recipe); centroid components are shifted half-up integer means; every downstream join/dot operates on the bounded #labels x EMB_DIM centroid table"),
    "quality_wilson_ci": ("broadcast", "scoring reuses the memoized checkpointed classifier frame; one doc_id hash join to the source column; ONE bounded groupBy(source) rollup; the Wilson interval is a single identical-association double expression on exact (k, n) integers, round-6"),
    "dup_graph_degree_stats": ("bucketed", "candidates from the bucketed LSH subtree (never all-pairs); degree rollup = one doc_id exchange with map-side combine; histogram groupBy bounded by max degree; degree-0 coverage via a linear left join so sum(n_docs) == corpus size"),
    "event_dow_seasonality": ("shuffle", "one bounded (event_type, dow) groupBy with map-side combine; the complete 7-dow grid is built by an in-row sequence explode on the bounded type margin; chi-square contribution = integer-over-integer quotient round-6 (micro-unit expected, the split_balance recipe)"),
    "customer_rfm_scores": ("shuffle", "one custkey rollup over the fact table (map-side combine, exact integer cents) joined to the customer dim; the three ntile(5) windows share ONE exchange partitioned by the bounded mktsegment key — no single-partition global sort; 1-row anchor broadcasts"),
    "host_crawl_budget": ("broadcast", "kernel/link subtree shared + checkpointed (crawl_frontier discipline); everything after the per-host rollup operates on the bounded host table; two 1-row scalar aggregates broadcast back; micro-unit SHARE waterfill keeps every product under budget*1e6 (overflow-safe at web scale)"),
    "turn_revision_distance": ("shuffle", "ONE conv_id window (lag) — no self-join; per-pair banded DP is constant-bounded by REV_BAND; every adjacent pair keeps a coverage row so the output is linear in turns"),
    "order_reorder_interval": ("shuffle", "one custkey window for lag + one custkey rollup with map-side combine — same key, one exchange total; integer day gaps, half-up integer mean"),
    "tool_latency_anomaly": ("shuffle", "ONE conv_id window (lead) for runtimes; per-tool moments are a bounded groupBy broadcast back; z = event_rate_anomaly fold (exact BIGINT moments, one correctly-rounded sqrt); untimed calls keep coverage rows"),
    "supplier_fulfillment_lag": ("broadcast", "one orderkey hash join (both sides pre-projected to 2-3 cols) + one bounded groupBy(suppkey) with map-side combine; supplier dim broadcasts the name; integer day gaps, half-up mean, integer-quotient late_frac"),
    "embedding_norm_outliers": ("linear", "per-vector work is an IN-ROW micro-unit array fold (zero exchange); MILLI-unit norm quantization keeps corpus moments within BIGINT to ~1e12 vectors; moments are ONE 1-row aggregate broadcast back"),
    "doc_language_confusion": ("linear", "the heuristic is per-row expressions; one bounded (lang, guess) groupBy with map-side combine; the row margin is a window over the bounded cell table; share = integer-over-integer quotient round-6"),
    "minhash_band_occupancy": ("bucketed", "one (band, sig) groupBy with map-side combine — the same universe the LSH join shuffles on — then a 4-row band rollup; C(size,2) pair counts are exact integers (size*(size-1) always even)"),
    "conversation_context_growth": ("shuffle", "ONE conv_id window (running sum) + one conv_id rollup on the same key — one exchange total; exact integer token counts and prefix sums, half-up mean"),
    "postings_compression_estimate": ("shuffle", "distinct (tok, doc_id) with map-side combine; the lag window and the per-tok rollup SHARE the tok exchange; the band rollup is bounded by 64 rows — no posting list ever materializes whole (the inverted_index_postings rank-filter discipline, applied to sizing)"),
    "zonemap_pruning_estimate": ("shuffle", "each layout's row_number window is partitioned by its FILE key (parallel — never a global sort); one (layout, file, rowgroup) rollup with map-side combine collapses to metadata scale (rows = row groups); the final rollup is 2 rows"),
    "column_dictionary_stats": ("shuffle", "stack() unpivot is linear (3x rows, no exchange); runs from a (col_name, file) partitioned lag window; per-column rollups have map-side combine; the distinct side collapses to |vocab| before a 3-row join back"),
    "host_label_propagation": ("shuffle", "edges from the TURN-key self-join (bounded by per-page host sets, the pagerank discipline); each of the fixed LP_ITERS rounds is host-table-sized (one dst equi-join + one (src,label) groupBy with map-side combine + one src rank window), per-round localCheckpoint bounds lineage; synchronous majority with total-order tiebreaks keeps it oracle-replayable"),
    "knn_graph_nndescent": ("bucketed", "seed pairs from the bucketed LSH equi-join (never all-pairs); the 2-hop expansion joins the top-K graph with itself on the neighbor key so candidates per vector are <= K^2; rescoring is two keyed joins to the checkpointed embedding frame; one rank window per vec partition; iterating = repeating this round, no new machinery"),
    "brier_decomposition": ("broadcast", "rides the memoized checkpointed classifier frame; per-doc pass is a zero-exchange projection + 1-row aggregate; bin pass operates on the bounded 10-row calibration table with 1-row broadcasts; milli-quantized integer squared masses are BIGINT-safe to ~9e12 docs"),
    "shard_integrity_manifest": ("shuffle", "one shard-key groupBy with map-side combine; per-shard aggregation state bounded by MANIFEST_SHARD_DOCS 45-byte records (the shard size is the knob, never corpus-sized state); zero-padded ids make lexicographic sort == numeric sort so the digest is scan-order-invariant"),
    "k_anonymity_audit": ("shuffle", "one QI groupBy with map-side combine collapses the corpus to class scale; the histogram groupBy and its margin window operate on the bounded class-size table only"),
    "late_event_watermark_audit": ("shuffle", "running prior-max via the two-pass prefix scheme (pack_token_ids discipline): block-partitioned running-max window (parallel) + a bounded block table whose exclusive-max window is metadata-scale, broadcast back; hourly rollup with map-side combine; lateness via the paired tz-cancelling second-truncation idioms"),
    "chrf_pair_scores": ("bucketed", "the rouge discipline at char level: LSH candidates checkpoint once; per-doc char-n-gram count tables build with map-side combine and checkpoint (each feeds both pair sides); overlap joins are candidate-bounded, never corpus x corpus; every chrF_n is an integer-quotient round-6 via the closed form"),
    "join_cardinality_estimate": ("shuffle", "per-key counts collapse facts to key scale with map-side combine; exact size = one key-table equi-join + rollup; heavy-key selection is a rank window over the bounded key-count table; per-key products BIGINT-safe below ~9e18 output rows"),
    "kaplan_meier_retention": ("shuffle", "duration extraction is ONE custkey window + linear projections; everything downstream operates on the bounded distinct-duration table (exclusive cumulative window + a single-row array fold whose state is the step count — metadata scale); round-6 at EVERY product-limit multiply keeps the chain oracle-replayable"),
    "zorder_layout_plan": ("shuffle", "ONE (cx, cy) groupBy collapses the corpus to at most 4^ZO_BITS cells with map-side combine; rank arithmetic, file rollups, and the 2-row layout rollup are cell/metadata scale; no windows at all — the bit interleave is a pure integer expression"),
    "neyman_allocation_plan": ("shuffle", "one source groupBy with map-side combine collapses the corpus to the bounded strata table (exact BIGINT moments); everything after — 1-row total broadcast, largest-remainder rank window, apportionment — is strata-scale; allocations sum EXACTLY to the budget by integer construction"),
    "event_seasonal_decompose": ("shuffle", "ONE date_trunc groupBy with map-side combine collapses events to the bounded daily table; the centered MA window, dow means, and joins all operate on that metadata-scale table; sign-aware half-up integer means keep negative operands away from div (truncate/floor divergence)"),
    "vocab_front_coding_estimate": ("shuffle", "DISTINCT token table with map-side combine; ONE lag window partitioned by the first-char block key (block restarts are exactly why real term-dictionary formats parallelize); LCP is a per-row expression; bounded <= 36-row block rollup"),
    "skew_salt_plan": ("linear", "ONE conv_id groupBy with map-side combine; per-key ceil arithmetic is zero-exchange projections — the exact salting arithmetic the extraction pipeline applies, made auditable"),
    "session_markov_stationary": ("shuffle", "sequencing is ONE user_id window (lead); the transition matrix is a bounded #types^2 groupBy with map-side combine; the power iteration (fixed MARKOV_ITERS rounds) runs entirely on the bounded matrix with per-round localCheckpoint — floored integer products make summation order irrelevant"),
    "url_template_mining": ("linear", "one explode (linear in links) into a template groupBy with map-side combine (countDistinct two-phase); the per-page max is a second bounded rollup on the same key; pure regex chains, no joins against corpus-sized tables"),
    "ks_drift_test": ("shuffle", "one (source, len) groupBy with map-side combine collapses the corpus; the source x distinct-length grid, per-target cumulative windows (partitioned — parallel), and rank windows are bounded-table work; D is an exact BIGINT cross-product max"),
    "bm25_prf_expansion": ("broadcast", "the bm25 discipline twice: the collapsed (tok,doc,tf) table checkpoints once and feeds lengths/stats/both scoring passes; query + expansion term sets are bounded broadcast tables so each scoring join touches only query-term postings; feedback mining joins the FB_DOCSxQ doc list back by doc key"),
    "host_seeded_pagerank": ("shuffle", "the pagerank discipline with a seed-conditional teleport: edges from the TURN-key self-join; each of the fixed PPR_ITERS rounds is one equi-join + one dst rollup on the host table + a 1-row dangling broadcast; per-round localCheckpoint; all-integer floor arithmetic"),
    "host_kcore_membership": ("shuffle", "each of the fixed KCORE_ROUNDS peels is one equi-join of the alive set against the edge table + one degree rollup with map-side combine (host-table scale); per-round localCheckpoint; fixpoint typically reached in 2-3 rounds (tested), later rounds are no-ops"),
    "dedup_cluster_diameter": ("bucketed", "membership from the attested CC subtree; within-cluster pair expansion self-joins ON cluster_id bounded by the declared DIAM_MAX_SIZE cap (quadratic only inside a capped cluster, never corpus-wide — larger clusters are visibly out of scope, no silent truncation); exact Jaccard via keyed joins on the semi-joined shingle table"),
    "sliding_hll_users": ("bucketed", "daily registers built in ONE pass (<= 2^p rows per day regardless of volume, map-side max combine); the trailing merge joins the bounded day-pair table at register scale; the exact twin (distinct + 7x bounded re-agg) is validation-only and dropped at production scale"),
    "texttiling_boundaries": ("shuffle", "tokenize + block assignment linear; per-(doc, block, term) counts with map-side combine; gap similarity joins adjacent blocks only (linear in blocks); peak windows and rollups partition by doc_id (parallel); ONE micro quantization per gap keeps the chain oracle-exact"),
    "filter_mcnemar_test": ("broadcast", "rides the memoized checkpointed classifier frame; one zero-exchange projection + a 1-row contingency aggregate; chi is an integer-quotient round-6"),
    "phrase_search": ("broadcast", "the bounded phrase table BROADCASTS into the positional token stream so matching touches only phrase-word postings (two keyed joins on doc+position — the positional-index discipline); bigram formation is an adjacent-position self-join on the checkpointed stream; rollups have map-side combine"),
    "ranking_kendall_tau": ("broadcast", "both inputs are bounded per-query top-K tables; the intersection join and the per-query pair self-join are K^2-bounded per query, never corpus-sized; tau is an integer-quotient round-6"),
    "source_trimmed_stats": ("shuffle", "one rank window partitioned by source (parallel, no global sort) + per-source rollups with map-side combine; trim counts and means are pure integer arithmetic"),
    "bpe_merge_stability": ("shuffle", "two runs of the vocab-sized merge loop (the trainer iterates the distinct-word table, tiny next to the corpus — the bpe_learn_merges audit); the comparison joins two <= BPE_MERGES-row local tables; Spearman via the all-integer identity"),
    "dedup_survivor_bias": ("bucketed", "rides two attested subtrees (CC clusters from the bucketed LSH, the memoized checkpointed classifier); one doc_id join + a 2-group rollup with map-side combine"),
    "event_hourly_autocorrelation": ("shuffle", "ONE date_trunc groupBy collapses events to the bounded hourly table; lag pairing explodes that bounded table by ACF_MAX_LAG and joins on the hour index — metadata-scale; exact milli-integer centered products, integer-quotient round-6"),
    "filter_cohen_kappa": ("broadcast", "rides the memoized checkpointed classifier frame; one zero-exchange projection + a 1-row contingency aggregate; kappa is an all-integer identity round-6 (BIGINT-safe to ~3e9 docs — n^2 bounded)"),
    "dedup_threshold_sweep": ("bucketed", "candidates from the bucketed LSH subtree; exact Jaccard via keyed joins on the semi-joined shingle table; the 5-threshold sweep explodes the bounded PAIR table, never the corpus; countDistinct two-phase per threshold"),
    "conversation_topic_shift": ("shuffle", "per-(conv, turn, term) counts with map-side combine; the gap join is adjacent turns only (keyed, linear); rollups partition by conv_id; ONE micro quantization per gap"),
    "embedding_quant_recall_curve": ("broadcast", "per-dim ranges are one bounded aggregate re-broadcast as literals (the SQ discipline); reconstructed vectors fold back to ONE array row per (bits, vec) so the K broadcast queries join corpus x |bits| rows (never corpus x corpus, never the 64x long format); integer micro dots are order-free BIGINT sums"),
    "host_degree_assortativity": ("shuffle", "degrees are one host rollup; the edge join attaches two degrees by key; the correlation is a 1-row aggregate of exact BIGINT regression sums with map-side combine (the quality_length_bias recipe)"),
    "role_length_effect_size": ("linear", "one role rollup with map-side combine (two rows); everything downstream is constant-size arithmetic; exact BIGINT moments, one round-on-sqrt-quotient milli quantization"),
    "shuffle_runs_test": ("shuffle", "rides the attested shuffle plan (its only exchange is the (epoch, shard) window); the mark join broadcasts a 1-row top source; runs counting reuses the same partitioning; one row per (epoch, shard)"),
    "event_overdispersion": ("shuffle", "one (type, hour) groupBy with map-side combine; the complete grid is bounded hours x bounded types from the margins (the dow-seasonality discipline); the ratio is a pure integer quotient round-6"),
    "embedding_mmd_poly": ("shuffle", "the only corpus-sized pass is the in-row upper-triangle outer-product explode into a (label, i, j) rollup with map-side combine — bounded d(d+1)/2 x 2 output (the pca_power discipline); the Frobenius fold runs on that bounded table; all sums exact BIGINT micro units"),
    "ann_filtered_topk": ("broadcast", "queries broadcast against the corpus ONCE (the exact-baseline discipline); both filter strategies rank the same checkpointed scored frame with different windows — no second corpus pass"),
    "dedup_incremental_merge": ("bucketed", "two runs of the attested CC machinery over bucketed LSH candidates (band signatures are per-doc intrinsic, so the old snapshot's candidate set == full candidates restricted to old endpoints — the SQL twin exploits exactly this); the audit is one doc_id join + a cluster rollup with two-phase countDistinct"),
    "source_vocab_overlap": ("shuffle", "ONE distinct (source, tok) table with map-side combine; pair intersection self-joins on the token key (vocabulary-bounded, never corpus-sized); bounded size rollup broadcast back"),
}


def main() -> None:
    from readability_1_spark.queries import QUERIES
    from readability_1_spark.session import get_spark

    spark = get_spark(app_name="scale_audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    problems = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover
            problems.append((name, str(e)[:120]))
            continue
        n_ex = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        n_bc = plan.count("BroadcastExchange")
        n_smj = plan.count("SortMergeJoin")
        cartesian = ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)
        cls, note = SCALE_CLASS.get(name, ("?", "UNCLASSIFIED"))
        rows.append((name, cls, n_ex, n_bc, n_smj, cartesian, note))

    unclassified = [r[0] for r in rows if r[1] == "?"]
    with open(os.path.join(REPO, "BENCH", "SCALE_AUDIT.md"), "w") as f:
        f.write("""# BENCH/SCALE_AUDIT — per-query plan metrics and 100 TB classification

Generated by `tools/gen_scale_audit.py` at sf0.01 (plan shapes are
scale-independent; AQE may coalesce at runtime).  `cartesian` flags
CartesianProduct/BroadcastNestedLoopJoin nodes — every `yes` row is an
intentional bounded broadcast cross join: the exact baselines
(ann_cosine_topk, dedup_embedding_cosine), the tiny-centroid-set
products of the IVF quantizer (ann_ivf_assign, ann_ivf_probe,
ann_ivf_kmeans), and the 1-row vocab-size scalar of doc_lm_score.

| query | scale class | shuffles | broadcasts | SMJ | cartesian | note |
|---|---|---|---|---|---|---|
""")
        for name, cls, n_ex, n_bc, n_smj, cart, note in sorted(rows):
            f.write(
                f"| {name} | {cls} | {n_ex} | {n_bc} | {n_smj} | "
                f"{'yes' if cart else '-'} | {note} |\n"
            )
        if problems:
            f.write("\nErrors: " + "; ".join(f"{n}: {e}" for n, e in problems) + "\n")
    print(f"wrote BENCH/SCALE_AUDIT.md ({len(rows)} queries, "
          f"{len(unclassified)} unclassified: {unclassified})")
    spark.stop()


if __name__ == "__main__":
    main()
