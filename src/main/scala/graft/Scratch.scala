package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted physical plans for the flagship queries into
  * PLANS.md (plan-review evidence). Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same extension set as Verify/Bench so dumped plans are the
    // gate-verified shapes (incl. the row_number→heap rewrite)
    GraftExtensions.install(spark)
    val d = "/root/testdata/sf0.01"

    val notes = Seq(
      "q_filter_project" -> ("Scan pushdown baseline",
        "Filters and the 4-column projection reach the parquet scan (PushedFilters + ReadSchema); no shuffle."),
      "q_join_agg_region" -> ("Multiway join + agg",
        "All three dimensions broadcast (BuildRight); the orders fact never shuffles before the aggregate; countDistinct plans the standard double hash-aggregate."),
      "q_asof_join" -> ("As-of join",
        "Union of pre-filtered sides (both filters pushed to scans), right side pre-aggregated partial+final, then ONE exchange on the key feeding a single Window pass — no range-join cross product."),
      "q_dedup_exact" -> ("Exact dedup",
        "One hash-aggregate shuffle on the 128-bit fingerprint; fingerprint expression evaluated inside whole-stage codegen."),
      "q_lsh_neardup" -> ("LSH near-dup",
        "Bucket ids computed map-side with the native dot-product expression; the self-join is an equi-join on lsh_bucket (shuffle proportional to collisions, not n²); cosine re-rank inside codegen."),
      "q_ivf_topk" -> ("IVF ANN top-k",
        "Cell assignment is a pure map-side argmax over inlined centroid literals (zero shuffle, zero row expansion); probing is a broadcast semi-join; only the 8-row centroid probe uses a single-partition window."),
      "q_topk_udaf" -> ("Top-k UDAF",
        "ObjectHashAggregate with partial_topk before the exchange — at most k values per group cross the shuffle."),
      "q_sessionize" -> ("Sessionization",
        "Two window passes and the final aggregate all share the user_id partitioning; one exchange total."),
      "q_lsh_topk_mp" -> ("Multi-probe LSH ANN top-k",
        "The probe set is a driver-computed literal isin list: bucket assignment + filter are pure map-side codegen over the scan, then TakeOrdered (per-partition top-k + merge) — zero shuffle, no join."),
      "q_hash_split" -> ("Deterministic corpus split",
        "Pure map-side md5 bucket expression over the scan — zero shuffle, zero aggregation; the same assignment on any cluster size or rerun."),
      "q_pack_bins" -> ("Sequence packing",
        "ONE exchange on the shard key feeds both the running-sum window and the final hash-aggregate (they share the partitioning); token counting is map-side before the shuffle."),
      "q_enrich_errors" -> ("Error-capture enrichment",
        "BroadcastHashJoin (LeftOuter) — the fact side never shuffles; the error marker is a codegen'd when/otherwise projection after the join."),
      "q_zscore" -> ("Per-group z-score",
        "groupBy().agg (map-side partial combine) + broadcast join back — NOT a window partitioned by the 3-value group key, which would funnel the whole table into 3 tasks; the input never shuffles."),
      "q_anti_dedup_bloom" -> ("Bloom-prefiltered dedup",
        "Destination keys fold into ONE sketch (partial bloom agg before the exchange — a single sketch row crosses the wire); the batch probes it as a map-side codegen filter; only might_contain survivors reach the exact anti-join."),
      "q_interval_join" -> ("Stream-capable interval join",
        "Equi-join on user_id with the time range as a join condition post-filter — NOT a nested-loop: shuffle is proportional to the two filtered sides, and both event_type filters are pushed to the scan."),
      "q_temperature_mix" -> ("Temperature corpus mixing",
        "Counts aggregate partial+final over #groups rows; min/pow on the tiny stats frame only; broadcast join back + map-side keep filter — the corpus side never shuffles."),
      "q_stratified_sample" -> ("Stratified deterministic sample",
        "Pure map-side salted-md5 filter over the scan — zero shuffle, zero aggregation."),
      "q_kmeans_step" -> ("k-means training step",
        "Cell assignment is the same zero-shuffle map-side argmax as IVF; the per-(cell,dim) means are ONE hash-aggregate whose partial combine collapses each partition to <= k*dim rows before the exchange."),
      "q_winsorize" -> ("Per-group winsorization",
        "Quantile stats aggregate once (#groups rows) and broadcast back; the data side never shuffles — the same shape as zscore, NOT a per-group window."),
      "q_corpus_shuffle" -> ("Deterministic epoch shuffle",
        "The shuffle key is a pure map-side md5 expression; the top-20 probe plans TakeOrdered (per-partition top-k + merge) — no global sort materializes, no single-task window."),
      "q_group_topk_native" -> ("Custom per-group top-k operator",
        "GroupTopK(partial) runs map-side bounded heaps BEFORE the exchange (<= k rows per group per input partition cross the wire), GroupTopK(final) reduces after it — no SortExec, no Window, no full-group materialization: the per-group TakeOrdered."),
      "q_range_join_bucketed" -> ("Bucketed keyless range join",
        "The containment join runs as an EQUI-join on the coarse bucket id (intervals exploded to covered buckets, points mapped to one bucket) with the exact range predicate as a post-filter — not the BroadcastNestedLoopJoin Spark plans for a raw inequality join."),
      "q_weighted_sample" -> ("Deterministic weighted sample",
        "The exponential-race key is a pure map-side md5+ln expression over the scan; selection is one per-group row_number window over numerous bounded groups."),
      "q_agg_state_merge" -> ("Incremental aggregate-state merge",
        "Two branch aggregates partial+final, then the merge is one more hash-aggregate over group-cardinality inputs — the 100 TB history side would enter as an already-aggregated state table, never re-read."),
      "q_dup_spans" -> ("Verbatim duplicated spans",
        "Window expansion + md5 fingerprint are map-side over the scan; the distinct-doc count plans the standard two-phase distinct aggregate. The harness query carries min(span text) for readability, which forces SortAggregate (string agg buffer) — duplicatedSpans(includeExample = false) is the corpus-scale path: all-numeric buffer, pure HashAggregate, only 16-byte fingerprints + counts on the wire."),
      "q_quality_classifier" -> ("Hashed linear classifier",
        "The whole score — tokenize, bucket-hash, literal-array weight lookup, fold — is a single map-side codegen projection over the scan: zero shuffle, zero join; the model ships as a literal like the IVF centroids."),
      "q_zorder_key" -> ("Z-order layout key",
        "The 21-bit Morton interleave folds to one codegen'd projection over the scan — zero shuffle; writeZOrdered adds only the repartitionByRange exchange any sorted layout pays."),
      "q_pagerank" -> ("PageRank (3 fixed iterations)",
        "Per iteration: one equi-join of the rank/outdeg weight against the cached edge list + one hash aggregate on dst (partial combine map-side) — shuffle proportional to |E| per iteration, and the fixed unrolled depth keeps the plan shallow with no checkpoint."),
      "q_skew_report" -> ("Hot-key skew report",
        "Per-key counts aggregate partial+final; the 1-row totals frame broadcasts back (BroadcastNestedLoopJoin on a single row); TakeOrdered bounds the output — nothing unbounded crosses the wire."),
      "q_winnowing" -> ("Winnowing fingerprints",
        "Shingle hashing and per-window minima are all map-side array transforms inside one projection; the only shuffle is the final distinct hash-aggregate over kept fingerprints (~2/(w+1) of positions)."),
      "q_group_ols" -> ("Per-group closed-form OLS",
        "ONE hash-aggregate (partial+final) computes count/covariance/variances/means; slope, intercept and r² are a post-aggregate projection — no second pass, no window."),
      "q_stream_enrich" -> ("Stream-static enrichment",
        "BroadcastHashJoin (LeftOuter, BuildRight): the fact side never shuffles; identical plan under readStream where the dim re-broadcasts per micro-batch."),
      "q_kanonymity" -> ("k-anonymity audit",
        "One hash-aggregate on the quasi-identifier tuple with map-side partial combine; the < k filter runs post-aggregate so only rare combinations survive."),
      "q_heavy_hitters" -> ("Exact heavy hitters (sketch → recount)",
        "The Misra-Gries pass is ONE ObjectHashAggregate whose partials are O(k) maps — the full distinct-token shuffle never happens; the recount is a broadcast semi-join + hash aggregate over candidates only, and the n/(k+1) threshold joins as a 1-row broadcast."),
      "q_pq_topk" -> ("Product-quantization ANN (encode + ADC)",
        "Both the per-subspace argmin encode and the ADC lookup-sum are a single map-side codegen projection over the scan (codebooks and the query LUT are literals/1-row broadcasts); the ranking is TakeOrderedAndProject — no join, no window, no shuffle beyond the top-k."),
      "q_label_prop" -> ("Label propagation (3 fixed rounds)",
        "Per round: one equi-join of the label table onto the cached edge list + two hash aggregates (label counts, then min_by argmax) — shuffle proportional to |E|, the label table never exceeds |V| rows, and the fixed unrolled depth keeps the plan shallow."),
      "q_naive_bayes" -> ("Naive Bayes classifier audit",
        "Model and scoring are wordcount-shape hash aggregates; the class fan-out is a BroadcastNestedLoopJoin against a 5-row classes frame and the (class, token) model joins as a broadcast — the corpus-sized (doc, token) table shuffles only for its own aggregates."),
      "q_chi2_tokens" -> ("Chi-squared feature selection",
        "Presence dedup + two hash aggregates build the contingency marginals; the chi-squared arithmetic is a post-join projection and the per-class top-k windows over the vocab-sized (class, token) table — never the corpus."),
      "q_er_score" -> ("Record-linkage match scoring",
        "The sorted-neighborhood blocker is one rank window + a self-join on the block key; scoring hydrates pairs with two broadcast hash joins and evaluates all three comparators (jaccard/levenshtein/exact) as one map-side projection — cost proportional to candidate pairs."),
      "q_dp_counts" -> ("DP-style noised release",
        "ONE hash aggregate; the Laplace inverse-CDF noise is a post-aggregate projection over #groups rows (md5 hashUnit, sign/ln/clamp) — nothing but the group counts ever shuffles."),
      "q_mad_outliers" -> ("MAD robust outliers",
        "Two percentile aggregates and two joins, all keyed on the group column so the exchange is reused; the robust-z filter is a post-join projection. Exact medians buffer per group — percentile_approx or the binned-histogram path swaps in beyond ~10^8 rows/group."),
      "q_class_cohesion" -> ("Pairs-free class cohesion",
        "The polarization identity turns mean pairwise cosine into two hash aggregates over a dim-fanout posexplode — no self-join anywhere in the plan; the pair count never exists."),
      "q_curation_pipeline" -> ("End-to-end curation pipeline",
        "Quality gate, dedup survivorship, split and chunking fuse into one lazy dataflow: the classifier score and split key are map-side expressions, the two survivors filters are semi-joins, and the only shuffles are the dedup fingerprint aggregate and the final chunk join."),
      "q_interp" -> ("Linear interpolation over a time grid",
        "Both neighbor lookups are GROWING window frames (the next-observation side runs over the reversed ordering) — a shrinking (1, unboundedFollowing) frame recomputes per row, O(n^2) per entity, measured 16.5s vs 1.5s at sf0.1."),
      "q_ks_statistic" -> ("Kolmogorov-Smirnov distribution shift",
        "One hash aggregate collapses the raw rows to per-distinct-value side counts; the cumulative ECDF window and the max-gap aggregate run over that bounded table, never the events."),
      "q_attribution" -> ("Time-decay multi-touch attribution",
        "Conversions equi-join touches on the user key with the lookback range as a post-join filter (state-bounded interval-join shape); the stepped dyadic decay is a map-side shift expression and the per-conversion normalization is one window sum."),
      "q_lsh_dedup_eval" -> ("LSH blocking quality eval",
        "Candidate generation and exact-Jaccard truth are both inverted-index equi-joins on the bounded fixture; the three counts meet through 1-row broadcasts — the s-curve readout that tunes bands/rows before a corpus-scale dedup."),
      "q_auc" -> ("ROC-AUC filter eval",
        "One hash aggregate collapses the corpus to per-distinct-score class counts; the midrank cumulative window and the closing 1-row reduce run over that bounded score table — the same collapse-then-window shape as KS, never a rank over raw rows."),
      "q_bootstrap" -> ("Poisson-bootstrap uncertainty",
        "The 32-replicate fan-out is a map-side explode of a literal range feeding ONE partial+final hash aggregate on r — 32 rows per input partition cross the wire, no RNG, no second pass over the data."),
      "q_join_card" -> ("Join-cardinality pre-flight",
        "Both histograms aggregate partial+final to one row per distinct key; the histogram join and the three 1-row broadcasts are all key- or constant-sized — the join being predicted never executes."),
      "q_ewma" -> ("Bounded-memory EWMA",
        "A single per-entity window pass with a 16-row frame (constant buffer per row); the weight and head-normalization vectors are literal arrays, so the whole smoothing is one projection over the sorted frame."),
      "q_delta_agg" -> ("Incremental aggregate maintenance",
        "The delta aggregates partial+final to per-key signed adjustments; the full-outer merge against the state table is key-cardinality work — the base data is never re-read, which is the entire point of IVM."),
      "q_kcore" -> ("k-core peeling fixpoint",
        "Each data-dependent round is one degree hash-aggregate + two semi-joins on the shrinking edge set, localCheckpointed to keep the plan flat; convergence is a 1-row count (the node set shrinks monotonically, so equal counts mean fixpoint) — no join-based set comparison."),
      "q_quantize_int8" -> ("int8 embedding quantization",
        "The entire quantize — absmax, scale, codes, error stats — is ONE map-side array projection over the scan: zero shuffle, zero join; at corpus scale this runs at read bandwidth, which is the point of quantizing at ingest."),
      "q_int8_topk" -> ("int8 MIPS top-k",
        "Query codes and scale ride as literals (1-row collect like the IVF centroids); scoring is an integer zip_with fold + one float multiply per row, then TakeOrdered — the scan never shuffles and the integer dot is exact in any engine."),
      "q_countmin" -> ("Count-min sketch eval",
        "The sketch builds from a VOCAB-sized depth-fold explode (never the raw token stream twice) into one partial+final aggregate bounded by depth x width cells; the probe side is topK x depth rows meeting the sketch through an equi-join."),
      "q_rrf" -> ("Reciprocal-rank fusion",
        "Both rankers end in TakeOrdered top-50 lists; the fusion is a full-outer join of two 50-row frames plus a fixed-order two-term projection — candidate-list-sized work after the retrieval stages, regardless of corpus size."),
      "q_jl_distortion" -> ("JL projection distortion audit",
        "The 16x64 plane matrix is inlined as literals, so projection is one map-side fold battery over the scan (zero shuffle, like IVF assignment); only the bounded id<40 audit pairs ever join."),
      "q_ndcg" -> ("NDCG@10 + MRR ranking eval",
        "Exact and IVF rank lists meet in ONE (query,id) equi-join; gain/discount arithmetic is dyadic-exact (2^-20 multiples) so the two per-query hash aggregates are order-independent — rows ∝ queries × k throughout, never corpus-sized."),
      "q_davies_bouldin" -> ("Davies-Bouldin cluster quality",
        "Assignment is the zero-shuffle map-side argmax over centroid literals; scatter is ONE k-row hash aggregate with DECIMAL(18,6)-exact sums; the k² pair frame and partner-scatter join are both broadcasts — nothing corpus-sized shuffles."),
      "q_jaro_winkler" -> ("Blocked Jaro-Winkler fuzzy matching",
        "One equi-join on the nation blocking key (fan-out ∝ block², never corpus²); the native JaroWinkler comparator and the 6dp threshold filter run inside whole-stage codegen on the joined pairs — no UDF, no driver loop."),
      "q_bpe_encode" -> ("BPE encoding under learned merges",
        "After training (vocab-sized, tiny-collected winners), encoding is a pure map-side chain of 8 literal string replaces over the scan — zero shuffle, zero state; subword counting is integer length arithmetic in the same projection."),
      "q_survival" -> ("Kaplan-Meier survival curve",
        "Two user-level hash aggregates (map-side combined) collapse events to lifetimes; all windows run over the distinct-duration DAY GRID — bounded by observation span, never user count — so the single-partition window is a few dozen rows."),
      "q_assoc_rules" -> ("Market-basket association rules",
        "The pair expansion is a self-equi-join ON USER over the distinct (user, item) projection — fan-out ≤ itemset² per user, bounded by the item vocabulary; one (a,b) aggregate with map-side combine, per-item counts and the user total join back as broadcasts."),
      "q_hits" -> ("HITS hubs & authorities",
        "Each unrolled round joins the |V|-row score table (shuffle_hash) against the edge copy pre-partitioned on the matching key — no per-round |E| sort, no broadcast assumption; per-node sums are integer-exact so no normalization runs until the final max division."),
      "q_heaps_law" -> ("Heaps'-law vocabulary growth",
        "Prefix membership is a map-side hashUnit bucket expression (nested by construction) — NO global row-order window; the only windows run over the 10-row bucket grid, and the fit is a 10-point OLS aggregate."),
      "q_decayed_topk" -> ("Time-decayed popularity top-k",
        "One (id, month-bucket) hash aggregate with map-side combine, weights as a 120-entry dyadic literal array (integer×dyadic contributions = exact sums), then TakeOrdered — no window, no full sort, 1-row max-date broadcast."),
      "q_golden_record" -> ("Golden-record survivorship",
        "The longest-content pick is a struct-argmax inside ONE hash aggregate — no per-cluster window over member rows; the mode ranks only DISTINCT (cluster, value) combinations. Cluster derivation reuses duplicateClusters' checkpointed pointer-jumping."),
      "q_prf_expansion" -> ("PRF query expansion",
        "The BM25 stage's filters run before any shuffle; the feedback join broadcasts 3 doc ids against the term-frequency table, so candidate-term work ∝ feedback vocabulary — the corpus-sized aggregates are the same two a TF-IDF pass already pays."),
      "q_split_leakage" -> ("Train/test split leakage",
        "Near-dup candidates come from the bounded token-Jaccard equi-join; split assignment is a pure map-side md5 expression joined in twice — the leakage filter adds no shuffle beyond the parents'."),
      "q_octadesk_e2e" -> ("Reference main.py dataflow, end-to-end",
        "The entire reference pipeline as ONE plan: nested-struct flatten and KV pivot are map-side projections over the scan; the chat merge is the single full-outer shuffle; dedup-vs-destination is a broadcast anti-join (the destination side aggregates to distinct keys first); backfill/sanitize/audit never touch a shuffle."),
      "q_power_iteration" -> ("Power-iteration PCA",
        "The n·d² covariance products stream into a d²-cell hash aggregate (map-side combine — the pair rows are never materialized); localCheckpoint pins the 4096-row C; each of the 9 matvec rounds is a broadcast join of a 64-row vector against C plus a d-cell aggregate — bounded by d, not n."),
      "q_incremental_cc" -> ("Incremental connected components",
        "The corpus appears in exactly three non-iterative equi-joins (two endpoint→root lookups, one relabel); the pointer-jumping CC loop runs on the CONTRACTED batch graph only — prior clusters enter as single super-nodes, so per-round work ∝ batch size."),
      "q_fellegi_sunter" -> ("Fellegi–Sunter probabilistic linkage",
        "One histogram aggregate per field collapses to 1-row u scalars (broadcast); candidate pairs come from ONE block-keyed self-equi-join (volume Σ block², the blocking contract); the log-likelihood score is a codegen'd map-side expression — no window, no second pass."),
      "q_hard_negatives" -> ("Hard-negative mining",
        "Anchors broadcast; the label-inequality filter sits IN the broadcast-join condition, so same-label rows die before any shuffle; the only exchange is the per-anchor rank window over surviving candidates."),
      "q_negative_sampling" -> ("Negative-sampling table",
        "One wordcount aggregate (map-side combine, shuffle ∝ distinct tokens); the rank window runs over the DISTINCT-token table (vocab-sized, the vocabCoverage contract) and the cumulative sum over topV rows only."),
      "q_quantile_norm" -> ("Per-source quantile-rank gate",
        "ONE source-partitioned window computing percent_rank — exact integer-rank rational, no libm, no buffering of values; the keep flag is a map-side comparison on the rounded rank."),
      "q_topk_per_group" -> ("Idiomatic window top-k under GroupTopKRewrite",
        "The standard row_number+filter formulation — the optimizer rule replans it as partial heap → Exchange → final heap (rank re-emitted): NO Sort, NO WindowGroupLimit, NO Window anywhere in the plan; compare q_group_topk_native, which reaches the same shape through the explicit API."),
      "q_ivf_topk_bcast" -> ("Broadcast-codebook IVF (k=256 scale path)",
        "Codebook collapses to ONE sorted array-of-structs row riding a broadcast crossJoin; assignment is the native NearestCentroid kernel (constant-size generated code); candidates from an equi-join on the probed cells; TakeOrdered finishes — no literal-inlined codebook, no JVM codegen-size ceiling."),
      "q_fdr_bh" -> ("BH-FDR over the per-source KS battery",
        "The KS grid (groups × distinct values) feeds group windows; the BH stage is two UNPARTITIONED windows over the m=20-row hypothesis frame — single-task BY DESIGN (hypothesis grain, never row grain)."),
      "q_modularity" -> ("Newman modularity of the near-dup clustering",
        "Pair relation cached once (feeds CC labels AND canon/intra/degree); after the iterative CC rounds, modularity itself is two label equi-joins + two hash aggregates + a 1-row broadcast total — shuffle ∝ |E|, no iteration."),
      "q_epoch_schedule" -> ("Token-budget epoch schedule",
        "ONE hash aggregate to domain grain, a 1-row broadcast total (decimal-exact weight sum), map-side share/epoch arithmetic — nothing scales with rows after the first aggregate."),
      "q_octadesk_e2e_drift" -> ("Reference dataflow under schema drift",
        "Same single-shuffle plan as q_octadesk_e2e (the chat merge is the one exchange; dedup is a broadcast anti-join) with the evolved cf_* columns flowing through sanitize/dup-drop as pure metadata projections — drift costs no extra shuffle."),
      "q_binary_quantize" -> ("1-bit embedding quantization",
        "The 64 sign tests and two 32-bit word sums are ONE map-side integer projection over the scan — zero shuffle, zero join; like quantize_int8, this runs at read bandwidth, which is the point of packing at ingest."),
      "q_hamming_topk" -> ("Binary-quantization retrieval (Hamming + rerank)",
        "Stage 1 is XOR+popcount against literal query words inside codegen, finished by TakeOrdered (per-partition heaps, no sort, no shuffle); stage 2 reranks only the 50-row pool with the exact float dot — the corpus is touched once, bit-packed."),
      "q_kneser_ney" -> ("Kneser–Ney smoothed bigram LM",
        "The same wordcount-shaped plan as the JM interpolation: one bigram hash aggregate, two vocab-sized context aggregates, vocab-keyed joins back to the occurrence stream and a 1-row type-count broadcast — the continuation counts add aggregates over the TYPE table, never a second corpus pass."),
      "q_ccnet_buckets" -> ("CCNet perplexity buckets",
        "The LM proxy is the unigram plan (wordcount aggregates + vocab join); bucketing adds ONE language-partitioned ntile window over scored docs — per-language sort, parallel across languages, no global order."),
      "q_adamic_adar" -> ("Adamic–Adar link prediction",
        "Pair graph cached once (five consumers); candidates come from ONE wedge equi-join on the hub-capped center; the 1/ln(deg) scoring aggregate, adjacency anti-join and TakeOrdered all run over wedge-volume rows — never all-pairs."),
      "q_tcloseness" -> ("t-closeness release audit",
        "One (quasi, value) hash aggregate, a broadcast join against the value-cardinality global table, a quasi-partitioned window over CELLS (not rows) and one group aggregate of exact-integer numerators — the single float division happens once per group, after the sums."),
      "q_spearman" -> ("Per-group Spearman correlation",
        "Two rank windows per axis, all partitioned by the group (parallel across groups, no global sort), then ONE stats hash aggregate computing cov/var in a single pass — the assortativity tree, reused."),
      "q_boilerplate" -> ("Boilerplate-prefix audit",
        "The prefix is a map-side array-slice projection (no explode — one row per doc); counts and totals are two hash aggregates, and the per-source top-3 row_number filter REPLANS as the GroupTopK heap pair (partial before the exchange) under the rewrite rule."),
      "q_density_clusters" -> ("DBSCAN density clustering",
        "Neighbor pairs come from the same within-cell equi-join as semantic dedup (Σ|cell|², never n²); degrees/cores are one hash aggregate; the CC iterates over the CORE-induced subgraph only, and border attachment is one join + min-aggregate."),
      "q_watermark_detect" -> ("LLM watermark detection",
        "Wordcount-shaped: explode to bigrams, md5-parity green flag as a map-side codegen expression, ONE per-doc hash aggregate — no joins, no vocab state, no window; the z arithmetic is a post-aggregate projection."),
      "q_centroid_drift" -> ("Per-label embedding centroid drift",
        "posexplode feeds ONE (label, dim) hash aggregate with map-side combine — shuffle is labels×dim cells, not rows; the cosine of sums needs no count division and the label-sized count join broadcasts."),
      "q_conformal" -> ("Split-conformal prediction radius",
        "Residuals rank in ONE group-partitioned window (per-group sort, the analysis unit); the rank index is computed on the group-count aggregate and probed back with a single equi-join — no global sort, no second data pass."),
      "q_seasonality" -> ("Hour-of-day seasonal index",
        "Two hash aggregates collapse the events to 24 cells per key; the full grid is a sequence-literal explode over the key-level totals and the fill is one key-grain join — nothing row-sized past the first aggregate."),
      "q_clustering_coef" -> ("Local clustering coefficient",
        "Reuses the cached pair graph and the degree-ORIENTED triangle join (O(|E|^1.5) wedge bound); degree aggregate + left join + one exact-integer division per node — no new shuffle shape beyond triangleCount's."),
      "q_textrank" -> ("TextRank keyword extraction",
        "The co-occurrence graph collapses to support-filtered bigram types (wordcount aggregate); then the SAME cached-edge PageRank loop as the link queries — one equi-join + one hash aggregate per round over the word graph, finished by TakeOrdered top-30."),
      "q_silhouette" -> ("Simplified silhouette per IVF cell",
        "All k centroid cosines, the argmax assignment and the (b−a)/max(a,b) score are ONE map-side literal-centroid projection; the only aggregate is the k-row per-cell mean — zero joins, zero row expansion."),
      "q_horvitz_thompson" -> ("Horvitz–Thompson sample calibration",
        "The keep rule is the map-side salted-md5 filter; the HT estimators are ONE hash aggregate of exact dyadic summands over kept rows; truth totals aggregate the full table once and join at source grain."))

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans for flagship queries\n\n")
    sb.append("Generated by `graft.Scratch` at sf0.01 (plan shapes are scale-independent;\n")
    sb.append("AQE may further coalesce/convert at runtime). Each plan is the reviewed\n")
    sb.append("shape, not the first one that passed — see README 'Scale posture'.\n")
    notes.foreach { case (name, (title, note)) =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $title\n\n$note\n\n```\n")
      // keep the plan tree + the most informative detail lines, truncated
      val lines = plan.linesIterator.toSeq
      val tree = lines.takeWhile(_.trim.nonEmpty)
      val details = lines.drop(tree.size).filter(l =>
        l.matches("^\\(\\d+\\).*") || l.startsWith("PushedFilters") ||
          l.startsWith("ReadSchema") || l.startsWith("Location") ||
          l.startsWith("Join type") || l.startsWith("Keys") ||
          l.startsWith("Functions") || l.startsWith("Arguments"))
      (tree ++ Seq("", "-- details (truncated) --") ++ details)
        .map(l => if (l.length > 160) l.take(157) + "..." else l)
        .take(70)
        .foreach(l => sb.append(l).append("\n"))
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("PLANS.md written, " + sb.length + " chars")
    spark.stop()
  }
}
