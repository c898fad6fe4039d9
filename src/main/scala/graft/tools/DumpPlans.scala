package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Regenerates PLANS.md: the formatted physical plan of each
  * representative query, with a one-line note on the shape property
  * that makes it scale (the same properties PlanSpec asserts — this
  * file is the human-readable audit trail, the spec is the gate).
  *
  * Usage: `runMain graft.tools.DumpPlans [sfDir] [outPath]` (default
  * sf0.001 — plan SHAPE is scale-invariant; AQE re-plans sizes at
  * runtime). `outPath` (default PLANS.md) lets `tools/plan_gate.py`
  * dump the CURRENT plans to a scratch file and diff their normalized
  * shapes against the committed PLANS.md without touching it.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = args.lift(1).getOrElse("PLANS.md")
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")

    val picks: Seq[(String, String)] = Seq(
      "q1_join_avg" -> "broadcast hash join on the dim side; partial+final aggregate",
      "sort_topn" -> "TakeOrderedAndProject — top-k never global-sorts",
      "filter_and" -> "predicates inside PushedFilters, pruned ReadSchema",
      "join_skew_salted" -> "salted key spreads the hot key across partitions",
      "join_asof" -> "union + window: zero join nodes for an as-of match",
      "dedup_ngram_jaccard" -> "inverted-index: one shuffle keyed by hashed shingle, no self-join; auto df cap bounds buckets (non-binding here), survivor sizes = base minus broadcast hot-hits",
      "dedup_simhash" -> "band self-join reads the persisted signature frame twice",
      "embed_ann_lsh" -> "Hamming pre-filter over 32-byte sketches; exact rerank on survivors",
      "text_repetition" -> "pure map — per-doc mode via codegen mode_count, no hash exchange",
      "doc_chunk" -> "narrow generate: rows multiply, nothing shuffles",
      "events_sessionize" -> "one user_id exchange shared by both windows and the aggregate",
      "tpch_q5_local" -> "5-way star: facts shuffle once each, nation/region broadcast",
      "filter_in_subquery" -> "IN (subquery) rewritten to a broadcast left semi join",
      "events_retention" -> "cohort table broadcast into the distinct-activity stream",
      "text_surprisal" -> "vocabulary broadcasts when its measured size fits; shuffle-join fallback for web-scale vocabularies",
      "embed_pq" -> "recall gate: PQ code pass + exact rerank, joined against the brute-force fold; both 1-row shape/recall aggs broadcast",
      "text_tfidf" -> "ONE doc_id-keyed corpus shuffle shared by the TF aggregate and the ranking window; vocabulary broadcast by measured size",
      "text_bpe_merges" -> "pair stage runs on the word HISTOGRAM (one corpus-sized word-count agg, then a vocab-sized pair agg); top-k via TakeOrderedAndProject",
      "text_bpe_encode" -> "k merge rewrites collapse to ONE projection over the distinct-word frame; token counts rejoin the corpus by measured broadcast; per-doc agg is map-side partial",
      "corpus_split_leakage" -> "rides the cached jaccardPairs frame; two doc_id joins on the near-dup-volume pair side; the docs-sized split map auto-broadcasts only while Catalyst's size estimate fits (shuffled join past the threshold)",
      "corpus_dedup_savings" -> "cluster map joined once to the token projection; dropped is a pure column test (doc_id <> root); final agg is source-count-sized with map-side partials",
      "dedup_incremental" -> "batch shingles probe the standing s-partitioned corpus index — no corpus self-join",
      "dedup_minhash" -> "codegen minhash_sig_md5 map-side; band self-join shuffles 24-byte rows; exact verify only on candidates",
      "events_resample" -> "grid exploded map-side from per-user spans; fill window reuses the user_id clustering",
      "doc_overlap_report" -> "ONE corpus pass: broadcast mark join + conditional count, single doc_id exchange",
      "corpus_quality_sample" -> "broadcast-vocabulary surprisal + map-side md5 sample; no exchange carries text",
      "events_active_users" -> "rolling distinct via 7-day explode of the slim (day,user) frame — never days × users",
      "tpch_q18_big_orders" -> "lineitem aggregates once; survivors (not the fact table) join customer; top-100 is TakeOrderedAndProject",
      "text_heavy_hitters" -> "ObjectHashAggregate folds the Misra-Gries sketch partial+final; exact re-count only on broadcast candidates — no vocabulary shuffle",
      "corpus_dsir" -> "both bucket models bounded at 1024 rows → unconditional broadcast; ONE doc_id-keyed corpus shuffle",
      "events_paths" -> "session + both trigram lags cluster by user_id — one events exchange, sorts layered; top-20 is TakeOrderedAndProject",
      "tpch_q10_returns" -> "returnflag + quarter filters pushed to both fact scans; nation broadcast; top-20 is TakeOrderedAndProject",
      "events_attribution" -> "user_id equi join with the time range as residual — per-user candidates, never a time cross-product",
      "events_ewma" -> "anchor window and 7-day RANGE decay sum share ONE user_id exchange",
      "corpus_topk_per_lang" -> "WindowGroupLimit: each map task keeps k rows per group before the exchange",
      "embed_matryoshka" -> "prefix-sliced vectors; query set broadcast; corpus scanned once, never shuffled",
      "tpch_q1_pricing" -> "pushed shipdate cutoff; 6-group partial+final hash aggregate with 8 aggregates — scan-bound",
      "tpch_q6_forecast" -> "date + discount + quantity bands all inside PushedFilters; ungrouped product-sum",
      "tpch_q4_priority" -> "EXISTS plans as a LEFT SEMI join on o_orderkey with the shipped-after-order residual — one row per order, no de-dup aggregate",
      "tpch_q19_brand" -> "OR-of-conjunctions join predicate: per-side implications extracted to the scans, cross-side residual evaluated post-join",
      "corpus_temperature_sample" -> "WindowGroupLimit prunes to the literal max quota per language map-side; sqrt-count quotas broadcast",
      "corpus_token_budget" -> "running token sum is one source-partitioned rows-frame window; 1-row budget broadcast back",
      "group_unpivot" -> "stack is a narrow Generate — rows multiply map-side, no shuffle, scan pruned to the three measures",
      "join_range_capped" -> "WindowGroupLimit admits ≤cap rows per second map-side BEFORE the bucket exchange; then the same bucket equi join — never a cartesian",
      "embed_ann_auto" -> "clusteredness-routed: this corpus routes to the sketch path (Hamming pre-filter + exact rerank); the probe's fit is memoized with the IVF quantizer",
      "dedup_semantic" -> "planted-clone union; centroid-cell self-join compares cosines only within cells — Σ(cell choose 2), never all-pairs",
      "embed_bitext_mine" -> "queries broadcast vs the target side, candidates broadcast back for reverse neighborhoods — two corpus scans, no self-join",
      "tpch_q21_waiting" -> "EXISTS/NOT EXISTS chain as multiplicity-preserving semi + anti joins; nation broadcast",
      "tpch_q9_profit" -> "derived partsupp joins the fact on the (partkey, suppkey) pair; part/nation broadcast; per-line cents summed as BIGINT",
      "embed_ann_auto_clustered" -> "clustered-twin corpus routes to the IVF branch: posting lists in a cid-bucketed table, probe scan bucket-pruned to the probed cells",
      "dedup_containment" -> "same one-pass tagged bucket counting as the jaccard row (shared bucketCounts); only the normalization differs, so candidate volume — the scale term — is identical",
      "dedup_containment_capped" -> "BINDING df cap: hot buckets emit one marker row per member instead of (bucket choose 2) pairs; survivor sizes corrected by broadcast hot-hits",
      "dedup_clusters" -> "alternating large/small-star CC over the cached pair frame; per-round localCheckpoint truncates lineage so round k never replans rounds 1..k-1",
      "dedup_exact" -> "one hash aggregate keyed by text — partial+final, linear",
      "dedup_url" -> "codegen'd canonicalizer projection (regexp + array ops, no UDF) into one hash aggregate keyed by the short canonical string — dedupExact economics at URL width",
      "dedup_embed_cosine" -> "sign-sketch band join proposes; codegen'd GatedVecDot (Cauchy-Schwarz prefix gate) verifies — the corpus never self-joins on raw vectors",
      "dedup_simhash_wide" -> "128-bit signatures as two words, 32-bit bands: shuffle on (band, value), Hamming gate before the distinct",
      "events_dedup_window" -> "duplicate events dropped by rank inside the clustered window, with WindowGroupLimit pruning candidates map-side BEFORE the exchange — no self-join",
      "text_unigram_train" -> "corpus touched ONCE by the word-histogram agg; seed counting and every EM stage are vocab-sized; top-k via one window over the final counts",
      "text_unigram_encode" -> "per-DISTINCT-word Viterbi (the media-seam class) rejoins the corpus by measured broadcast; per-doc agg is map-side partial",
      "text_unigram_vocab" -> "final counts join the driver-held lp model by unconditional broadcast (vocab-sized); top-k limit",
      "crawl_warc_ingest" -> "byte-cursor WARC framing is a partition-batched map — zero shuffles until the output sort; blobs are per-partition, records self-contained",
      "crawl_html_extract" -> "the whole extraction rule chain is one codegen'd projection — a pure map, no UDF, no shuffle",
      "crawl_robots_filter" -> "rules parse ONCE into a persisted frame; the verdict join broadcasts only while the measured size fits (shuffled hash join past the budget — the million-host regime); plain prefix rules match via codegen'd startswith, regex only for */$ rules; map-side-partial max_by — no corpus-keyed window sort",
      "crawl_pipeline" -> "the composed front end: partition-batched WARC map (mixed gzip/plain framing), codegen'd extraction projection, measured-broadcast robots join with partial-agg verdict, ONE canonical-key aggregate — the only corpus-keyed shuffle in five stages",
      "multimodal_dedup_phash" -> "decode+dHash is a partition-batched map (the media byte seam); pairs ride the banded simhash self-join on 8-byte signatures",
      "multimodal_dedup_ahash" -> "audio twin of the phash row: decode+aHash map, then the SAME banded Hamming join — the image/audio tiers inherit the text tier's shuffle economics",
      "multimodal_dedup_phash_png" -> "real zlib PNG decode in the partition-batched map (container-sniffing pixelsOf); pair stage identical to the BMP row — format coverage costs zero extra shuffles",
      "multimodal_dedup_phash_jpeg" -> "full baseline-JPEG decode (Huffman + IDCT) in the partition-batched map; clones re-encode decoded pixels losslessly so the oracle stays closed-form; same banded pair join",
      "multimodal_audio_features" -> "codec decode + radix-2 FFT per record in the partition-batched map — a pure map, only the output sort exchanges",
      "text_wordpiece_encode" -> "greedy longest-match once per DISTINCT word, measured-broadcast join back to the word stream, one per-doc aggregate — the bpe/unigram encode shape",
      "multimodal_dedup_png_palette" -> "palette/Adam7/16-bit PNG decodes in the partition-batched map — the full-matrix coverage row; pair stage identical to every other signature tier",
      "multimodal_dedup_jpeg_progressive" -> "progressive (SOF2) decode on half the population — multi-scan coefficient accumulation is per-record map work, invisible to the plan; same banded pair join",
      "multimodal_dedup_gif" -> "LZW GIF decode in the partition-batched map; interlaced encodes change bytes, not plan shape; same banded pair join",
      "multimodal_dedup_vhash" -> "RIFF/AVI container decode + temporal luminance hash in the partition-batched map; the video tier joins on the SAME banded Hamming machinery as image/audio/text",
      "multimodal_dedup_video_mjpeg" -> "per-frame JPEG decode inside the video map — compressed-video coverage costs decode CPU, not shuffles; same banded pair join",
      "multimodal_dedup_video_rescale" -> "per-sampled-frame dHash witnesses packed into the numeric pair key; frame-level banded join then a position-aligned vote aggregate — candidate volume governed by frame similarity, never clips squared",
      "dedup_ngram_jaccard_staged" -> "forced 3-wave staged sweep: waves materialize during construction (localCheckpoint), so the pinned shape is the post-staging union + one (d1,d2) sum — per-wave shuffles never coexist",
      "dedup_keep_list" -> "greedy keep: pair frame's d2 side distinct + left anti against the corpus ids — rides the one cached pair pass",
      "dedup_cluster_keep" -> "cluster representatives via one min-agg over the CC labels; corpus anti-joins the drop side — no second pair pass",
      "dedup_cluster_stats" -> "per-cluster size histogram over the CC labels — cluster-volume aggregates, the corpus is never rescanned",
      "corpus_split_leakfree" -> "CC-root split rebalance: every doc of a cluster follows its root's md5 split — one join of the docs-sized split map against the cluster labels",
      "text_dup_passages" -> "passage-shingle inverted index with the SAME df-cap bucket economics as the doc-level pair pass; pairs keyed by hashed passage shingle",
      "doc_decontaminate_fuzzy" -> "eval-set shingles broadcast (eval is small by contract); corpus probes map-side — the corpus is never shuffled by shingle",
      "corpus_reservoir" -> "md5-keyed rank window partitioned by lang: one lang exchange, WindowGroupLimit prunes to k map-side",
      "text_langid" -> "pure map: per-doc n-gram profile scored against broadcast language profiles — zero exchanges before the final order",
      "agg_approx_percentile" -> "ApproximatePercentile partial+final ObjectHashAggregate beside the exact percentile twin (the honesty contract; sketch-only at 100 TB)",
      "events_window" -> "tumbling window aggregate: one (user_id, window) hash exchange with map-side partials",
      "join_range" -> "banded range join: both sides bucket by time band, equi join within band + residual — never a cartesian",
      "text_quality" -> "single-pass quality scoring: every ratio folds in one projection + one ungrouped agg for the corpus means — no per-feature rescans",
      "multimodal_dedup_webp" -> "VP8L decode (canonical prefix codes, transforms, plane-coded LZ77) in the partition-batched map — WebP coverage costs decode CPU, not shuffles; same banded pair join as every signature tier",
      "tpch_q2_min_cost" -> "min-cost-per-part subquery aggregates partsupp once and joins back; region/nation/supplier dims broadcast",
      "tpch_q3_shipping" -> "date filters pushed to both fact scans; top-10 via TakeOrderedAndProject",
      "tpch_q7_volume" -> "the nation-pair predicate rides broadcast nation dims; each fact table shuffles once on its join key",
      "tpch_q8_share" -> "star join with broadcast dims; the per-year market share divides two conditional sums from ONE aggregated frame",
      "tpch_q11_stock" -> "the group-sum HAVING threshold is a scalar aggregate broadcast back — partsupp scans twice but never shuffles twice on value",
      "tpch_q12_priority" -> "shipmode + date bands pushed to the lineitem scan; one orderkey join; both priority counts are conditional sums in one aggregate",
      "tpch_q13_distribution" -> "customer LEFT OUTER orders with the comment filter as scan-level predicate; two-level aggregate (per-customer count, then histogram)",
      "tpch_q14_promo" -> "one shipdate month joins part; promo share is a conditional sum pair in a single ungrouped aggregate",
      "tpch_q15_top_supplier" -> "the revenue view aggregates lineitem once; max revenue is a 1-row broadcast joined back as the filter",
      "tpch_q16_supplier_cnt" -> "complaint suppliers excluded by anti join; distinct supplier counts per (brand,type,size) in one aggregate",
      "tpch_q17_small_qty" -> "per-part average quantity aggregated once and joined back to the same scan; brand/container filters pushed",
      "tpch_q20_promotion" -> "nested EXISTS chain as semi joins; the part-prefix filter prunes before any join",
      "tpch_q22_opportunity" -> "country-code substring predicate at the scan; NOT EXISTS as anti join; the balance cutoff is a scalar broadcast",
      "embed_ann_ivf" -> "coarse quantizer routes queries to probed cells; posting lists are a one-time cid-bucketed TABLE and the probe scan bucket-prunes to probed cells — never the whole corpus",
      "embed_ann_ivfpq" -> "bucket-pruned IVF cell probe + codegen'd ADC distance over PQ codes in a cid-bucketed posting table; exact rerank only on ADC survivors",
      "embed_knn_filtered" -> "the metadata predicate applies BEFORE any distance work — brute-force cosine only on the filtered slice",
      "embed_outliers" -> "one pass of centroid distances; the outlier threshold is a 1-row quantile aggregate broadcast back",
      "embed_pca" -> "the Gram matrix folds in ONE ungrouped aggregate over outer products (its exchanges carry d×d partials, not vectors); the projection back is a broadcast map — the corpus never shuffles by key",
      "embed_quantize" -> "Lloyd rounds over persisted assignments; the k-sized centroid map is the only collect",
      "events_funnel" -> "all funnel stages resolve inside one user_id-clustered window pass — one events exchange",
      "events_markov" -> "per-user session + lag windows feed a transition aggregate — exchanges carry slim (user, state) rows and the final matrix is state-pair-sized",
      "events_anomaly" -> "per-user mean/stddev window and the residual test share one user_id exchange",
      "events_window_sliding" -> "sliding windows explode map-side into overlapping buckets; one (user, window) exchange with partials",
      "events_json_props" -> "JSON extraction is a codegen'd projection feeding the group aggregate — no UDF, one exchange",
      "corpus_mix" -> "per-source quotas come from a source-sized aggregate broadcast back into one corpus pass",
      "corpus_upsert" -> "incoming batch merges against the corpus by ONE doc_id-keyed join; precedence is a per-key reduce, not a window sort",
      "corpus_release_diff" -> "two release ledgers joined on the content key; added/removed/changed classified in one pass",
      "pipeline_curate" -> "the composed curation chain fuses its stage predicates into few corpus passes — stages are projections, not rescans",
      "layout_zorder" -> "the Morton key is a codegen'd projection; the rewrite range-partitions on it so 2-D windows prune files",
      "group_pivot" -> "pivot lowers to ONE hash aggregate over (key × pivot-value) conditional sums — no per-value scans",
      "doc_pack_sequences" -> "greedy bin packing via a running-token-sum window over one ordered exchange",
      "text_gopher_rules" -> "every Gopher rule feature folds into one codegen'd projection; the verdict is a single filter pass",
      "multimodal_dedup_webp_lossy" -> "from-scratch VP8 key-frame luma decode (bool coder, token trees, WHT+IDCT, intra, loop filter) in the partition-batched map over jar fixtures; same banded Hamming pair join as every signature tier",
      "dedup_embed_cosine_exact" -> "the bounded exact twin: a doc_id-capped slice cross-compares via codegen'd dot — bounded by construction, anchors the LSH funnel's recall",
      "dedup_source_matrix" -> "pair frame joined twice to the slim (doc, source) map; the matrix aggregate is source-pair-sized — rides the one cached pair pass",
      "dedup_substr_strip" -> "passage-level strip: passage shingles bucket-join (df-capped), matched spans removed by a per-doc reduce — no doc self-join",
      "doc_decontaminate" -> "eval hashes broadcast by measured size; the corpus anti-joins map-side — decontamination never shuffles the corpus",
      "doc_fingerprint" -> "rolling-hash fingerprints are a pure codegen projection; one output sort is the only exchange",
      "corpus_shard_manifest" -> "hash-routed shard ids + bit_xor content checksum fold in ONE hash aggregate with map-side partials — the cheapest full-corpus integrity sweep",
      "corpus_histogram" -> "width_bucket histogram: one aggregate keyed by bucket id, bucket-count-sized output",
      "corpus_stats" -> "per-language report in one grouped aggregate; exact percentile is the one memory-heavy member (documented swap to approx at scale)",
      "corpus_shuffle" -> "deterministic shuffle = sort by md5(doc_id) — one range exchange, stable under input partitioning",
      "corpus_upsample" -> "weight-driven floor-or-floor+1 replication via a narrow Generate — rows multiply map-side, no extra exchange",
      "corpus_length_buckets" -> "log2-length buckets partition one row_number window; batch ids derive arithmetically — one bucket exchange",
      "corpus_epoch_schedule" -> "per-source epoch multipliers from a source-sized aggregate, broadcast back over one corpus pass",
      "corpus_dsir_select" -> "DSIR importance weights from two broadcast 1024-bucket models; top-k selection via one window — the corpus shuffles once",
      "corpus_trim" -> "percentile pair is ONE tiny aggregate broadcast back; the corpus itself stays a map-side filter",
      "window_rank" -> "rank over a clustered window: one hash exchange + in-partition sort, no join",
      "window_running" -> "running sum over a rows frame: one exchange shared with the ordering sort",
      "window_range_frame" -> "RANGE frame over event time: the frame bound evaluates inside the window operator — no self-join for neighbors",
      "group_rollup" -> "rollup lowers to Expand + ONE hash aggregate — grouping-set multiplicity is map-side row replication, not rescans",
      "group_cube" -> "cube's 2^k grouping sets ride the same single Expand + aggregate",
      "group_grouping_sets" -> "explicit grouping sets: Expand emits only the requested sets; one aggregate",
      "set_union" -> "UNION dedups via one hash aggregate over the unioned children — no join",
      "set_except" -> "EXCEPT plans as a left anti join on all columns",
      "join_theta" -> "non-equi predicate forces BroadcastNestedLoopJoin — correct and explicit; the row documents the deliberate cost",
      "join_full_outer" -> "full outer keeps a shuffled sort-merge join — both sides stream, neither builds",
      "embed_knn" -> "brute-force top-k: codegen'd cosine in one projection, TakeOrderedAndProject — the baseline the ANN tiers are judged against",
      "multimodal_thumbnail" -> "decode + area-average resize per record in the partition-batched map; output is slim (id, thumb) rows — media bytes never shuffle at full size")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.DumpPlans\"`. The shape\n")
    sb.append("properties called out per query are asserted in `PlanSpec.scala`;\n")
    sb.append(s"this file is the readable audit trail (plans from `$dir`).\n")
    picks.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
      graft.Caches.release(spark)
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    println(s"[dumpplans] wrote $outPath (${picks.size} queries)")
    spark.stop()
  }
}
