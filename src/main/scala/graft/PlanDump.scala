package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates docs/PLANS.md: formatted physical plans for the flagship
  * operators, the evidence that the scale-relevant plan properties hold
  * (pushdown, broadcast, collapsed windows, no single-partition exchange).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val notes = Seq(
      "lag_2d_partitioned" ->
        ("All three lag columns share one WindowSpec, so Catalyst's " +
          "CollapseWindow evaluates them in a single Window operator over " +
          "ONE hashpartitioning(user_id) exchange — the planner analogue " +
          "of the reference's single-buffer multi-row copy loop."),
      "lag_distributed" ->
        ("Global-order lag with NO Exchange SinglePartition: bucket ids " +
          "come from driver-pinned literal cut points (a deterministic " +
          "projection — fork-safe across the base/tails/pads subplans), " +
          "then per-bucket windows + boundary pads. Compare with the " +
          "naive global window, which funnels everything through one " +
          "partition."),
      "q1_pricing" ->
        ("Scan is column-pruned (6 of 11 columns in ReadSchema) and the " +
          "shipdate predicate is pushed to parquet (PushedFilters); " +
          "aggregation is partial (map-side) then final after the " +
          "exchange."),
      "q5_region_revenue" ->
        ("All four dimension joins are BroadcastHashJoins — only lineitem " +
          "streams; no shuffle of the fact table for joins, one exchange " +
          "for the final aggregate."),
      "embedding_neardup" ->
        ("Banded LSH candidates: one codegen'd hyperplane_sig pass per " +
          "row (the HyperplaneSigExpr kernel unpacks the vector once for " +
          "all 64 planes), an EQUI-join on (band, key) carrying ONLY " +
          "(id, band, key) — vectors and norms re-join by id for the " +
          "surviving pairs, so the band shuffle never moves the bands× " +
          "vector payload. Exact rounded-cosine verify per candidate; no " +
          "BroadcastNestedLoopJoin anywhere — the all-pairs form exists " +
          "only as the recall yardstick in tests."),
      "dedup_minhash" ->
        ("Narrow signature stage (word_shingles + minhash_sig batch " +
          "kernels, one md5 per shingle), then only (doc_id, band, " +
          "bucket) travels through the LSH shuffles; candidate pairs " +
          "re-join the shingle arrays for exact Jaccard verify."),
      "ngram_jaccard" ->
        ("Sorted-prefix AllPairs: the prefix is a pure projection " +
          "(xx_sorted_hashes kernel + slice), candidates form on an " +
          "equi-join of prefix hashes with length + PPJoin positional " +
          "filters, then exact verify on the full sorted-hash arrays. " +
          "No per-document broadcast."),
      "seq_pack" ->
        ("Global prefix sum without a single-partition window over the " +
          "data: deterministic literal-boundary buckets (no range " +
          "exchange at all — the per-bucket window's hash exchange is " +
          "the only data shuffle), per-bucket running sums, and a " +
          "broadcast numBuckets-row base-offset frame (the only " +
          "single-partition window touches those ~32 rows)."),
      "corpus_shuffle" ->
        ("Deterministic shuffle-before-pack: the md5 shuffle key is a " +
          "pure projection, buckets come from driver-pinned literal " +
          "quantiles of that key, and the pack assignment is seq_pack's " +
          "two-pass prefix sum under the (key, id) composite order — no " +
          "global sort, no range exchange, no single-partition window " +
          "over the data."),
      "rep_stats" ->
        ("Repetition quality signals: duplicate-n-gram fractions are " +
          "narrow array expressions in the scan stage; top-token " +
          "coverage is the word-count shape — explode feeds two " +
          "map-side-combinable aggregates, so both exchanges carry " +
          "(doc, token-hash, count)-sized rows, never token lists."),
      "multimodal_meta" ->
        ("Pure projection over the binary column (octet_length, md5, " +
          "magic-byte sniff) — single scan, whole-stage codegen, no " +
          "DeserializeToObject/mapPartitions, payload never leaves the " +
          "scan stage."),
      "asof_join" ->
        ("Union + last-observation window: one hashpartitioning(key) " +
          "exchange over |L|+|R| rows, a per-key sort, zero row " +
          "amplification — the shuffle shape of a sort-merge join, unlike " +
          "a range join which would explode candidates."),
      "asof_join_forward" ->
        ("Same union machinery scanning toward the FUTURE — as a running " +
          "last() over a reversed (t desc, side desc) order, i.e. Spark's " +
          "incremental unbounded-PRECEDING frame. The naive " +
          "first().over(current..unboundedFollowing) frame recomputes per " +
          "row — O(partition^2), a measured multi-hour stall on the 10x " +
          "anchor's 200k-row keys before the round-6 fix."),
      "funnel_steps" ->
        ("Chained running-min step windows share ONE " +
          "hashpartitioning(user_id) exchange and one sort (stacked " +
          "Window operators, no per-step shuffle); the per-user reduce " +
          "is a combinable hash aggregate over the same partitioning, " +
          "then a single-row global reduce explodes into the per-step " +
          "output. Spec-fenced to exactly one user-keyed exchange."),
      "lag_interp" ->
        ("Both neighbor scans are incremental unbounded-PRECEDING " +
          "frames — the look-ahead side via a reversed-order running " +
          "last() (the asof_join_forward lesson) — so the plan is one " +
          "(user) exchange with an ascending and a descending sort, " +
          "never a quadratic frame."),
      "retention_cohorts" ->
        ("First-event cohort agg and distinct-activity agg share the " +
          "user_id partitioning; the join is user-sized and the final " +
          "aggregate matrix-sized — event rows shuffle once."),
      "dedup_substrings" ->
        ("Positional 20-gram hashes from the codegen'd kernel; the df " +
          "count joins on the 8-byte gram hash (strings never shuffle), " +
          "and maximal duplicated runs group via pos - row_number() — " +
          "window over (doc, run) partitions, candidate-scale rows only."),
      "decontaminate" ->
        ("Probe (eval-suite) shingle hashes are the tiny side: both the " +
          "id anti-join and the hash join are broadcasts, so corpus " +
          "shingles never reach a join exchange. A driver-built Bloom " +
          "filter over the probe hashes is pinned as a binary literal and " +
          "Catalyst pushes its might_contain Filter below both joins into " +
          "the corpus scan's codegen stage — the overwhelmingly " +
          "non-matching exploded shingle rows die on a bitset probe " +
          "before any hash-relation lookup; false positives proceed to " +
          "the exact join, so output is unchanged."),
      "topk_ngrams" ->
        ("Corpus-wide heavy hitters: explode → ONE hash aggregate with " +
          "map-side partial_count (each map task emits one row per " +
          "distinct n-gram, so hot n-grams arrive at the reducer once " +
          "per task, not once per occurrence), then " +
          "TakeOrderedAndProject — a per-partition top-k merged on the " +
          "driver. No global sort, no single-partition exchange."),
      "tfidf_terms" ->
        ("Per-doc (term, tf) counts are computed by the word_counts " +
          "kernel IN the scan stage (the grouping key contains the doc " +
          "id — per-document work never needed a corpus exchange); the " +
          "term df is a map-side-combinable aggregate attached back " +
          "through a PINNED ShuffledHashJoin on xxhash64(term) (no " +
          "side can be broadcast off the underselling pre-explode " +
          "estimate; both consumers share the hash exchange via " +
          "runtime reuse; AQE-skew-splittable probe); N rides in as a " +
          "one-row broadcast; the final top-k window partitions by " +
          "document — millions of independent partitions at scale."),
      "corpus_profile" ->
        ("The per-source datasheet: one scan computing narrow per-row " +
          "stats feeds ONE stratum-keyed aggregate; no joins. The exact " +
          "percentiles buffer per-stratum values on the reducer — the " +
          "documented trade for an oracle-exact answer, with " +
          "approx_percentile as the swap-in past executor memory."),
      "dedup_spans" ->
        ("Passage-level reuse: the winnow_fps kernel runs inside the " +
          "scan stage (no explode/Window/DISTINCT exchanges); the " +
          "document-frequency cap kills corpus-wide boilerplate " +
          "fingerprints before the self-join with per-fp fan-out " +
          "bounded at maxDf²; every fp-keyed consumer (df aggregate, " +
          "prune probe, both self-join sides) is a PINNED " +
          "ShuffledHashJoin over the same hash(fp) partitioning — no " +
          "side can be broadcast on a size guess (the r6 bimodal " +
          "9s/18s bug). The pin buys broadcast safety, not exchange " +
          "reuse: the df aggregate's exchange sits above a partial " +
          "HashAggregate while the probe's sits above the raw kernel " +
          "projection, so they do NOT canonicalize equal and the " +
          "winnow kernel recomputes per consumer — the right trade, " +
          "since no corpus-scale frame is ever cached (the 100×-anchor " +
          "MemoryStore-leak lesson)."),
      "dedup_semantic" ->
        ("SemDeDup: nearest-centroid assignment is a pure codegen'd " +
          "projection against the literal-pinned (sample-fitted) index; " +
          "the only data-sized exchange is the within-list self-join " +
          "keyed on list_id — nlist bounds per-list fan-out; the greedy " +
          "lowest-id-wins rule needs no connected-components loop."),
      "embedding_pq" ->
        ("Product quantization encode: one PqCodesExpr kernel call per " +
          "row covers all 8 subspaces against literal-pinned codebooks " +
          "— no exchange of any kind after the scan (32× compression " +
          "as a pure projection); the sampled codebook fit runs ONE " +
          "job per Lloyd pass for all subspaces."),
      "novelty_score" ->
        ("Per-doc corpus-unique n-gram fraction: the ngram_xx_set " +
          "kernel emits each doc's DISTINCT n-gram hashes in the scan " +
          "stage (no distinct exchange — the doc id is in the distinct " +
          "key); the per-ngram document frequency is a map-side-" +
          "combinable aggregate attached back through a PINNED " +
          "ShuffledHashJoin (kept a JOIN, not a window count, so AQE " +
          "can split a stopword-grade hot key — and never a broadcast " +
          "of the 23M-row gram side off the pre-explode estimate); the " +
          "per-doc average is combinable. No sort anywhere."),
      "dedup_incremental" ->
        ("Daily-ingest decision: the incoming batch's fingerprints " +
          "BROADCAST (decontaminate's probe shape) and the deduped " +
          "corpus streams through the probe without shuffling, pruned " +
          "to the fingerprint projection; batch-internal dups collapse " +
          "min-id-first like dedup_exact."),
      "similarity_ivfpq" ->
        ("IVF+PQ composed (residual/IVFADC encoding): candidates carry " +
          "(id, list_id, m-byte codes of v − centroid(list)) — the " +
          "vector is pruned after the assignment/residual/encode " +
          "projection (all literal-centroid, no extra shuffle); queries " +
          "broadcast into the list_id-keyed probe join, subtract the " +
          "probed list's centroid, and ADC-score only that list's " +
          "codes. Candidate volume ~N·nprobe/nlist, scored payload 32× " +
          "smaller than vectors; the PQ fit reads a checkpointed " +
          "O(sample) residual frame."),
      "dedup_spans_stored" ->
        ("The persisted-store form of the span ingest check. The " +
          "registered query builds the store in-plan (oracle " +
          "self-containment), so the df aggregate + attach join appear " +
          "here — at a real deployment those ran once at corpus ingest " +
          "and the probe reads (doc_id, fp, df) parquet with the " +
          "df <= maxDf cap PUSHED TO THE SCAN (ProbeSigStore: 1.00s " +
          "persisted vs 2.25s direct at a 1% zsf1 increment)."),
      "dedup_spans_incremental" ->
        ("Passage-level ingest reuse: the increment's winnow fingerprint " +
          "keys broadcast against the corpus fingerprint stream (the " +
          "codegen'd one-pass winnow kernel — narrow, per-doc), so " +
          "corpus rows only ever pass through broadcast probes. The " +
          "maxDf boilerplate cap runs post-probe, where the matched " +
          "count per fingerprint equals its corpus df — no corpus-wide " +
          "aggregate. Fenced in PlanAuditSpec."),
      "embedding_neardup_incremental" ->
        ("The vector-modality ingest near-dup twin: the increment's " +
          "hyperplane band keys broadcast against the corpus's banded " +
          "signature frame (ids only — no vector payload), candidate " +
          "ids broadcast back against the corpus scan for the exact " +
          "cosine verify. Same no-corpus-shuffle contract as " +
          "dedup_minhash_incremental, fenced in PlanAuditSpec."),
      "dedup_minhash_incremental" ->
        ("Near-dup daily ingest: the increment's (band, bucket) keys " +
          "BROADCAST against the corpus's banded signature frame, so " +
          "corpus rows only ever stream through broadcast probes " +
          "(signature scan → key probe; candidate ids → shingle fetch " +
          "for the exact-Jaccard verify). Every ShuffleExchange in the " +
          "plan sits above a broadcast probe or reads only the " +
          "checkpointed increment — candidate-scale by construction " +
          "(fenced in PlanAuditSpec)."),
      "ingest_clean" ->
        ("The daily-ingest pipeline in ONE DAG (incremental twin of " +
          "corpus_clean): quality gate on the increment scan, then the " +
          "exact and near duplicate checks against the corpus — all " +
          "corpus touches are broadcast probes (no corpus shuffle), " +
          "and only GATED docs reach the signature work. The accept " +
          "bit composes the three decisions per incoming doc."),
      "corpus_clean_near" ->
        ("corpus_clean's near-dup-aware sibling: the gate + exact-dedup " +
          "survivors checkpoint as the same NARROW frame (text never " +
          "crosses that exchange); survivor text re-enters via ONE " +
          "id-keyed semi join and runs the standard banded-LSH pipeline " +
          "(codegen'd signature kernel, ids-only band shuffles, bucket " +
          "cap, exact verify); the greedy smaller-id-wins drop is an " +
          "anti join bounded by the near-dup rate — no " +
          "connected-components loop on the clean path."),
      "events_debounce" ->
        ("Gap-based burst dedup: the sessionize-trick burst id (lag + " +
          "running sum) over ONE (user, type)-keyed exchange; the burst " +
          "aggregate's grouping keys EXTEND the window partitioning, so " +
          "the existing hash partitioning satisfies its clustered " +
          "distribution and the plan carries NO second exchange."),
      "sample_quality_tiers" ->
        ("Quality-quantile curriculum sampling with NO global window: " +
          "tier thresholds come from one bounded-memory approx_percentile " +
          "aggregate broadcast back as a 1-row scalar frame " +
          "(BroadcastNestedLoopJoin over a single row); tier assignment " +
          "and the md5 keep-draw are narrow per-row compute on the same " +
          "scan that scored the documents."),
      "split_leakage_free" ->
        ("Leakage-free split: the near-dup closure (size-adaptive CC) " +
          "feeds one doc-keyed left join; the split draw is a narrow md5 " +
          "projection on the cluster representative — grouping duplicate " +
          "clusters into one split costs nothing beyond the dedup " +
          "pipeline the corpus already runs."),
      "series_acf" ->
        ("Per-series ACF: the five lag columns collapse into ONE Window " +
          "operator, and the per-series moment aggregate's grouping key " +
          "equals the window partitioning — a single " +
          "hashpartitioning(user_id) exchange feeds both. Correlations " +
          "are guarded-moment forms (no built-in corr): ANSI mode " +
          "throws on corr's internal division over a zero-variance " +
          "frame."),
      "stl_seasonal" ->
        ("Seasonal decomposition in exact integer micro-units: trend " +
          "window, seasonal aggregate and join-back all share the " +
          "user partitioning (grouping keys extend the window keys; the " +
          "join is co-partitioned) — one exchange end to end. Integer " +
          "arithmetic because fixed-point inputs land double means " +
          "exactly on decimal rounding boundaries where engines' " +
          "round() models disagree."),
      "bm25_search" ->
        ("BM25: corpus tokens explode in the scan stage and immediately " +
          "broadcast-join the literal query-term list — the corpus " +
          "never shuffles at full width; N/avgdl enter as broadcast " +
          "1-row scalar frames; the per-query top-k is a window over " +
          "candidate-scale rows only."),
      "dedup_editdist" ->
        ("Edit-distance near-dedup: LSH band candidates (ids-only " +
          "shuffles, bucket caps) re-join 400-char prefixes for the " +
          "few candidate pairs; the Levenshtein verify is the " +
          "threshold DP form, after a prefix-length band filter."),
      "range_join_events" ->
        ("Point-in-interval range join as an EQUI join: intervals " +
          "explode to their covering time buckets (bounded by the " +
          "in-plan spread assert), points hash to exactly one bucket, " +
          "the residual BETWEEN runs after the (bucket, user_id) " +
          "shuffle join — never a BroadcastNestedLoopJoin/cartesian."),
      "dedup_spans_probe_updated" ->
        ("The delta-append span probe: base store scanned twice " +
          "(pushed df<=maxDf candidate scan + the unfiltered " +
          "base-df lookup for delta fps), NEVER shuffled; the " +
          "checkpoint-truncated delta branch unions in as an " +
          "ExistingRDD leaf; effective df (base + delta rows per fp) " +
          "derives lazily for probed fps only. No store rewrite " +
          "anywhere in the timed plan."),
      "video_neardup" ->
        ("Video content near-dedup: clips assemble+demux+hash in ONE " +
          "narrow mapPartitions pass (per-frame dHash majority-voted " +
          "into a 64-bit clip fingerprint — only 8 bytes per clip " +
          "leave the partition); the Hamming band self-join shuffles " +
          "(id, band, key) rows only, bucket-capped."),
      "html_extract_main" ->
        ("Main-content extraction: segmentation, per-block scoring " +
          "(word count + anchor-word link density), and the " +
          "document-order join are all codegen'd higher-order array " +
          "functions in the scan-stage projection — one narrow pass, " +
          "no UDF, no shuffle, no join."),
      "dedup_lines_corpus" ->
        ("Corpus-wide line dedup: line STRINGS never cross an " +
          "exchange — the exploded frame ships (xxhash64(line), " +
          "doc_id·2^21 + pos) 16-byte rows into one combinable " +
          "HASH-aggregable min (the packed long replaces " +
          "min(struct), which planned a SortAggregate sorting every " +
          "line row on both sides of its exchange), the owner longs " +
          "ARE the surviving positions (no re-join against the " +
          "exploded frame), and cleaned text rebuilds by INDEXING " +
          "each doc's own line array at the sorted kept positions."),
      "warc_response_extract" ->
        ("Raw-crawl to clean text in one DAG: response records " +
          "stream per-file-parallel with the HTTP envelope split in " +
          "the same per-record pass (no second scan), and the " +
          "justext main-content extraction runs as codegen'd array " +
          "functions over the recovered body — the crawl hop adds " +
          "no shuffle and no join to html_extract_main's plan."),
      "domain_filter" ->
        ("Domain-level gating: ONE corpus scan into a domain-count-" +
          "sized combinable (count, mean-quality) aggregate, one " +
          "domain-keyed attach-back join with NO broadcast hint — " +
          "domain tables reach tens of millions of rows at crawl " +
          "scale, and hot domains skew the join; AQE's size-based " +
          "broadcast and skew-split both apply."),
      "sample_dsir" ->
        ("DSIR importance scoring: ONE codegen'd kernel scan emits " +
          "every feature's bucket id (unigram+bigram md5 folds — " +
          "no HOF lambda, no feature strings); a 10k-bucket " +
          "combinable agg fits both models, the log-ratio table and " +
          "quartile threshold broadcast as scalar frames, and the " +
          "per-doc score is ONE combinable aggregate — the corpus " +
          "never shuffles, the doc attach-back carries no hint."),
      "quality_model_score" ->
        ("Learned-filter scoring: the vocabulary-sized weight table " +
          "(top-2000 TakeOrdered cut + md5-fold weights) broadcasts; " +
          "the corpus token stream joins it map-side and feeds ONE " +
          "combinable per-doc aggregate — nothing wider than " +
          "(doc_id, weight) partials crosses the exchange."))

    val md = new StringBuilder
    md.append("# Physical plans of flagship operators\n\n")
    md.append("Generated by `sbt \"runMain graft.PlanDump\"` at sf0.001; ")
    md.append("regenerate after plan-affecting changes.\n")
    notes.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dir)
      // force AQE finalization so the plan shown is the executed one
      df.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      md.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), md.toString)
    println("WROTE docs/PLANS.md")
    spark.stop()
  }
}
