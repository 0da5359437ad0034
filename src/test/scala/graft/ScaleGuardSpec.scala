package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Structural scale guards over EVERY registered query's optimized plan.
  *
  * These lock in the r3/r4 scale fixes as invariants instead of one-off
  * audits: a future query that funnels scaling data through a single task
  * (partitionless window) fails here at sf0.001, long before it shows up
  * as a 100×-scale straggler.
  */
class ScaleGuardSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed a partitionless window, each with the documented
    * bounded-input justification. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q29_biggest_drop" -> "window input is per-period averages, bounded by the calendar (Insights.scala q29 doc)",
    "q168_hist_quantiles" -> "running sum over the MERGED histogram cells, bounded at 64 rows (TextStats.scala q168 doc)",
    "q190_neyman_alloc" -> "largest-remainder rank over STRATUM rows (one per market segment), bounded by the segment domain (Curation.scala q190 doc)",
    "q213_time_to_convert" -> "histQuantiles' two windows with the constant 'all' group folded partitionless: phase 1 runs over the COARSE-bucket histogram (gap domain div 10000 rows), phase 2 over one boundary bucket's distinct values — both value-domain-bounded, never the user count (Robust.histQuantiles doc)",
    "q202_user_skyline" -> "skyline2d's coarse suffix-min walk runs over one row per 10000-wide purchase-count bucket (distinct-p domain div coarseWidth rows, never the user count); the per-p window partitions by bucket with a frame hard-capped at coarseWidth rows (Robust.skyline2d doc)",
    "q242_ab_effect_auc" -> "the doubled-rank cumulative window runs over the per-user purchase-count VALUE HISTOGRAM (one row per distinct count — bounded by max user activity, never the user count; Events.scala q242 doc)",
    "q250_token_mass_quantiles" -> "the cumulative-mass window runs over the doc-LENGTH HISTOGRAM (one row per distinct n_tokens — value-domain-bounded, never the doc count; TextStats.scala q250 doc)",
    "q286_ivf_balance" -> "rank/count windows over the CELL-SIZE table — numCentroids (16) rows, codebook-bounded (Similarity.scala q286 doc)",
    "q292_leadlag" -> "the best-lag argmax window runs over the 15-row LAG frame (one row per lag in [-7, 7]) — spine-bounded, never the day or event count (Events.scala q292 doc)",
    "q294_spend_gini" -> "the cumulative-count window runs over the spend-cents VALUE HISTOGRAM (one row per distinct spend — value-domain-bounded, never the user count; Events.scala q294 doc)",
    "q297_rfm_segments" -> "the three quartile-code windows each run over a per-dimension VALUE HISTOGRAM (distinct days / order counts / spend cents — value-domain-bounded, never the customer count; Robust.quartileCodes doc)",
    "q302_engagement_deciles" -> "the decile-code window runs over the events-per-user VALUE HISTOGRAM and the Pareto cumulative over the <= 10 decile rows — both bounded, never the user count (Events.scala q302 doc)",
    "q327_return_time" -> "histQuantiles' windows with the constant 'return_s' group folded partitionless run over the return-gap VALUE HISTOGRAM — gap-domain-bounded, never the session count (the q213 class; Events.scala q327 doc)",
    "q328_decile_migration" -> "the two half-period code windows each run over an events-per-user VALUE HISTOGRAM (the q302 class — value-domain-bounded, never the user count; Events.scala q328 doc)",
    "q330_tenure_hazard" -> "the at-risk suffix-sum window runs over the TENURE-WEEK HISTOGRAM — calendar-bounded (observed span div 7 rows), never the user count (Events.scala q330 doc)",
    "q335_heaps_curve" -> "the cumulative window runs over the ≤ 10 DECILE rows — fixed-checkpoint-bounded, never the doc or token count (TextStats.scala q335 doc)",
    "q337_position_attribution" -> "the share-denominator window runs over the CHANNEL-bounded credit table (≤ |types| rows), never the touch count (Events.scala q337 doc)",
    "q340_t_closeness" -> "the global cumulative window runs over the PRIORITY domain (≤ 5 rows) — sensitive-value-domain-bounded, never the order count (Curation.scala q340 doc)",
    "q346_skew_report" -> "the p99 cumulative window runs over the key-FREQUENCY value histogram (one row per distinct frequency — value-domain-bounded, never the key count; Skew.scala q346 doc)")

  private def globalWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  test("no query plan has an undocumented partitionless window") {
    // Eagerly-executing queries are excluded — invoking them runs jobs
    // (q49 writes the warehouse; q48 runs the surrogate-key
    // persist+count+checkpoint; q60/q61/q63 materialize pair sets and
    // run the propagation loop; q69 materializes the session intervals)
    // rather than just building a plan. Their components ARE covered:
    // the surrogate path via StarSpec + the dim test below, the pair
    // pipelines via q32/q34/q35/q59, sessionization via q51, and their
    // final plans are small aggregates/checkpoint scans.
    // (q101 runs the whole Lloyd training loop at construction; its final
    // frame is literal driver rows. Its per-round plans are q37's ranking
    // shape — covered via q37/q99 — plus lloydCodebook, whose partial-sum
    // shape SimilaritySpec pins directly.)
    // (q102/q104 likewise run the BPE merge loop eagerly at construction
    // — whichever is built first pays the shared bpeMemo; per-iteration
    // plans are vocabulary-sized pair aggregates + limit(1), the q44
    // shape, and q104's final plan is a broadcast join + aggregate.)
    // (q111 checkpoints its shared seed encoding + trained codebook at
    // construction — the q101 pattern; its per-arm plans are q109's
    // shape, covered there.)
    // (q113 checkpoints its ranked flagged-window frame at construction
    // — its component plans are q105/q112's, covered there; every
    // window it adds is hash- or doc-partitioned.)
    // (q114 writes + appends the PQ index at construction — the q49
    // write-path pattern; its search plans are q110's shape plus the
    // PartitionPruningSpec index-only-scan case.)
    // (q115 runs the whole versioned write→compact→vacuum lifecycle at
    // construction — q49's class; its read plans are plain count
    // aggregates over the resolved snapshot.)
    // (q116 runs the mean pass + 3 power-step aggregations at
    // construction — the q101 driver-loop class; its final frame is
    // literal driver rows, and each step is a 64-group narrow integer
    // aggregation with no window at all.)
    // (q248 runs the q61 propagation loop on the contracted batch graph
    // at construction — q61's class; its component plans are q61's)
    val eager = Set("q48_dim_waktu", "q49_star_roundtrip", "q60_embed_lsh_recall",
      "q61_dedup_components", "q248_incremental_components",
      "q63_minhash_recall", "q69_range_join",
      "q101_lloyd_loop", "q102_bpe_train", "q104_bpe_compression",
      "q106_bpe_heldout", "q111_pq_trained_recall",
      "q113_span_excise_keep_first", "q114_pq_index_recall",
      "q115_versioned_star", "q116_pca_power", "q117_pca_variance",
      "q118_pca_deflate",
      // q163 runs the 20-epoch perceptron driver loop at construction —
      // the q101/q102 class; its per-epoch plans are broadcast joins +
      // narrow integer aggregations and its final frame is a groupBy
      // with no window at all
      "q163_quality_perceptron",
      // q308 reuses q163's memoized training at construction; its own
      // windows are the histogram-bounded rankCodes map
      "q308_score_calibration",
      // q200 runs the MMR greedy loop at construction (pool + pairwise
      // cosines collected — kilobytes); its pool plan is q36's
      // TakeOrderedAndProject shape with a 1-row query BNLJ ride, and
      // its final frame is literal driver rows
      "q200_mmr_select",
      // q212 counts the basket universe at construction (one scalar
      // job); its pair join is equi on (user, day) and its rollup is
      // #types²-sized — no window anywhere
      "q212_association_rules")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => eager(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        if (globalWindows(plan).nonEmpty && !globalWindowAllowed.contains(name)) Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"partitionless Window (single-task at scale) in: ${offenders.mkString(", ")}")
  }

  test("q82's exact ordered scan stays inside the boundary bucket") {
    // The q82 scale path accepts whole score-quantile buckets from their
    // aggregates; only the boundary bucket may be sorted. A regression to
    // the naive per-lang cumulative window (one task per language — the
    // dominant language IS the corpus at 100 TB) would partition a window
    // by lang alone: require every window to partition by ≥ 2 columns
    // (lang AND bucket).
    val plan = SparkEntry.queries("q82_token_budget")(spark, sfDir)
      .queryExecution.optimizedPlan
    val narrow = plan.collect { case w: LWindow if w.partitionSpec.size < 2 => w }
    assert(narrow.isEmpty,
      s"q82 window not bucket-scoped: ${narrow.map(_.partitionSpec).mkString("; ")}")
  }

  test("banded dedup candidate joins never degrade to nested-loop/cartesian") {
    // q32/q33/q34's whole point is that candidates come from EQUI joins on
    // band/chunk/shingle keys (hash-partitionable at 100 TB). A condition
    // tweak that turns one into BroadcastNestedLoopJoin/CartesianProduct
    // would still pass correctness — this pins the plan shape. (q35 is the
    // declared all-pairs baseline, so it is exempt.)
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // (q59 is not listed although its candidate join is also equi: since
    // r5 it materializes its signature frame eagerly — constructing it
    // runs jobs — and historically its plan carried a legitimate
    // BroadcastNestedLoopJoin for the one-row broadcast of the 16 plane
    // constants, indistinguishable from a scaling nested loop here.)
    val banded = Seq("q31_dedup_exact", "q32_dedup_minhash_lsh",
      "q33_dedup_simhash", "q34_dedup_ngram_jaccard", "q105_span_dedup",
      "q112_span_excise")
    val offenders = banded.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
      val bad = plan.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec => j
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"non-equi candidate join in: ${offenders.mkString(", ")}")
  }

  test("r10 queries: no cartesian product; q143's model join broadcasts") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    // q142/q144's candidate joins are c_id-equi (bucket-bounded) and
    // q145's all-pairs arm is a declared broadcast baseline — all three
    // legitimately carry the 16-row centroid BNLJ from probe ranking,
    // so the guard here is the stronger degradation (CartesianProduct:
    // both sides shuffled to every pairing — never legitimate).
    val r10 = Seq("q140_ivf_dv_search", "q142_semdedup", "q143_dsir_weights",
      "q144_semantic_contamination", "q145_semcon_recall", "q141_bloom_append",
      "q139_stats_append")
    val cartesian = r10.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
      if (plan.collect { case c: CartesianProductExec => c }.nonEmpty) Some(name)
      else None
    }
    assert(cartesian.isEmpty, s"cartesian product in: ${cartesian.mkString(", ")}")
    // q143's scoring join must stay a broadcast hash join on the
    // 1024-row model — a sort-merge regression would shuffle the whole
    // exploded token stream on the bucket key
    val q143 = SparkEntry.queries("q143_dsir_weights")(spark, sfDir)
      .queryExecution.sparkPlan
    assert(q143.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "expected q143's model join to be a broadcast hash join")
  }

  test("sketch/merge/evolution queries: no cartesian; broadcast where pinned") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    val fresh = Seq("q147_cms_topk", "q148_nb_langid", "q149_schema_evolution",
      "q150_merge_upsert", "q151_cms_merge", "q152_hll_registers",
      "q153_merge_versioned", "q155_hll_merge", "q156_bpe_model_serve",
      "q157_decontaminate", "q158_self_excise", "q159_checked_commit")
    val degraded = fresh.flatMap { name =>
      val p = plan(name)
      if (p.collect { case c: CartesianProductExec => c
                      case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
        Some(name)
      else None
    }
    assert(degraded.isEmpty, s"cartesian/nested-loop join in: ${degraded.mkString(", ")}")
    // the kilobyte sides must broadcast: q147/q151's ≤1024-cell sketch
    // onto the probes, q148's dense model onto the token stream — a
    // sort-merge regression would shuffle the exploded corpus instead
    Seq("q147_cms_topk", "q151_cms_merge", "q148_nb_langid").foreach { name =>
      assert(plan(name).collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"expected a broadcast hash join in $name")
    }
  }

  test("r12 queries: no cartesian; q165 keeps the partial WindowGroupLimit") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    // q168/q170/q171 are excluded from the BNLJ scan: their cross joins
    // carry the 3-row probe frame / 1-row corpus-stats and totals —
    // documented kilobyte sides (the q29-class bounded exception; q170's
    // is the same broadcast(stats) ride the q160 lexical arm pins)
    val fresh = Seq("q165_weighted_sample", "q166_cdc_chunk_dups",
      "q167_chunk_dup_docs", "q169_chunk_novelty", "q172_chunk_index_dups",
      "q174_rate_anomaly", "q175_k_anonymity", "q180_exif_resize",
      "q181_source_cap", "q182_cov_merge")
    val degraded = fresh.flatMap { name =>
      val p = plan(name)
      if (p.collect { case c: CartesianProductExec => c
                      case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
        Some(name)
      else None
    }
    assert(degraded.isEmpty, s"cartesian/nested-loop join in: ${degraded.mkString(", ")}")
    Seq("q168_hist_quantiles", "q170_prf_expansion", "q171_bloom_membership",
        "q173_chunk_staleness", // q173's BNLJ = its two 1-row aggregates
        "q176_codebook_refresh", // q176's BNLJ = the 16-row centroid ride
        "q177_integrity_audit", // q177's BNLJ = four 1-row audit aggregates
        "q178_cluster_mix", // q178's BNLJ = the centroid ride + 1-row denom
        "q179_epoch_sample") // q179's BNLJ = q178's centroid ride + denom
      .foreach { name =>
        assert(plan(name).collect { case c: CartesianProductExec => c }.isEmpty,
          s"$name cross joins must broadcast their kilobyte sides, not cartesian")
      }
    // the q165 scale contract: bottom-k per stratum prunes BEFORE the
    // exchange — each map task ships <= k rows per lang, never the corpus
    val wgl = plan("q165_weighted_sample")
      .collect { case w: WindowGroupLimitExec => w }
    assert(wgl.size >= 2, s"expected partial+final WindowGroupLimit, got ${wgl.size}")
  }

  test("r13 queries: no cartesian/nested-loop degradation") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    // q190 is excluded from the BNLJ scan: its cross join carries the
    // 1-row (total-weight, leftover) aggregate onto 5 stratum rows —
    // the documented kilobyte-side exception (q173/q177 class); the
    // cartesian check below still applies to it. q187 is excluded
    // entirely: constructing it runs the component-propagation loop
    // (the q61 eager-query class) and its joins ride vocabulary-sized
    // checkpointed frames.
    val fresh = Seq("q183_fuzzy_entity", "q184_mad_outliers",
      "q185_jsonl_quarantine", "q186_ewma_rate", "q188_bigram_lm",
      "q189_winsor_stats", "q195_linear_attribution", "q196_dp_release",
      "q197_table_profile", "q198_ab_test", "q199_join_cardinality",
      "q201_session_transitions", "q207_cusum_changepoint",
      "q208_daily_trend", "q210_grouping_sets", "q211_pivot_matrix")
    val degraded = fresh.flatMap { name =>
      val p = plan(name)
      if (p.collect { case c: CartesianProductExec => c
                      case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
        Some(name)
      else None
    }
    assert(degraded.isEmpty, s"cartesian/nested-loop join in: ${degraded.mkString(", ")}")
    assert(plan("q190_neyman_alloc")
      .collect { case c: CartesianProductExec => c }.isEmpty,
      "q190's totals ride must broadcast, not cartesian")
    // q193 is the SWEEP-LINE rewrite — its whole point is that NO pair
    // join exists in the plan (the oracle is the quadratic join; the
    // r13 bench measured the blocked-join form at 6.8 s vs 1.0 s).
    // A regression reintroducing any join degradation fails here.
    val q193 = plan("q193_interval_overlap")
    assert(q193.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q193's sweep must not reintroduce a pair join")
    // q194 carries two documented 1-row BNLJ rides (code bounds + the
    // true-rows anchor); only the cartesian degradation is forbidden
    assert(plan("q194_zorder_layout")
      .collect { case c: CartesianProductExec => c }.isEmpty,
      "q194's bounds/truth rides must broadcast, not cartesian")
    // q202's dominance anti-joins are broadcast theta joins on the
    // 64-cell table and the output-bound frontier band — legitimate
    // BNLJs; only cartesian (both sides shuffled to every pairing) is
    // a degradation
    assert(plan("q202_user_skyline")
      .collect { case c: CartesianProductExec => c }.isEmpty,
      "q202's dominance anti-joins must broadcast, not cartesian")
    // q209's spread ride is a 1-row × 1-row BNLJ (the q173 class)
    assert(plan("q209_bootstrap_ci")
      .collect { case c: CartesianProductExec => c }.isEmpty,
      "q209's spread ride must broadcast, not cartesian")
  }

  test("r15 queries: q232 carries no cartesian/BNLJ; q231's only BNLJ is the bounded panel ride") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    // q232's joins: the memoized broadcast label map + two fp-keyed
    // windows on ONE shuffle — any BNLJ/cartesian is a degradation
    assert(plan("q232_doc_lineage").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q232 must stay window + broadcast-hash shaped")
    // q231's cross join is the ≤60-row broadcast mining panel over one
    // target scan (the q36 bounded-queries class, documented in its
    // scaladoc); only the cartesian degradation (both sides shuffled)
    // is forbidden
    assert(plan("q231_margin_mining").collect {
      case c: CartesianProductExec => c }.isEmpty,
      "q231's panel ride must broadcast, not cartesian")
    // q233's BNLJs are the 16-row centroid ride (the q37 class); its
    // candidate join is an EQUI join on the probed bucket id
    assert(plan("q233_margin_ivf").collect {
      case c: CartesianProductExec => c }.isEmpty,
      "q233's centroid/panel rides must broadcast, not cartesian")
    // q234: the LM joins ride broadcast vocabulary tables, the median
    // joins are lang-keyed equi — no BNLJ, no cartesian; its windows
    // are lang-partitioned over value histograms (the q184 rule)
    assert(plan("q234_ppl_filter").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q234 must stay broadcast-hash + value-histogram shaped")
    // q236's one non-equi join is the exact AUDIT's calendar-bounded
    // day frame broadcast over the (day, user) pairs (a documented
    // kilobyte ride); the sketch path itself is windows + hash joins
    assert(plan("q236_rolling_actives").collect {
      case c: CartesianProductExec => c }.isEmpty,
      "q236's audit day-frame ride must broadcast, not cartesian")
    // q235 rides q229's cells: broadcast totals join + a 16-row-per-type
    // ranking window — no BNLJ, no cartesian
    assert(plan("q235_drift_attribution").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q235 must stay broadcast-hash + bounded-window shaped")
  }

  test("r15 batch 2: q240-q245 keep their documented join/window shapes") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    // q240: pure user-partitioned windows over the daily rollup —
    // no join of any kind, every window keyed by user_id
    val p240 = plan("q240_scd2_tier")
    assert(p240.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q240 is a window-only build; any join is a regression")
    assert(p240.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .isEmpty, "q240's island windows must stay user-partitioned")
    // q241: the as-of union-window composition — the version×click
    // range join lives ONLY in the oracle; user-partitioned window +
    // hash aggregate here
    val p241 = plan("q241_pit_tier_clicks")
    assert(p241.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q241 must stay the union + user-window as-of shape (no range join)")
    // q242: one user-keyed aggregate, then rank arithmetic on the value
    // histogram (the allowlisted bounded global window); no joins
    assert(plan("q242_ab_effect_auc").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q242 must stay aggregate + bounded-histogram-window shaped")
    // q243: the wedge join and closing-edge semi-join are equi joins on
    // pair-set keys; the only BNLJs are the three 1-ROW census frames'
    // final ride — forbid the both-sides-shuffled degradation
    assert(plan("q243_dup_graph_triangles").collect {
      case c: CartesianProductExec => c }.isEmpty,
      "q243's wedge/closing joins must stay hash joins (1-row census rides excepted)")
    // q244: source/shingle-keyed aggregates + source-keyed equi joins
    assert(plan("q244_source_novelty").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q244 must stay aggregate + source-equi-join shaped")
    // q245: q239's panel machinery (broadcast panel semi-joins) plus
    // query-partitioned ideal-ranking windows
    val p245 = plan("q245_retrieval_ndcg")
    assert(p245.collect { case c: CartesianProductExec => c }.isEmpty,
      "q245's relevance joins must not degrade to cartesian")
    assert(p245.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .isEmpty, "q245's ideal ranking must stay query-partitioned")
    // q246/q247: one user-keyed aggregate then 1-row arithmetic — no
    // join, no window of any kind
    Seq("q246_ab_design", "q247_cuped").foreach { name =>
      val p = plan(name)
      assert(p.collect {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$name must stay a pure two-level aggregate")
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"$name needs no window at all")
    }
    // q249: the rank windows run on the (lang, score) value histogram
    // and docs join back by equi-key — lang-partitioned windows only,
    // no cartesian/BNLJ anywhere
    val p249 = plan("q249_quantile_uniform")
    assert(p249.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q249's histogram join must stay an equi hash join")
    assert(p249.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .isEmpty, "q249's rank windows must stay lang-partitioned")
    // q250's cross join is the histogram × 1-row total (kilobyte BNLJ
    // ride); q251's are the 9-row spine × 1-row total — forbid only
    // the both-sides-shuffled degradation
    Seq("q250_token_mass_quantiles", "q251_benford_values").foreach { name =>
      assert(plan(name).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$name's bounded rides must broadcast, not cartesian")
    }
    // q254: q198's aggregate into 2-row arithmetic; the only BNLJ is
    // the 2-row × 1-row separation-flag ride
    assert(plan("q254_wilson_ci").collect {
      case c: CartesianProductExec => c }.isEmpty,
      "q254's flag ride must broadcast, not cartesian")
    // q255: postings × pair-set equi joins, a (doc, shingle) semi-join
    // and a pair-partitioned top-3 window — no cartesian, no BNLJ
    val p255 = plan("q255_match_explanation")
    assert(p255.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q255 must stay equi/semi-join + pair-window shaped")
    assert(p255.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .isEmpty, "q255's top-3 window must stay pair-partitioned")
    // q253: four constant-config aggregate passes over the memoized
    // pair set — no join of any kind survives to the plan
    assert(plan("q253_lsh_scurve").collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q253 must stay pure aggregates over the pair checkpoint")
    // q252: the pairwise-slope join is equi on event_type with a
    // residual day filter over the calendar-bounded daily table; its
    // windows are type-partitioned over the bounded pair set
    val p252 = plan("q252_theilsen_trend")
    assert(p252.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "q252's pair join must stay a type-keyed hash join")
    assert(p252.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .isEmpty, "q252's median windows must stay type-partitioned")
  }

  test("fact-to-dim joins broadcast the dim side") {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // factWithTahap is memoized+persisted, so its visible plan is an
    // InMemoryRelation; the cached build plan beneath it is wrapped in
    // AdaptiveSparkPlanExec (opaque to collect), so assert on its
    // rendered tree.
    val plan = graft.etl.Star.factWithTahap(spark, sfDir).queryExecution.sparkPlan
    val cachedTrees = plan.collect {
      case s: InMemoryTableScanExec => s.relation.cachedPlan.treeString
    }
    assert(cachedTrees.exists(_.contains("BroadcastHashJoin")),
      "expected the part-dim join to be a broadcast hash join")
  }

  test("r16 queries: no cartesian; BNLJ only on the documented enum-bounded pair frames") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
    // strictly equi/semi-join + aggregate shaped — any BNLJ is a regression
    val strict = Seq("q256_tpch_q2", "q257_tpch_q9", "q259_tpch_q16",
      "q260_tpch_q20", "q262_hll_card_audit",
      "q263_hll_inter_audit", "q264_scd2_repair", "q266_repetition_filter",
      "q267_pii_scrub", "q274_weekday_profile", "q277_winsorized_mean",
      "q278_source_dup_matrix", "q281_asof_nearest",
      "q287_column_profile", "q288_retention_triangle", "q290_ks_drift",
      "q293_changepoint", "q295_dispersion", "q298_transition_impurity",
      "q300_hdr_quantiles", "q301_hdr_audit", "q307_vocab_shape",
      "q309_forecast_backtest", "q313_langid_confusion",
      "q314_session_quantiles", "q316_source_similarity",
      "q320_edge_dwell", "q321_alarm_flappiness",
      "q323_conversion_windows", "q324_ltv_curve",
      "q325_seasonality_strength")
    val degraded = strict.flatMap { name =>
      val p = plan(name)
      if (p.collect { case c: CartesianProductExec => c
                      case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
        Some(name)
      else None
    }
    assert(degraded.isEmpty, s"cartesian/nested-loop join in: ${degraded.mkString(", ")}")
    // documented bounded exceptions — the 1-row total rides (q258,
    // q268, q270, q273), the enum²-bounded pair frames (q271/q272's
    // type pairs, q275's label pairs), the ≤10-row query-panel
    // non-equi probes (q269/q276 — the q36 posture), and q261's
    // calendar-bounded day-frame broadcast: BNLJ allowed with a
    // bounded BROADCAST side, CARTESIAN never (q289's rides are the
    // 1-row corpus-total and the source-domain-bounded prefix total)
    Seq("q258_tpch_q11", "q261_rolling_actives_audit",
      "q289_interleave_schedule", "q294_spend_gini",
      "q296_item_cooccurrence", "q299_chi2_weekday",
      "q302_engagement_deciles", "q303_cluster_sizes",
      "q306_item_neighbors", "q310_promotion_gate",
      "q311_ivf_incremental", "q312_churn",
      "q315_sample_representativeness", "q317_funnel_ab",
      "q318_threshold_sweep", "q319_packing_efficiency",
      "q322_capture_recapture", "q326_entry_exit", "q327_return_time",
      "q328_decile_migration", "q329_basket_pairs", "q330_tenure_hazard",
      "q268_mixture_temperature", "q269_hard_negatives",
      "q270_epoch_allocation", "q271_audience_sketch",
      "q272_audience_audit", "q273_erasure_sweep",
      "q275_embedding_health", "q276_matryoshka_recall",
      "q279_collocations", "q280_dedup_mixture_shift").foreach { name =>
      assert(plan(name).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$name's bounded frames must broadcast, not cartesian")
    }
  }

  test("q265's per-iteration plan: equi joins + keyed aggregate, no cartesian/global window") {
    // the iterative corpus-grain contract (r15 verdict item 8): each
    // rank step must be a shuffle-per-iteration plan — edge⋈rank equi
    // joins feeding a dst-keyed partial-sum aggregate — never a
    // cartesian, BNLJ, or partitionless window that would funnel a
    // billion-user rank table through one task
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import spark.implicits._
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val outd = Seq((1L, 2L), (2L, 1L)).toDF("src", "tot")
    val nodes = Seq(1L, 2L, 3L).toDF("user_id")
    val rank = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("user_id", "r")
    val p = graft.ops.Events.prStep(edges, outd, nodes, rank, 5L)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case x => x
    }
    assert(p.collect { case c: CartesianProductExec => c
                       case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "a rank iteration must stay equi-join shaped")
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "a rank iteration must carry no window at all")
    assert(p.collect { case h: HashAggregateExec => h }.nonEmpty,
      "the contribution sum must be a keyed hash aggregate")
  }

  test("component-label joins carry NO forced broadcast hint; AQE elects") {
    // r15 verdict weak item: the dup-graph node set is a constant
    // FRACTION of the corpus at crawl dup rates (20–50% of documents),
    // so a forced broadcast(memoLabels) hint would ship a multi-GB
    // table past AQE's size check at 100 TB. Contract pinned here:
    // (a) the analyzed plan of every label-map consumer contains zero
    //     ResolvedHint nodes — the join strategy is AQE's to elect;
    // (b) at gate scale, where the label map genuinely IS small, AQE
    //     still elects a broadcast hash join — dropping the hint cost
    //     nothing here and saves the 100× case.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val consumers = Seq("q81_cluster_reps", "q86_leakage_safe_split",
      "q87_curation_funnel", "q100_split_funnel", "q232_doc_lineage")
    // A hint is illegal when its subtree carries the label map (its
    // output includes component_id); q86's 1-row broadcast(straddle)
    // audit ride is the documented bounded exception and stays.
    consumers.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val labelHints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.output.exists(_.name == "component_id") => h
      }
      assert(labelHints.isEmpty, s"$name must not force the label-map join by hint")
    }
    // (b) on one exemplar: execute, then read the AQE-finalized plan
    val df86 = SparkEntry.queries("q86_leakage_safe_split")(spark, sfDir)
    df86.collect()
    assert(df86.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "at gate scale AQE should still elect broadcast for the small label map")
  }

  test("per-key top-k rank filters plan with WindowGroupLimit") {
    // The declarative payoff pinned: `row_number over (partition by key)
    // ... where rn <= k` is NOT a full per-key sort — Catalyst's
    // WindowGroupLimit (Spark 3.5+) pre-filters every partition to its
    // local top-k BEFORE the window shuffle, the bounded-heap shape a
    // custom operator would otherwise exist for. A rewrite that breaks
    // the pattern (e.g. filtering on a derived column) would silently
    // lose the optimization and only show up as a 100×-scale sort spill.
    // name → MINIMUM WindowGroupLimitExec NODE count: each rank filter
    // plans a Partial (map-side, before the window shuffle) + Final
    // pair, so the floor is 2 per rank filter in the query. Counting
    // nodes, not a whole-tree substring hit, so one surviving instance
    // can't mask a regression in another filter of the same query.
    // Asserted as >= (not ==, r8 ADVICE): the floor catches a LOST
    // optimization — the failure this guard exists for — while a Spark
    // upgrade that merges duplicated subtree instances (fewer plan
    // copies of the same protected filter) would only fail an exact
    // pin spuriously. Floors = 2 × DISTINCT rank filters. On Spark
    // 4.1.2 the actual counts are 2/2/2/2/2/4/8: q108 = the encode
    // argmin; q109 adds the ADC top-k (2 distinct filters — the q36
    // exact-baseline subtree is session-memoized since r10, so recall
    // plans see a checkpointed scan of its 50 rows, not its window);
    // q110 has 3 distinct filters (centroidRanks, encode argmin, ADC
    // top-k) planned as 4 instances — centroidRanks appears twice
    // (probes + assign), the one duplication subtree reuse could
    // legitimately collapse.
    val topK = Seq("q36_knn_brute" -> 2, "q64_rare_terms" -> 2,
      "q71_balanced_sample" -> 2, "q94_tfidf_terms" -> 2,
      "q108_pq_encode" -> 2, "q109_pq_adc_recall" -> 4,
      "q110_ivfpq_recall" -> 6, "q306_item_neighbors" -> 2)
    val offenders = topK.flatMap { case (name, minimum) =>
      val got = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
        }.length
      if (got >= minimum) None else Some(s"$name (expected >= $minimum, got $got)")
    }
    assert(offenders.isEmpty,
      s"top-k window filter lost WindowGroupLimit in: ${offenders.mkString(", ")}")
  }

  test("every registered query ships a DuckDB oracle (and no oracle is orphaned)") {
    // A queries key without an oracleSql entry silently downgrades the
    // driver's gate to a rows-only check — coverage rot that nothing else
    // would flag. Exact key equality both ways: an orphaned oracle is a
    // renamed/deleted query whose SQL would never run again.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with no oracle (rows-only check): ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles with no query: ${(o -- q).mkString(", ")}")
  }

  test("surrogate-key dims have no window at all in their final plan") {
    // withSurrogateId materializes via localCheckpoint: consumers see a
    // scan of checkpointed rows, not a re-executable window/sampling plan.
    val dim = graft.etl.StarBuilder.dimWaktu(spark, sfDir)
    assert(dim.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
  }
}
