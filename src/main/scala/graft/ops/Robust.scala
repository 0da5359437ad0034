package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust numeric QA — exact median / MAD outlier audit over a measure
  * column, grouped (driver-mandated pipeline-QA surface; the numeric
  * sibling of q154's embedding-norm outliers).
  *
  * The 100 TB-correct exact median: never a per-group global sort of the
  * corpus (`row_number` over a 5-value partition funnels the whole fact
  * through 5 reducers). Instead the corpus collapses to a VALUE HISTOGRAM
  * — groupBy (group, value) counts — and the median is read off the
  * histogram's running sum. The windows here run over the histogram,
  * whose size is bounded by the value domain (distinct cent amounts),
  * not the corpus; the corpus is touched by exactly two narrow
  * aggregation passes (value histogram, absolute-deviation histogram).
  * Lower-median convention ((n+1)/2-th value, no interpolation) keeps
  * every number an integer, so the DuckDB oracle replays bit-for-bit.
  */
object Robust {
  type Q = (SparkSession, String) => DataFrame

  /** Coarse-bucket width for the two-phase rank selection: cents →
    * $100 buckets. Truncating division is monotone in v (negatives
    * land in bucket −1, −2, … contiguously), which is all the
    * boundary-bucket walk needs. */
  private val coarseWidth = 10000L

  /** Lower median per group from a value histogram — delegates to
    * [[histQuantiles]] at p = 50 (⌈n·50/100⌉ ≡ ⌈n/2⌉, the lower-median
    * rank). Returns (group, med, n). */
  private[graft] def histMedian(hist: DataFrame): DataFrame =
    histQuantiles(hist, Seq(50 -> "med"))

  /** Exact lower quantiles per group from a value histogram: for each
    * (percent, outName) the smallest v whose running count reaches
    * ⌈n·p/100⌉ (pure-integer rank — `(n·p + 99) div 100` — so every
    * engine selects the identical row).
    *
    * Two-phase boundary-bucket selection (the q82 token-budget
    * pattern), because a value histogram over prices is nearly
    * corpus-sized (most cent amounts are distinct) and a running sum
    * over it partitioned by a 5-value group IS the per-group corpus
    * sort this module exists to avoid. Phase 1 runs the cumulative
    * walk over [[coarseWidth]]-wide COARSE buckets (domain/width rows)
    * to locate, per target rank, the one bucket containing it and the
    * rank offset remaining inside it; phase 2 runs the exact ordered
    * walk over that single bucket's rows only. Both windows have
    * bounded input: coarse-bucket count and within-bucket distinct
    * values — never the full value domain. */
  private[graft] def histQuantiles(hist: DataFrame,
      pcts: Seq[(Int, String)]): DataFrame = {
    val tot = hist.groupBy("group").agg(sum("cnt").as("n"))
    val histCb = hist.withColumn("cb",
      expr(s"CAST(v div $coarseWidth AS BIGINT)"))
    val ccum = histCb.groupBy("group", "cb").agg(sum("cnt").as("ccnt"))
      .withColumn("cum",
        sum("ccnt").over(Window.partitionBy("group").orderBy("cb")))
    val targets = tot.select(col("group"), explode(array(pcts.map {
      case (p, name) => struct(lit(name).as("t"), greatest(lit(1L),
        expr(s"CAST((n * $p + 99) div 100 AS BIGINT)")).as("r"))
    }: _*)).as("pr")).select(col("group"), col("pr.t").as("t"),
      col("pr.r").as("r"))
    // per (group, target): the first coarse bucket whose running count
    // reaches the rank, and how much of the rank is left inside it
    val bound = ccum.join(broadcast(targets), Seq("group"))
      .where(col("cum") >= col("r"))
      .groupBy("group", "t")
      .agg(min(struct(col("cb"), (col("cum") - col("ccnt")).as("prev"))).as("bk"),
        first("r").as("r"))
      .select(col("group"), col("t"), col("bk.cb").as("cb"),
        (col("r") - col("bk.prev")).as("off"))
    // phase 2: exact walk confined to the boundary bucket's rows
    val sel = histCb.join(broadcast(bound), Seq("group", "cb"))
      .withColumn("ic",
        sum("cnt").over(Window.partitionBy("group", "t").orderBy("v")))
      .where(col("ic") >= col("off"))
      .groupBy("group", "t").agg(min("v").as("q"))
    val aggs = pcts.map { case (_, name) =>
      min(when(col("t") === name, col("q"))).as(name)
    }
    sel.groupBy("group").agg(aggs.head, aggs.tail: _*)
      .join(broadcast(tot), "group")
  }

  /** q189: winsorized order-amount statistics per priority — exact
    * p05/p95 cent quantiles read off the value histogram, and the
    * winsorized sum/mean (every amount clamped into [p05, p95] before
    * summing: the robust location estimate that keeps ALL rows, where
    * q184's fence drops them — the pair a pipeline-QA report shows side
    * by side). Same scale shape as q184: one corpus pass to the value
    * histogram; the clamp aggregates the HISTOGRAM's cnt column, not the
    * corpus. Integer cents throughout; the only float is the round2
    * mean. */
  val q189_winsor_stats: Q = (s, d) => {
    // value-domain-bounded histogram, referenced four times below —
    // checkpoint once instead of re-scanning the corpus per branch
    val hist = graft.Ckpt.eager(s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderpriority").as("group"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .groupBy("group", "v").agg(count(lit(1)).as("cnt")))
    val qs = histQuantiles(hist, Seq(5 -> "p05", 95 -> "p95"))
    hist.join(broadcast(qs), "group")
      .groupBy("group")
      .agg(first("n").as("n_orders"), first("p05").as("p05_c"),
        first("p95").as("p95_c"),
        sum(greatest(least(col("v"), col("p95")), col("p05")) * col("cnt"))
          .as("win_sum_c"))
      .withColumn("win_mean_c", graft.etl.Star.round2(
        col("win_sum_c").cast("double") / col("n_orders").cast("double")))
      .select(col("group").as("priority"), col("n_orders"), col("p05_c"),
        col("p95_c"), col("win_sum_c"), col("win_mean_c"))
      .orderBy("priority")
  }

  /** q184: median/MAD outlier audit of order amounts per priority class —
    * per group: row count, exact lower-median price (cents), median
    * absolute deviation, and how many orders sit beyond the 3×MAD fence
    * (the robust analog of 3σ; immune to the outliers it hunts, which
    * inflate a plain stddev fence until it hides them). Amounts are
    * integer cents end-to-end. */
  val q184_mad_outliers: Q = (s, d) => {
    val px = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderpriority").as("group"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    // every frame below is referenced by several branches; the
    // histograms are value-domain-bounded and the quantile outputs are
    // group-count-sized, so an eager local checkpoint per frame costs
    // bounded memory and removes the re-scan of the corpus per branch
    val hist = graft.Ckpt.eager(
      px.groupBy("group", "v").agg(count(lit(1)).as("cnt")))
    // med/mad stay eager-checkpointed: each is referenced by two
    // downstream branches, and Spark replays (not reuses) a common
    // subplan per reference — dropping these two barriers re-ran the
    // histMedian window ~3x inside the final job and measured SLOWER
    // in-suite (r18: 3.77 s -> 6.19 s across two same-factor windows).
    // The r18 isolate pinned the residual swing as JVM-warmth
    // environment, not code: the isolated warm floor (5.9-8.3 s)
    // exceeds the in-suite band (1.9-4.1 s) on identical code.
    val med = graft.Ckpt.eager(
      histMedian(hist).select(col("group"), col("med"), col("n")))
    // abs-deviation histogram derived from the VALUE histogram (no second
    // corpus pass: |v - med| aggregates the cnt column, histogram-sized)
    val adHist = graft.Ckpt.eager(hist.join(broadcast(med), "group")
      .groupBy(col("group"), abs(col("v") - col("med")).as("v"))
      .agg(sum("cnt").as("cnt")))
    val mad = graft.Ckpt.eager(
      histMedian(adHist).select(col("group"), col("med").as("mad")))
    val fenced = adHist.join(broadcast(mad), "group")
      .groupBy("group")
      .agg(sum(when(col("v") > lit(3) * col("mad"), col("cnt"))
        .otherwise(0L)).as("n_outliers"))
    med.join(mad, "group").join(fenced, "group")
      .select(col("group").as("priority"), col("n").as("n_orders"),
        col("med").as("med_c"), col("mad").as("mad_c"), col("n_outliers"))
      .orderBy("priority")
  }

  /** The 2-D SKYLINE core of q202 over points (`id`, `p`, `e`) —
    * maximize `p`, minimize `e`; a point is on the Pareto frontier iff
    * no other point has p ≥, e ≤ with one strict. The naive
    * formulation is an all-pairs dominance anti-join; in 2-D no pair
    * ever needs to exist: a point survives iff
    *
    *   (1) e = min{e' : p' = p}             — best at its own p, and
    *   (2) min{e' : p' > p} > e (or ∅)      — beats every higher-p point.
    *
    * ((1) kills same-p-worse-e rows; (2) kills rows some strictly-higher
    * p matches-or-beats on e. Duplicate (p, e) points never dominate
    * each other — the strict clause — so both survive, matching the
    * oracle's NOT EXISTS.) The corpus collapses to ONE row per distinct
    * p (groupBy min), and the strict-suffix min over p is computed
    * two-phase like [[histQuantiles]]: a within-bucket suffix window
    * whose frame is hard-capped at [[coarseWidth]] rows (one row per
    * distinct p inside the bucket) plus a coarse walk over
    * domain div [[coarseWidth]] bucket rows. The per-p frontier table
    * then equi-joins back to the points — no broadcast hint (distinct-p
    * count is corpus-sized in the adversarial all-distinct case; AQE
    * may still elect broadcast when it is actually small), no theta
    * join, no pair materialized anywhere. */
  private[graft] def skyline2d(pts: DataFrame): DataFrame = {
    val perP = pts.groupBy("p").agg(min("e").as("minE"))
      .withColumn("cb", expr(s"CAST(p div $coarseWidth AS BIGINT)"))
    // coarse walk: for each bucket, the min e over STRICTLY greater
    // buckets (suffix frame over domain div coarseWidth rows)
    val cbSuff = perP.groupBy("cb").agg(min("minE").as("cbMin"))
      .withColumn("cbSuffGt", min("cbMin").over(Window.orderBy(col("cb").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select("cb", "cbSuffGt")
    // within-bucket strict suffix (rows are distinct p, so "strictly
    // preceding row in p desc" ≡ "strictly greater p"); frame ≤ coarseWidth
    val frontierP = perP
      .withColumn("inSuffGt", min("minE").over(Window.partitionBy("cb")
        .orderBy(col("p").desc).rowsBetween(Window.unboundedPreceding, -1)))
      .join(cbSuff, Seq("cb"))
      // least() skips nulls: null ⟺ no strictly-greater p exists at all
      .withColumn("suffGt", least(col("inSuffGt"), col("cbSuffGt")))
      .where(col("suffGt").isNull || col("suffGt") > col("minE"))
      .select(col("p"), col("minE"))
    pts.join(frontierP, Seq("p"))
      .where(col("e") === col("minE"))
      .select("id", "p", "e")
  }

  /** q202: PARETO-FRONTIER user QA — which users are not dominated on
    * (purchases ↑, errors ↓): the multi-objective "best" set a single
    * score column cannot express (any weighted score picks ONE point;
    * the skyline returns every defensible trade-off). Profile = one
    * user-keyed aggregate; frontier via [[skyline2d]]'s pair-free
    * monotone sweep; the DuckDB oracle states the definition directly
    * as NOT EXISTS a dominating row, so the gate proves the sweep
    * equals the quadratic definition. */
  val q202_user_skyline: Q = (s, d) => {
    val prof = graft.ops.Events.events(s, d)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
      .select(col("user_id").as("id"), col("p"), col("e"))
    skyline2d(prof)
      .select(col("id").as("user_id"), col("p").as("n_purchases"),
        col("e").as("n_errors"))
      .orderBy("user_id")
  }

  /** q209's Poisson(1) inverse CDF as integer thresholds on a 20-bit
    * uniform (u < t_k ⇒ weight k): floor(CDF(k)·2²⁰) for k = 0..6,
    * weight 7 beyond — the tail truncation shifts total mass by < 1e-4
    * and, being part of the DEFINITION, costs the gate nothing. ONE
    * value list generates both engines' CASE. */
  private[graft] val poissonCdf20: Seq[Long] =
    Seq(385749L, 771498L, 964372L, 1028665L, 1044738L, 1047952L, 1048479L)
  private def poissonWSql(u: String): String =
    poissonCdf20.zipWithIndex.map { case (t, k) => s"WHEN $u < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")
  private def poissonWSqlDuck(u: String): String =
    poissonCdf20.zipWithIndex.map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  /** q209: BOOTSTRAP uncertainty for the mean order amount — the
    * resampling answer to "how stable is this statistic", computed the
    * only way a distributed engine can afford: the POISSON BOOTSTRAP
    * (Chamandy et al., Google 2012 — each row enters each resample
    * w ~ Poisson(1) times, independence replacing the impossible exact
    * multinomial over a distributed corpus). Here even the draws are
    * deterministic: w comes from 20 md5 bits of (row id, resample id)
    * through the integer inverse CDF [[poissonCdf20]], so both engines
    * materialize the IDENTICAL 32 resamples and the gate pins the
    * whole procedure, not a distribution claim. One pass: rows explode
    * ×32 straight into the per-resample partial sums (map-side
    * combine; nothing row-sized survives), each resample's mean is an
    * integer-cents truncating division, and the spread report is exact
    * order statistics over the 32-row frame (lower-median convention).
    * Scale: 32× map-side amplification into 32 groups — no shuffle
    * grows with the corpus. */
  val q209_bootstrap_ci: Q = (s, d) => {
    val px = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("id"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    val reps = px
      .withColumn("b", explode(sequence(lit(1), lit(32))))
      .withColumn("u", expr("CAST(conv(substring(md5(concat(" +
        "CAST(id AS STRING), ':', CAST(b AS STRING))), 1, 5), 16, 10) AS BIGINT)"))
      .withColumn("w", expr(poissonWSql("u")))
      .groupBy("b")
      .agg(sum(col("w") * col("v")).as("sm"), sum("w").as("n"))
      .select(expr("CAST(sm div n AS BIGINT)").as("mean_c"))
    val spread = reps.agg(
      min("mean_c").as("boot_lo_c"),
      expr("element_at(sort_array(collect_list(mean_c)), 16)").as("boot_med_c"),
      max("mean_c").as("boot_hi_c"))
    val full = px.agg(count(lit(1)).as("n_rows"),
      expr("CAST(sum(v) div count(1) AS BIGINT)").as("mean_c"))
    full.crossJoin(broadcast(spread))
      .select("n_rows", "mean_c", "boot_lo_c", "boot_med_c", "boot_hi_c")
  }

  /** The q297 quartile-code map for one dimension: (value → code 1–4)
    * by MIN-RANK over the dimension's VALUE HISTOGRAM — code =
    * (4·cumBefore) div n + 1, so ties share a code and the map is
    * value-domain-bounded (never a per-customer rank window). */
  private[graft] def quartileCodes(df: DataFrame, dim: String): DataFrame =
    rankCodes(df, dim, 4)

  /** The general k-tile code map (q297 quartiles, q302 deciles):
    * (value → code 1–k) by MIN-RANK over the dimension's VALUE
    * HISTOGRAM — code = (k·cumBefore) div n + 1. */
  private[graft] def rankCodes(df: DataFrame, dim: String,
                               k: Int): DataFrame =
    rankCodesFromCells(df.groupBy(dim).agg(count(lit(1)).as("c")),
      dim, k)

  /** [[rankCodes]] over PRE-AGGREGATED histogram cells (`dim`, `c`) —
    * the form the streaming twin serves from (its state IS the cells),
    * factored so batch and stream read one code-map definition. The
    * global window is the allowlisted value-histogram shape:
    * domain-bounded rows, never the keyed corpus. */
  private[graft] def rankCodesFromCells(cells: DataFrame, dim: String,
                                        k: Int): DataFrame =
    withRankCodes(cells, dim, "c", k).select(col(dim), col(s"${dim}_code"))

  /** The same min-rank k-tile code, added IN PLACE to a cells frame (no
    * join) — the form a consumer already holding the histogram uses:
    * joining a cells frame to a code map derived from ITSELF is a
    * self-join on one lineage, which Spark's analyzer rejects over
    * some sources (conflicting references on a memory-sink view).
    * The total n is the SECOND window aggregate over the same ordered
    * histogram (full frame) — same partition/order spec, so both sums
    * land in one WindowExec and a code map costs ZERO driver actions
    * (r17: q297/q302/q308/q328 each used to pay a count()/head per
    * map just to interpolate n into this expression). */
  private[graft] def withRankCodes(cells: DataFrame, dim: String,
                                   cnt: String, k: Int): DataFrame = {
    val w = Window.orderBy(dim)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(dim)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("__cum", sum(cnt).over(w))
      .withColumn("__n", sum(cnt).over(wAll))
      .withColumn(s"${dim}_code",
        expr(s"$k * (__cum - $cnt) div __n + 1"))
      .drop("__cum", "__n")
  }

  /** q297: RFM SEGMENTATION — the classic BI customer cut (Recency /
    * Frequency / Monetary quartile codes) over the orders table: per
    * customer, R = last order day (higher = more recent), F = order
    * count, M = lifetime spend cents; each dimension coded 1–4 by
    * min-rank quartile (code 4 = top quartile — most recent / most
    * frequent / highest spend), ties sharing a code so the assignment
    * is total-order-free and engine-exact. Output: one row per
    * occupied (r, f, m) cell with its population and spend — the
    * segment table a campaign targets from ("(4,4,4) champions",
    * "(1,x,x) churned"). Scale shape: one customer-keyed aggregate,
    * then three code maps built on VALUE HISTOGRAMS (day-, count-,
    * and cents-domain-bounded — the q184 convention; the per-customer
    * rank window a naive NTILE would use is exactly what this
    * avoids) joined back narrow; the final aggregate lands on ≤ 64
    * cells. */
  val q297_rfm_segments: Q = (s, d) => {
    val cust = graft.Ckpt.persisted(
      s.read.parquet(s"$d/orders.parquet")
        .select(col("o_custkey"),
          expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400")
            .as("day"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("o_custkey")
        .agg(max("day").as("r"), count(lit(1)).as("f"),
          sum("cents").as("m")))
    cust
      .join(quartileCodes(cust, "r"), "r")
      .join(quartileCodes(cust, "f"), "f")
      .join(quartileCodes(cust, "m"), "m")
      .groupBy("r_code", "f_code", "m_code")
      .agg(count(lit(1)).as("n_customers"), sum("m").as("sum_cents"))
      .orderBy("r_code", "f_code", "m_code")
  }

  /** q329: MARKET-BASKET BRAND PAIRS — the q296 co-occurrence operator
    * proven domain-generic: the SAME [[Events.cooccurrencePairGrid]]
    * (one definition — support, Jaccard, lift over any distinct
    * (container, item) interaction set) applied to the TPC-H order
    * baskets at BRAND grain (l_orderkey × p_brand). Brand, not part,
    * DELIBERATELY: part-grain pairs are ~all-distinct (co-support 1 —
    * statistical noise) and their aggregation shuffles the full pair
    * expansion; at brand grain the baskets are dense and hard-bounded
    * (≤ 7 lines, 25 brands), so the [[Events.densePairGrid]] plan
    * applies — ONE order-keyed shuffle, in-row pair combinations, and
    * partial aggregation collapsing every map task to ≤ C(25,2) cells.
    * Top-20 pairs by co-order support with the (support, b1, b2)
    * total order; the part→brand dim join broadcasts. */
  val q329_basket_pairs: Q = (s, d) => {
    val oi = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("user_id"), col("l_partkey"))
      .join(broadcast(s.read.parquet(s"$d/part.parquet")
        .select(col("p_partkey").as("l_partkey"), col("p_brand").as("k"))),
        "l_partkey")
      .select("user_id", "k")
    graft.ops.Events.densePairGrid(oi)
      .select(col("k1").as("b1"), col("k2").as("b2"),
        col("co_users").as("co_orders"), col("jaccard_bp"), col("lift_bp"))
      .orderBy(col("co_orders").desc, col("b1").asc, col("b2").asc)
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q297_rfm_segments" -> q297_rfm_segments,
    "q329_basket_pairs" -> q329_basket_pairs,
    "q184_mad_outliers" -> q184_mad_outliers,
    "q189_winsor_stats" -> q189_winsor_stats,
    "q202_user_skyline" -> q202_user_skyline,
    "q209_bootstrap_ci" -> q209_bootstrap_ci)

  val oracle: Map[String, String] = Map(
    // the q296 pair algebra verbatim over the order×brand interaction set
    "q329_basket_pairs" ->
      """WITH ui AS (
        |  SELECT DISTINCT l.l_orderkey AS user_id, p.p_brand AS k
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |pi AS (SELECT k, CAST(count(*) AS BIGINT) AS n_item
        |       FROM ui GROUP BY 1),
        |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |      FROM ui),
        |p AS (
        |  SELECT a.k AS b1, b.k AS b2, CAST(count(*) AS BIGINT) AS co_orders
        |  FROM ui a JOIN ui b ON b.user_id = a.user_id AND a.k < b.k
        |  GROUP BY 1, 2)
        |SELECT p.b1, p.b2, p.co_orders,
        |       p.co_orders * 10000 // (na.n_item + nb.n_item - p.co_orders)
        |         AS jaccard_bp,
        |       CAST(CAST(p.co_orders AS HUGEINT) * u.n_users * 10000
        |            // (CAST(na.n_item AS HUGEINT) * nb.n_item) AS BIGINT)
        |         AS lift_bp
        |FROM p
        |JOIN pi na ON na.k = p.b1
        |JOIN pi nb ON nb.k = p.b2
        |CROSS JOIN u
        |ORDER BY p.co_orders DESC, p.b1 ASC, p.b2 ASC
        |LIMIT 20""".stripMargin,
    // same min-rank quartile codes from per-dimension value histograms
    "q297_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) AS r,
        |         CAST(count(*) AS BIGINT) AS f,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
        |rc AS (
        |  SELECT r, CAST(4 * (sum(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
        |                  - c) // nn.n + 1 AS BIGINT) AS r_code
        |  FROM (SELECT r, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY 1)
        |  CROSS JOIN nn),
        |fc AS (
        |  SELECT f, CAST(4 * (sum(c) OVER (ORDER BY f ROWS UNBOUNDED PRECEDING)
        |                  - c) // nn.n + 1 AS BIGINT) AS f_code
        |  FROM (SELECT f, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY 1)
        |  CROSS JOIN nn),
        |mc AS (
        |  SELECT m, CAST(4 * (sum(c) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
        |                  - c) // nn.n + 1 AS BIGINT) AS m_code
        |  FROM (SELECT m, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY 1)
        |  CROSS JOIN nn)
        |SELECT rc.r_code, fc.f_code, mc.m_code,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(cust.m) AS BIGINT) AS sum_cents
        |FROM cust
        |JOIN rc ON rc.r = cust.r
        |JOIN fc ON fc.f = cust.f
        |JOIN mc ON mc.m = cust.m
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // the identical 32 deterministic resamples: same 20 md5 bits, same
    // generated inverse-CDF CASE, same truncating means, same order
    // statistics over the 32-row frame
    "q209_bootstrap_ci" -> {
      s"""WITH px AS (
         |  SELECT o_orderkey AS id,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |  FROM orders),
         |r AS (
         |  SELECT b,
         |         CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
         |           CAST(b AS VARCHAR)), 1, 5) AS BIGINT) AS u, v
         |  FROM px, unnest(range(1, 33)) t(b)),
         |w AS (SELECT b, ${poissonWSqlDuck("u")} AS w, v FROM r),
         |m AS (SELECT b, CAST(sum(w * v) // sum(w) AS BIGINT) AS mean_c
         |      FROM w GROUP BY b),
         |sp AS (
         |  SELECT CAST(min(mean_c) AS BIGINT) AS boot_lo_c,
         |         CAST((SELECT mean_c FROM m ORDER BY mean_c
         |               LIMIT 1 OFFSET 15) AS BIGINT) AS boot_med_c,
         |         CAST(max(mean_c) AS BIGINT) AS boot_hi_c
         |  FROM m),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |             CAST(sum(v) // count(*) AS BIGINT) AS mean_c FROM px)
         |SELECT n_rows, mean_c, boot_lo_c, boot_med_c, boot_hi_c
         |FROM f, sp""".stripMargin
    },
    // the frontier definition stated directly — NOT EXISTS a dominating
    // profile — gating the grid-pruned rewrite
    "q202_user_skyline" ->
      """WITH prof AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |         CAST(sum(CASE WHEN event_type = 'error'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS e
        |  FROM events GROUP BY 1)
        |SELECT user_id, p AS n_purchases, e AS n_errors
        |FROM prof a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM prof b
        |  WHERE b.p >= a.p AND b.e <= a.e AND (b.p > a.p OR b.e < a.e))
        |ORDER BY user_id""".stripMargin,
    // same cent grid, same integer ceil-rank quantile rows, same clamp
    "q189_winsor_stats" ->
      s"""WITH px AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |h AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM px GROUP BY 1, 2),
        |t AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT grp, v, cnt,
        |               CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS c
        |        FROM h),
        |qs AS (SELECT cum.grp,
        |              min(CASE WHEN c >= greatest(1, (n * 5 + 99) // 100)
        |                       THEN v END) AS p05,
        |              min(CASE WHEN c >= greatest(1, (n * 95 + 99) // 100)
        |                       THEN v END) AS p95
        |       FROM cum JOIN t ON cum.grp = t.grp GROUP BY 1),
        |w AS (SELECT h.grp,
        |             CAST(sum(greatest(least(v, p95), p05) * cnt) AS BIGINT)
        |               AS win_sum_c
        |      FROM h JOIN qs ON h.grp = qs.grp GROUP BY 1)
        |SELECT t.grp AS priority, n AS n_orders, p05 AS p05_c, p95 AS p95_c,
        |       win_sum_c,
        |       ${graft.etl.Star.round2Sql("CAST(win_sum_c AS DOUBLE) / CAST(n AS DOUBLE)")}
        |         AS win_mean_c
        |FROM t JOIN qs ON t.grp = qs.grp JOIN w ON t.grp = w.grp
        |ORDER BY priority""".stripMargin,
    // same cent grid, same lower-median running-sum selection, same fence
    "q184_mad_outliers" ->
      """WITH px AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |h AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM px GROUP BY 1, 2),
        |t AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT grp, v, cnt,
        |               CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS c
        |        FROM h),
        |med AS (SELECT cum.grp, min(v) AS med
        |        FROM cum JOIN t ON cum.grp = t.grp
        |        WHERE c >= (n + 1) // 2 GROUP BY 1),
        |ah AS (SELECT h.grp, abs(v - med) AS av, CAST(sum(cnt) AS BIGINT) AS cnt
        |       FROM h JOIN med ON h.grp = med.grp GROUP BY 1, 2),
        |acum AS (SELECT grp, av, cnt,
        |                CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY av) AS BIGINT) AS c
        |         FROM ah),
        |mad AS (SELECT acum.grp, min(av) AS mad
        |        FROM acum JOIN t ON acum.grp = t.grp
        |        WHERE c >= (n + 1) // 2 GROUP BY 1),
        |fence AS (SELECT ah.grp,
        |                 CAST(sum(CASE WHEN av > 3 * mad THEN cnt ELSE 0 END) AS BIGINT)
        |                   AS n_outliers
        |          FROM ah JOIN mad ON ah.grp = mad.grp GROUP BY 1)
        |SELECT t.grp AS priority, n AS n_orders, med AS med_c, mad AS mad_c,
        |       n_outliers
        |FROM t JOIN med ON t.grp = med.grp
        |       JOIN mad ON t.grp = mad.grp
        |       JOIN fence ON t.grp = fence.grp
        |ORDER BY priority""".stripMargin)
}
