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

  /** Lower median per group from a value histogram (`group`, `v`,
    * `cnt`): the smallest v whose running count reaches ⌈n/2⌉.
    * Input is histogram-sized; the window partitions by group over the
    * value domain. */
  private[graft] def histMedian(hist: DataFrame): DataFrame = {
    val tot = hist.groupBy("group").agg(sum("cnt").as("n"))
    val cum = hist.withColumn("cum",
      sum("cnt").over(Window.partitionBy("group").orderBy("v")))
    cum.join(broadcast(tot), "group")
      .where(col("cum") >= floor((col("n") + 1) / 2))
      .groupBy("group")
      .agg(min("v").as("med"), first("n").as("n"))
  }

  /** Lower quantiles per group from a value histogram: for each
    * (percent, outName) the smallest v whose running count reaches
    * ⌈n·p/100⌉ (pure-integer rank — `(n·p + 99) div 100` — so both
    * engines select the identical row; floor((n+1)/2) in [[histMedian]]
    * equals this at p = 50). One cumulative pass serves every requested
    * quantile. */
  private[graft] def histQuantiles(hist: DataFrame,
      pcts: Seq[(Int, String)]): DataFrame = {
    val tot = hist.groupBy("group").agg(sum("cnt").as("n"))
    val cum = hist.withColumn("cum",
        sum("cnt").over(Window.partitionBy("group").orderBy("v")))
      .join(broadcast(tot), "group")
    val aggs = pcts.map { case (p, name) =>
      min(when(col("cum") >=
        greatest(lit(1L), expr(s"CAST((n * $p + 99) div 100 AS BIGINT)")),
        col("v"))).as(name)
    }
    cum.groupBy("group").agg(aggs.head, aggs.tail: _*)
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
    val hist = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderpriority").as("group"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .groupBy("group", "v").agg(count(lit(1)).as("cnt"))
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
    val hist = px.groupBy("group", "v").agg(count(lit(1)).as("cnt"))
    val med = histMedian(hist).select(col("group"), col("med"), col("n"))
    // abs-deviation histogram derived from the VALUE histogram (no second
    // corpus pass: |v - med| aggregates the cnt column, histogram-sized)
    val adHist = hist.join(broadcast(med), "group")
      .groupBy(col("group"), abs(col("v") - col("med")).as("v"))
      .agg(sum("cnt").as("cnt"))
    val mad = histMedian(adHist).select(col("group"), col("med").as("mad"))
    val fenced = adHist.join(broadcast(mad), "group")
      .groupBy("group")
      .agg(sum(when(col("v") > lit(3) * col("mad"), col("cnt"))
        .otherwise(0L)).as("n_outliers"))
    med.join(mad, "group").join(fenced, "group")
      .select(col("group").as("priority"), col("n").as("n_orders"),
        col("med").as("med_c"), col("mad").as("mad_c"), col("n_outliers"))
      .orderBy("priority")
  }

  val queries: Map[String, Q] = Map(
    "q184_mad_outliers" -> q184_mad_outliers,
    "q189_winsor_stats" -> q189_winsor_stats)

  val oracle: Map[String, String] = Map(
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
