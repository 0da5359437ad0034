package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.ops.Robust

/** Robust-stats family (q184) + the q186 integer-EWMA fold: the
  * histogram-median machinery against a driver-side sorted-sequence
  * reference, the MAD fence's outlier immunity, and the HOF fold against
  * the scalar recurrence. */
class RobustSpec extends AnyFunSuite with SparkTestBase {

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.size + 1) / 2) - 1)
  }

  test("histMedian equals the sorted-sequence lower median on random multisets") {
    import spark.implicits._
    // range spans several coarse buckets incl. negatives, so the
    // two-phase boundary-bucket walk (not just the degenerate one-bucket
    // case) is what this pins
    val groups = Gen.listOfN(6, Gen.nonEmptyListOf(Gen.chooseNum(-30000L, 30000L))).sample.get
    val rows = groups.zipWithIndex.flatMap { case (vs, g) => vs.map(v => (s"g$g", v)) }
    val hist = rows.toDF("group", "v")
      .groupBy("group", "v").agg(count(lit(1)).as("cnt"))
    val got = Robust.histMedian(hist).collect()
      .map(r => r.getAs[String]("group") ->
        (r.getAs[Long]("med"), r.getAs[Long]("n"))).toMap
    groups.zipWithIndex.foreach { case (vs, g) =>
      assert(got(s"g$g") == ((lowerMedian(vs.map(_.toLong)), vs.size.toLong)),
        s"group g$g: vs=${vs.sorted}")
    }
  }

  test("histQuantiles p05/p95 equal the ceil-rank sorted reference across coarse buckets") {
    import spark.implicits._
    val vs = Gen.listOfN(300, Gen.chooseNum(-25000L, 25000L)).sample.get
    val hist = vs.map(v => ("g", v)).toDF("group", "v")
      .groupBy("group", "v").agg(count(lit(1)).as("cnt"))
    val row = Robust.histQuantiles(hist, Seq(5 -> "p05", 95 -> "p95"))
      .collect().head
    def rank(p: Int) = math.max(1, (vs.size * p + 99) / 100)
    val sorted = vs.sorted
    assert(row.getAs[Long]("p05") == sorted(rank(5) - 1))
    assert(row.getAs[Long]("p95") == sorted(rank(95) - 1))
    assert(row.getAs[Long]("n") == vs.size.toLong)
  }

  test("MAD fence is outlier-immune: a planted extreme moves the flag count, not the fence") {
    import spark.implicits._
    // 99 well-behaved values + 1 extreme: median and MAD must be what the
    // 99 alone produce (the extreme can't drag its own fence), and exactly
    // the extreme sits outside 3×MAD. A mean/σ fence fails both halves.
    val base = (1 to 99).map(i => 1000L + (i % 7))
    val all = base :+ 999999L
    val hist = all.map(v => ("g", v)).toDF("group", "v")
      .groupBy("group", "v").agg(count(lit(1)).as("cnt"))
    val med = Robust.histMedian(hist).collect().head.getAs[Long]("med")
    assert(med == lowerMedian(all)) // = lowerMedian(base ± rank shift): still ~1000
    assert(math.abs(med - 1003L) <= 3)
    val adHist = all.map(v => ("g", math.abs(v - med))).toDF("group", "v")
      .groupBy("group", "v").agg(count(lit(1)).as("cnt"))
    val mad = Robust.histMedian(adHist).collect().head.getAs[Long]("med")
    assert(mad <= 3, s"MAD must reflect the tight base spread, got $mad")
    val out = all.count(v => math.abs(v - med) > 3 * mad)
    assert(out == 1, s"exactly the planted extreme outside the fence, got $out")
  }

  test("q186 EWMA HOF fold equals the scalar integer recurrence") {
    import spark.implicits._
    val cnts = Gen.listOfN(40, Gen.chooseNum(0L, 5000L)).sample.get
    // scalar reference: e0 = c0*4096, e_t = (c_t*4096 + 3*e_{t-1}) div 4
    val expect = cnts.tail.scanLeft(cnts.head * 4096L)((e, c) => (c * 4096L + 3L * e) / 4L)
    // feed the fold through the same expression the query uses, via a
    // synthetic daily table (bypasses the events() reader on purpose —
    // this pins the FOLD, the reader has its own spec)
    val daily = cnts.zipWithIndex.map { case (c, i) => ("tick", i.toLong, c) }
      .toDF("event_type", "day", "cnt")
    val got = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("ds"))
      .withColumn("sm", expr(
        """aggregate(ds,
          |  CAST(array() AS ARRAY<STRUCT<day: BIGINT, cnt: BIGINT, ewma_s: BIGINT>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    'day', x.day, 'cnt', x.cnt,
          |    'ewma_s', CASE WHEN size(acc) = 0 THEN x.cnt * 4096L
          |      ELSE (x.cnt * 4096L + 3L * element_at(acc, -1).ewma_s) div 4L
          |      END)))""".stripMargin))
      .select(explode(col("sm")).as("r"))
      .select(col("r.day"), col("r.ewma_s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2).toSeq
    assert(got == expect)
  }

  test("skyline2d: pair-free sweep keeps exactly the non-dominated set on planted geometry") {
    import spark.implicits._
    def direct(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
      pts.filter { case (_, p, e) =>
        !pts.exists { case (_, p2, e2) =>
          p2 >= p && e2 <= e && (p2 > p || e2 < e) }
      }.toSet
    // an all-diagonal frontier (worst case: everything survives), a
    // dominated interior cloud, a duplicate frontier point (both must
    // survive under the strict clause), and a point tied on one axis
    val pts = Seq(
      (1L, 10L, 10L), (2L, 20L, 20L), (3L, 30L, 30L), (4L, 40L, 40L),
      (5L, 15L, 25L),              // dominated by 2? p 15<20, e 25>20 -> dominated by (20,20)
      (6L, 40L, 40L),              // duplicate of 4 — both survive
      (7L, 40L, 41L),              // dominated by 4 (equal p, worse e)
      (8L, 5L, 9L),                // frontier: best e
      (9L, 39L, 39L)               // dominated by 4 (p 40>39, e 40>39? e must be <=: 40<=39 false) -> NOT dominated by 4; by 3? p 30<39 no -> frontier
    ).map { case (i, p, e) => (i, p, e) }
    val df = pts.toDF("id", "p", "e")
    val got = Robust.skyline2d(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct(pts), s"got $got expected ${direct(pts)}")
    assert(got.contains((4L, 40L, 40L)) && got.contains((6L, 40L, 40L)),
      "duplicate frontier points both survive")
    assert(!got.exists(_._1 == 7L) && !got.exists(_._1 == 5L))
    assert(got.exists(_._1 == 9L), "diagonal neighbor is NOT dominated")
  }

  test("q202 plan: no anti-join, no nested-loop join, no pair materialization (r13 verdict item 1)") {
    // the r13-weak shape was a broadcast theta ANTI-join over a
    // corpus-linear candidate band; the sweep rewrite must never
    // reintroduce one — every join in the plan is an equi-join
    val plan = SparkEntry.queries("q202_user_skyline")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "skyline sweep must not contain a nested-loop join")
    assert(!plan.contains("LeftAnti"),
      "skyline sweep must not contain an anti-join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q209: bootstrap band is ordered, brackets the full mean, and thresholds are a CDF") {
    val r = SparkEntry.queries("q209_bootstrap_ci")(spark, "/root/testdata/sf0.001").head()
    val (mean, lo, med, hi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(lo <= med && med <= hi)
    assert(lo < hi, "32 deterministic resamples of a non-constant column must spread")
    assert(lo <= mean && mean <= hi,
      "the full-sample mean should fall inside the bootstrap envelope here")
    // the inverse-CDF thresholds must be strictly increasing and under 2^20
    val ts = Robust.poissonCdf20
    assert(ts == ts.sorted && ts.distinct == ts && ts.last < (1L << 20))
    // mean weight ~ 1: P(0) mass ~ e^-1 (the Poisson-bootstrap premise)
    assert(math.abs(ts.head.toDouble / (1L << 20) - math.exp(-1.0)) < 1e-4)
  }

  test("q297: min-rank quartile codes share codes across tie blocks") {
    import spark.implicits._
    // values 5×4, 7×2, 9, 11 (n=8): cumBefore 0/4/6/7 → codes 1/3/4/4
    val df = Seq(5L, 5L, 5L, 5L, 7L, 7L, 9L, 11L).toDF("m")
    val got = Robust.quartileCodes(df, "m").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 1L, 7L -> 3L, 9L -> 4L, 11L -> 4L))
    // k = 10 (q302's deciles): distinct values code 1..10; an all-tied
    // column collapses to code 1 (min-rank, never an arbitrary ntile cut)
    val ten = Robust.rankCodes((1L to 10L).toDF("m"), "m", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ten == (1L to 10L).map(v => v -> v).toMap)
    val tied = Robust.rankCodes(Seq(7L, 7L, 7L).toDF("m"), "m", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tied == Map(7L -> 1L))
  }
}
