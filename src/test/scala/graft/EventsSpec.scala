package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Events

/** The q193 blocked interval-overlap join equals the direct condition
  * join on adversarial interval layouts. */
class EventsSpec extends AnyFunSuite with SparkTestBase {

  test("overlapDayStats equals the direct quadratic join on adversarial interval layouts") {
    import spark.implicits._
    // hand-adversarial shapes: cross-hour spans, nesting, identical
    // intervals, point intervals (st == en — must pair with NOTHING
    // under the strict predicate and carry no measure), touching
    // endpoints (excluded), several intervals STARTING the same second
    // (the C(starts,2) term), empty-hour gaps between events (the
    // cross-bucket t_next path), and an isolated day with no pairs
    // (must be absent from the output)
    val iv = Seq(
      (0L, 1L, 100L, 7300L),     // spans 3 hour blocks
      (0L, 2L, 3500L, 3700L),    // nested inside u1, crosses a block boundary
      (0L, 3L, 7300L, 8000L),    // touches u1's end — NOT overlapping
      (0L, 4L, 200L, 200L),      // point interval strictly inside u1
      (0L, 5L, 100L, 7300L),     // identical to u1 (same-second start tie)
      (0L, 6L, 100L, 100L),      // point AT the tied start — pairs with nothing
      (0L, 7L, 90000L, 93600L),  // far hour: overlaps u8 across a dead gap
      (0L, 8L, 90010L, 92000L),
      (1L, 1L, 100L, 200L),      // other day: u1/u9 overlap there
      (1L, 9L, 150L, 400L),
      (2L, 1L, 5L, 10L)          // a day with no pairs at all
    ).toDF("day", "user_id", "st", "en")
    val got = Events.overlapDayStats(iv)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = iv.select(col("day"), col("user_id").as("u1"),
      col("st").as("st1"), col("en").as("en1"))
    val b = iv.select(col("day"), col("user_id").as("u2"),
      col("st").as("st2"), col("en").as("en2"))
    val direct = a.join(b, Seq("day"))
      .where(col("u1") < col("u2") &&
        col("st1") < col("en2") && col("st2") < col("en1"))
      .groupBy("day")
      .agg(count(lit(1)), sum(least(col("en1"), col("en2")) -
        greatest(col("st1"), col("st2"))))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == direct, s"sweep=$got direct=$direct")
    // the layout must actually exercise the tricky content: the point
    // u4 inside u1/u5 pairs at zero measure; the point u6 at a tied
    // START instant pairs with nothing; touching u3 never pairs
    assert(got(0L)._1 == 6L,
      "day 0: (1,2) (1,5) (2,5) (7,8) + zero-measure (1,4) (4,5)")
    assert(got(0L)._2 == 7200L + 200L + 200L + 1990L)
    assert(got(1L) == (1L, 50L))
    assert(!got.contains(2L), "pairless days are absent, like the join's")
  }

  test("attributionPairs equals the direct theta-join on window-boundary layouts") {
    import spark.implicits._
    val day = 86400L
    // clicks: exactly-at-window-edge (pes - 86400, included), one second
    // beyond (excluded), same-second tie (included), cross-midnight
    // window, different user (excluded), click after purchase (excluded)
    val clicks = Seq(
      (1L, 10L, 2 * day + 100L),       // in window of p1 (edge: pes - 86400)
      (1L, 11L, 2 * day + 99L),        // 1 s beyond the window — excluded
      (1L, 12L, 3 * day + 100L),       // same second as p1 — included
      (1L, 13L, 3 * day),              // midnight, in window of p1
      (2L, 14L, 2 * day + 100L),       // other user — excluded
      (1L, 15L, 3 * day + 101L)        // after p1 — excluded
    ).toDF("user_id", "click_id", "ces")
    val purchases = Seq(
      (1L, 100L, 3 * day + 100L),      // window [2d+100, 3d+100]
      (1L, 101L, 2 * day + 100L)       // window [1d+100, 2d+100]: catches click 10
    ).toDF("user_id", "purchase_id", "pes")
    val got = Events.attributionPairs(clicks, purchases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val direct = purchases.join(clicks, Seq("user_id"))
      .where(col("ces") >= col("pes") - day && col("ces") <= col("pes"))
      .select("purchase_id", "click_id")
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct)
    assert(got == Set((100L, 10L, 3L), (100L, 12L, 3L), (100L, 13L, 3L),
      (101L, 10L, 2L), (101L, 11L, 2L)),
      "edge click shared by both windows, tie included, beyond-edge excluded")
  }

  test("q235: the attributed bucket is the max-deviation cell of the alarm's own share table") {
    import spark.implicits._
    // planted histograms around the midnight-aligned split: type "x"
    // moves 3/4 of its mass from bucket 0 (epoch 0) to bucket 2
    // (epoch 1) — b0 deviation |7500−0| = 7500 bp TIES b2's |0−7500|,
    // and the tie resolves to the LOWER bucket; bucket 1 stays flat
    // (2500 bp each) and must not win
    val split = Events.driftSplitEs
    def ev(es: Long, v: Double) = (es, v, "x")
    val rows = Seq(
      // epoch 0: buckets [0,0,0,1] (values 1.00,1.00,1.00 → b0; 40.00 → b1)
      ev(split - 86400 + 1, 1.0), ev(split - 86400 + 2, 1.0),
      ev(split - 86400 + 3, 1.0), ev(split - 86400 + 4, 40.0),
      // epoch 1: buckets [2,2,2,1] (values 70.00 → b2; 40.00 → b1)
      ev(split + 1, 70.0), ev(split + 2, 70.0),
      ev(split + 3, 70.0), ev(split + 4, 40.0))
      .toDF("es", "value", "event_type")
    val shares = Events.driftShares(Events.driftCellCounts(rows))
    val top = shares
      .withColumn("dev", abs(col("pa") - col("pb")))
      .orderBy(col("dev").desc, col("bucket").asc).limit(1)
      .select("bucket", "pa", "pb").collect().head
    assert((top.getLong(0), top.getLong(1), top.getLong(2)) == ((0L, 7500L, 0L)))
    // and the alarm the attribution explains fires on the same cells:
    // TV = (7500 + 0 + 7500) / 2 = 7500 bp
    val alarm = Events.driftTable(Events.driftCellCounts(rows)).collect().head
    assert(alarm.getAs[Long]("tv_bp") == 7500L && alarm.getAs[Long]("drifted") == 1L)
  }

  test("q238: the integer power iteration replays by hand on a two-node chain; dangling mass drops") {
    // one session "a then b": edge a→b with n=1, tot(a)=1; b is a sink
    // (dangling — its mass is dropped, not redistributed). By hand:
    // r0 = 500000 each; every iteration r(a) = 150000/2 = 75000 (no
    // inbound); r1(b) = 75000 + 85·500000/100 = 500000,
    // r2(b) = r3(b) = 75000 + 85·75000/100 = 138750.
    val dir = writeMiniEventsTyped(Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b")))
    val got = Events.q238_type_pagerank(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("rank_ppm")).toMap
    assert(got == Map("a" -> 75000L, "b" -> 138750L), s"got $got")
  }

  test("q285: the quantile marks replay from sorted per-arm counts") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("q285_quantile_effect")(spark, sf).collect().head
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val perUser = Events.events(spark, sf).groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val arms = perUser.groupBy { case (u, _) => bucket(u) % 2 }
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    def mark(xs: Seq[Long], num: Long, den: Long): Long = {
      val n = xs.length.toLong
      xs((((n * num + den - 1) / den) - 1).toInt)
    }
    val c = arms(0L); val t = arms(1L)
    assert(row.getAs[Long]("n0") == c.length.toLong)
    assert(row.getAs[Long]("n1") == t.length.toLong)
    assert(row.getAs[Long]("qte_p25") == mark(t, 1, 4) - mark(c, 1, 4))
    assert(row.getAs[Long]("qte_p50") == mark(t, 1, 2) - mark(c, 1, 2))
    assert(row.getAs[Long]("qte_p75") == mark(t, 3, 4) - mark(c, 3, 4))
  }

  test("q284: session trigrams replay from an in-order fold; cross-session paths never form") {
    // user 1: one session view>click>purchase (+1 trailing view →
    // paths v>c>p and c>p>v); user 2: two sessions split by the gap —
    // the boundary must NOT form a path across it
    val gap = Events.sessionGapSeconds
    val dir = writeMiniEventsTyped(Seq(
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"),
      (3L, 1L, 300L, "purchase"), (4L, 1L, 400L, "view"),
      (5L, 2L, 100L, "view"), (6L, 2L, 200L, "click"),
      (7L, 2L, 200L + gap + 1L, "purchase"),
      (8L, 2L, 300L + gap + 1L, "view"), (9L, 2L, 400L + gap + 1L, "error")))
    val got = Events.q284_top_paths(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    assert(got == Map(
      "view>click>purchase" -> 1L, "click>purchase>view" -> 1L,
      "purchase>view>error" -> 1L), s"$got")
    // view>click>X across user 2's session boundary must be absent
    assert(!got.contains("view>click>error"))
  }

  test("q277: the winsorized mean clamps exactly at the histogram p5/p95 marks") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q277_winsorized_mean")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lo_c"), r.getAs[Long]("hi_c"),
          r.getAs[Long]("mean_c"), r.getAs[Long]("wmean_c")))).toMap
    val vals = Events.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    vals.foreach { case (tp, cs) =>
      val n = cs.length.toLong
      val lo = cs(((n + 19) / 20 - 1).toInt)
      val hi = cs(((n * 95 + 99) / 100 - 1).toInt)
      val wm = cs.map(c => math.min(math.max(c, lo), hi)).sum / n
      assert(got(tp) == ((n, lo, hi, cs.sum / n, wm)), tp)
      // winsorizing pulls the mean toward the middle, never outside marks
      assert(got(tp)._5 >= lo && got(tp)._5 <= hi)
    }
  }

  test("q271: bottom-k signatures obey the merge law; identical audiences estimate J = 10000") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = Events.events(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val single = rows(Events.audienceSig(ev))
    // merge law: split the audience on the id-hash, build each half's
    // signature blind to the other, merge by union → re-bottom-k
    val b = graft.ops.TextCore.idBucket(col("user_id"))
    val lo = Events.audienceSig(ev.where(b < 50))
    val hi = Events.audienceSig(ev.where(b >= 50))
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
    val merged = lo.unionByName(hi).distinct()
      .withColumn("rn", row_number().over(wm))
      .where(col("rn") <= Events.bkK).select("event_type", "h")
    assert(rows(merged) == single, "union → re-bottom-k must equal the single pass")
    // overlap tolerance (min is idempotent): re-merging a half changes nothing
    val remerged = lo.unionByName(hi).unionByName(lo).distinct()
      .withColumn("rn", row_number().over(wm))
      .where(col("rn") <= Events.bkK).select("event_type", "h")
    assert(rows(remerged) == single)
    // estimator sanity: two types with IDENTICAL audiences → J = 10000
    val twin = Seq((1L, "x"), (2L, "x"), (3L, "x"), (1L, "y"), (2L, "y"), (3L, "y"))
      .toDF("user_id", "event_type")
    val est = Events.audienceJaccardEst(Events.audienceSig(twin)).collect()
    assert(est.length == 1 && est(0).getAs[Long]("jacc_est_bp") == 10000L)
  }

  test("q265: the distributed rank iteration equals the q238-style driver recurrence; hour boundary drops the handoff") {
    // handoffs inside hour 0: 1→2, 2→1, 1→2 (again), 2→3; user 3's next
    // event opens hour 1, so the 3→1 handoff across the boundary is
    // DROPPED (the documented bucketing cost); inside hour 1: 1→3.
    // User 9 is an isolate (single event far away, no neighbors).
    val dir = writeMiniEvents(Seq(
      (1L, 1L, 10L), (2L, 2L, 20L), (3L, 1L, 30L), (4L, 2L, 40L),
      (5L, 2L, 50L), (6L, 3L, 60L),
      (7L, 1L, 3700L), (8L, 3L, 3800L),
      (9L, 9L, 90000L)))
    val got = Events.q265_user_pagerank(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rank_ppm")).toMap
    // edges with weights: 1→2 w2, 2→1 w1, 2→3 w1, 1→3 w1
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))
    val nodes = Seq(1L, 2L, 3L, 9L)
    val n = nodes.length.toLong
    val tot = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 3) {
      rank = nodes.map { i =>
        val in = edges.filter(_._2 == i)
          .map { case (j, _, w) => rank(j) * w / tot(j) }.sum
        i -> ((15L * 1000000L / 100) / n + 85L * in / 100)
      }.toMap
    }
    assert(got == rank, s"got $got expect $rank")
    // the isolate holds exactly the base rank (no in-edges ever)
    assert(got(9L) == (15L * 1000000L / 100) / 4L)
    // and rank flowed: user 3 (two in-edges, no competition from the
    // dropped boundary handoff) outranks the isolate
    assert(got(3L) > got(9L))
  }

  test("q236: the trailing window is 7 calendar days — day-0 users fall out of day 7's figure") {
    // day 0: users 1/2/3; day 3: user 9; day 7: users 4/5. The rolling
    // window is RANGE over calendar days (gaps contribute nothing), so
    // day 3 sees all four users while day 7 sees only days 1-7 —
    // {9, 4, 5} — the day-0 cohort has aged out.
    def at(day: Long, eid: Long, uid: Long) = (eid, uid, day * 86400L + eid)
    val dir = writeMiniEvents(Seq(
      at(0, 1, 1), at(0, 2, 2), at(0, 3, 3),
      at(3, 4, 9),
      at(7, 5, 4), at(7, 6, 5)))
    // the audit row (q261) carries the exact side; the serve row (q236)
    // must agree with its estimate column exactly (same register plan)
    val got = Events.q261_rolling_actives_audit(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Double]("est_7d")))).toMap
    assert(got.keySet == Set(0L, 3L, 7L), s"one row per ACTIVE day: $got")
    assert(got(0L)._1 == 3L)
    assert(got(3L)._1 == 4L)
    assert(got(7L)._1 == 3L, s"day 0's users must age out of day 7: $got")
    // the sketch estimate is present and positive on every emitted day
    got.values.foreach { case (_, est) => assert(est > 0.0) }
    val serve = Events.q236_rolling_actives(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("est_7d")).toMap
    assert(serve == got.view.mapValues(_._2).toMap,
      "serve row must equal the audit row's estimate column")
  }

  test("q207/q208: CUSUM and OLS slope replay from the daily counts") {
    val sf = "/root/testdata/sf0.001"
    val daily = Events.events(spark, sf)
      .groupBy(col("event_type"), expr("CAST(es div 86400 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap
    // q207: integer CUSUM recurrence replayed per type
    val cus = SparkEntry.queries("q207_cusum_changepoint")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    daily.foreach { case (tp, ds) =>
      val mu = ds.map(_._2).sum / ds.length
      var s = 0L
      ds.foreach { case (day, cnt) =>
        s = math.max(0L, s + (cnt - mu - mu / 10))
        val (gcnt, gcusum, galarm) = cus((tp, day))
        assert(gcnt == cnt && gcusum == s, s"$tp day $day")
        assert(galarm == (if (s > 2 * mu) 1L else 0L))
      }
    }
    // q208: OLS slope replayed per type (exact integer sums, one division)
    val tr = SparkEntry.queries("q208_daily_trend")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    daily.foreach { case (tp, ds) =>
      val n = ds.length.toLong
      val (sx, sy) = (ds.map(_._1).sum, ds.map(_._2).sum)
      val sxy = ds.map { case (x, y) => x * y }.sum
      val sx2 = ds.map { case (x, _) => x * x }.sum
      val den = n * sx2 - sx * sx
      val expected = if (den == 0) None
        else Some(math.floor((n * sxy - sx * sy).toDouble / den * 100 + 0.5).toLong)
      assert(tr(tp) == ((n, sy, expected)), s"$tp")
    }
  }

  test("q198: arm counts partition the users and the z statistic replays from the counts") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q198_ab_test")(spark, sf).head()
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val totalUsers = Events.events(spark, sf)
      .select("user_id").distinct().count()
    assert(n0 + n1 == totalUsers, "arms must partition the user set")
    assert(c0 <= n0 && c1 <= n1)
    assert(n0 > 0 && n1 > 0, "hash parity must populate both arms")
    // independent replay of the pooled two-proportion z from the counts
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p1 - p0) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    assert(r.getLong(5) == math.floor(z * 100 + 0.5).toLong)
    assert(r.getLong(6) == (if (math.abs(r.getLong(5)) >= 196) 1L else 0L))
  }

  test("q246: χ², n_req and the flags replay independently from the arm counts") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q246_ab_design")(spark, sf).head()
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 > 0 && n1 > 0)
    // the q198 spec already pins n0+n1 = all users and the arm split;
    // here: every derived column replays from the four counts
    assert(r.getLong(4) == (n0 - n1) * (n0 - n1) * 100 / (n0 + n1), "chi2")
    assert(r.getLong(5) == (if (r.getLong(4) >= 384) 1L else 0L), "srm")
    val (p0, p1) = (c0 * 10000 / n0, c1 * 10000 / n1)
    assert((r.getLong(6), r.getLong(7)) == ((p0, p1)))
    val delta = math.abs(p1 - p0)
    assert(r.getLong(8) == delta)
    if (delta > 0) {
      val num = 78400L * (p0 * (10000 - p0) + p1 * (10000 - p1))
      val den = 10000L * delta * delta
      val nreq = (num + den - 1) / den
      assert(r.getLong(9) == nreq, "n_req")
      // ceil really is ceil: n_req·den ≥ num > (n_req−1)·den
      assert(nreq * den >= num && (nreq - 1) * den < num)
      assert(r.getLong(10) == (if (math.min(n0, n1) >= nreq) 1L else 0L))
    }
  }

  test("q247: the CUPED moments, θ and adjusted lift replay from per-user rows") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q247_cuped")(spark, sf).head()
    val split = graft.ops.Events.driftSplitEs
    val users = Events.events(spark, sf).groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase" && col("es") < split, 1L)
          .otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" && col("es") >= split, 1L)
          .otherwise(0L)).as("y"))
      .withColumn("arm", graft.ops.TextCore.idBucket(col("user_id")) % lit(2L))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    val n = users.length.toLong
    def s(f: ((Long, Long, Long)) => Long) = users.map(f).sum
    val (sx, sy) = (s(_._1), s(_._2))
    val covN = BigInt(n) * s(u => u._1 * u._2) - BigInt(sx) * sy
    val varN = BigInt(n) * s(u => u._1 * u._1) - BigInt(sx) * sx
    val varYN = BigInt(n) * s(u => u._2 * u._2) - BigInt(sy) * sy
    assert(r.getLong(2) == (covN * covN * 10000 / (varN * varYN)).toLong, "rho2")
    val a0 = users.filter(_._3 == 0L); val a1 = users.filter(_._3 == 1L)
    val raw = a1.map(_._2).sum.toDouble / a1.length -
      a0.map(_._2).sum.toDouble / a0.length
    val theta = covN.toDouble / varN.toDouble
    val adj = raw - theta * (a1.map(_._1).sum.toDouble / a1.length -
      a0.map(_._1).sum.toDouble / a0.length)
    assert(r.getLong(3) == math.floor(raw * 1e6 + 0.5).toLong, "raw lift")
    assert(r.getLong(4) == math.floor(adj * 1e6 + 0.5).toLong, "adjusted lift")
    assert(r.getLong(5) == math.floor(theta * 1e6 + 0.5).toLong, "theta")
    // CUPED must not touch a balanced covariate: if the arms' mean x
    // were identical the adjustment would be 0; here just pin direction
    // consistency — the adjustment moves the lift against the covariate
    // imbalance, never with it
    val ximb = a1.map(_._1).sum.toDouble / a1.length -
      a0.map(_._1).sum.toDouble / a0.length
    if (theta > 0 && ximb > 0) assert(adj < raw)
    if (theta > 0 && ximb < 0) assert(adj > raw)
  }

  test("q254: Wilson bounds replay from arm counts and bracket the point rate") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q254_wilson_ci")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val z = 196.0 / 100
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val p = c.toDouble / n
      def wilson(sign: Double) = math.floor(
        ((p + z * z / (2.0 * n)) + sign * z *
          math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
          (1.0 + z * z / n) * 10000 + 0.5).toLong
      assert(r.getLong(3) == wilson(-1) && r.getLong(4) == wilson(1),
        s"arm ${r.getLong(0)}")
      // the interval brackets the point estimate and stays in [0, 10000]
      val pBp = c * 10000 / n
      assert(r.getLong(3) <= pBp && pBp <= r.getLong(4))
      assert(r.getLong(3) >= 0 && r.getLong(4) <= 10000)
    }
    // the separated flag is the integer disjointness of the two rows
    val Seq(a0, a1) = rows.sortBy(_.getLong(0)).toSeq
    val sep = if (a1.getLong(3) > a0.getLong(4) || a0.getLong(3) > a1.getLong(4)) 1L else 0L
    assert(rows.forall(_.getLong(5) == sep))
  }

  test("q252: Theil-Sen replays from daily counts and shrugs off an injected outlier") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q252_theilsen_trend")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val daily = Events.events(spark, sf)
      .groupBy(col("event_type"), expr("CAST(es div 86400 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    def theilSen(ds: Seq[(Long, Long)]): (Long, Long) = {
      val slopes = (for {
        Seq((da, ca), (db, cb)) <- ds.combinations(2).map(_.sortBy(_._1)).toSeq
      } yield math.floor((cb - ca) * 1000000.0 / (db - da)).toLong).sorted
      (slopes.length.toLong, slopes((slopes.length + 1) / 2 - 1))
    }
    daily.foreach { case (tp, ds) =>
      val (np, med) = theilSen(ds)
      assert(np == ds.length.toLong * (ds.length - 1) / 2, s"$tp pair count")
      assert(got(tp) == ((np, med)), s"$tp")
      // the robustness claim, demonstrated: corrupt ONE day with a 100x
      // burst — the median slope moves by less than the OLS slope does
      val burst = ds.updated(ds.length / 2, (ds(ds.length / 2)._1, ds(ds.length / 2)._2 * 100))
      val (_, medB) = theilSen(burst)
      def ols(xs: Seq[(Long, Long)]): Double = {
        val n = xs.length.toDouble
        val (sx, sy) = (xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
        val sxy = xs.map { case (x, y) => x.toDouble * y }.sum
        val sx2 = xs.map { case (x, _) => x.toDouble * x }.sum
        (n * sxy - sx * sy) / (n * sx2 - sx * sx) * 1e6
      }
      assert(math.abs(medB - med) < math.abs(ols(burst) - ols(ds)), s"$tp robustness")
    }
  }

  test("q252: even pair counts select the lower median (no vanishing type)") {
    // 4 days -> 6 pairs (EVEN): the r15 bug made (np+1)/2 a double 3.5
    // and the type silently vanished. Pin both parities explicitly.
    import spark.implicits._
    val daily = Seq(
      ("even4", 0L, 10L), ("even4", 1L, 20L), ("even4", 2L, 15L), ("even4", 3L, 40L),
      ("odd3", 0L, 5L), ("odd3", 1L, 9L), ("odd3", 2L, 6L))
      .toDF("event_type", "day", "cnt")
    val got = Events.theilSenFromDaily(daily).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def med(ds: Seq[(Long, Long)]): (Long, Long) = {
      val ss = ds.combinations(2).map(_.sortBy(_._1)).map { case Seq((da, ca), (db, cb)) =>
        math.floor((cb - ca) * 1000000.0 / (db - da)).toLong
      }.toSeq.sorted
      (ss.length.toLong, ss((ss.length + 1) / 2 - 1))
    }
    assert(got.keySet == Set("even4", "odd3"), "a parity must not drop a type")
    assert(got("even4") == med(Seq((0L, 10L), (1L, 20L), (2L, 15L), (3L, 40L))))
    assert(got("odd3") == med(Seq((0L, 5L), (1L, 9L), (2L, 6L))))
  }

  test("q251: the digit report replays from raw cents; the spine is densified") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q251_benford_values")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L), "all nine digits, in order")
    val cents = Events.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val byDigit = cents.groupBy(_.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val total = cents.length.toLong
    rows.foreach { r =>
      val d = r.getLong(0)
      val cnt = byDigit.getOrElse(d, 0L)
      assert(r.getLong(1) == cnt, s"digit $d count")
      assert(r.getLong(2) == cnt * 1000000L / total, s"digit $d obs")
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)), s"digit $d dev")
    }
    assert(rows.map(_.getLong(1)).sum == total, "counts partition the amounts")
    // the literal expected shares are the Benford table: decreasing,
    // summing to ~1e6 (floor loss < 9)
    val exp = rows.map(_.getLong(3))
    assert(exp.toSeq == exp.sortBy(-_).toSeq && math.abs(exp.sum - 1000000L) < 9)
  }

  test("q250: token-mass quantiles bound the count quantiles from above") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q250_token_mass_quantiles")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // driver replay from raw lengths
    val lens = graft.ops.TextCore.docShingles(spark, sf)
      .select(size(col("words")).cast("long").as("len")).where(col("len") > 0)
      .collect().map(_.getLong(0)).sorted
    val tw = lens.sum
    Seq(50L, 90L, 99L).foreach { p =>
      var cw = 0L
      val at = lens.distinct.find { v =>
        cw = lens.filter(_ <= v).sum; cw * 100 >= tw * p }.get
      val (lenAt, cumT, totT) = got(p)
      assert((lenAt, totT) == ((at, tw)), s"p$p")
      assert(cumT == lens.filter(_ <= at).sum, s"p$p cum")
      // mass quantile ≥ count quantile: token weighting shifts mass to
      // longer docs, never shorter
      val rank = math.ceil(p / 100.0 * lens.length).toInt
      assert(lenAt >= lens(rank - 1), s"p$p mass vs count")
    }
  }

  test("q240: SCD2 versions tile each user's timeline with monotone tiers") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q240_scd2_tier")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getLong(1)) // version_no
      // version numbering is dense from 1
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"user $u")
      // SCD2 tiling: each version's valid_to equals the next valid_from;
      // exactly one OPEN (NULL valid_to) version per user — the last
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $u: version ${a.getLong(1)} must close at the next version's start")
        case _ => ()
      }
      assert(sorted.last.isNullAt(4), s"user $u: last version must be open")
      assert(sorted.init.forall(!_.isNullAt(4)), s"user $u: only the last version is open")
      // the attribute is cumulative spend, so tiers strictly increase
      val tiers = sorted.map(_.getLong(2)).toSeq
      assert(tiers == tiers.sorted && tiers.distinct == tiers,
        s"user $u: cumulative tiers must be strictly monotone, got $tiers")
    }
    // every purchasing user has a history and starts at their first purchase day
    val firstPurchase = Events.events(spark, sf)
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.expr("es div 86400")).as("d0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser.keySet == firstPurchase.keySet)
    byUser.foreach { case (u, vs) =>
      assert(vs.minBy(_.getLong(1)).getLong(3) == firstPurchase(u),
        s"user $u: version 1 must open at the first purchase day")
    }
  }

  test("q241: the PIT buckets partition the click set; -1 is exactly pre-history") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q241_pit_tier_clicks")(spark, sf).collect()
    val ev = Events.events(spark, sf)
    val totalClicks = ev.where(col("event_type") === "click").count()
    assert(out.map(_.getLong(1)).sum == totalClicks,
      "every click lands in exactly one tier bucket")
    // the -1 bucket = clicks strictly before the user's first version
    // (or by users with no purchase history) — replayed independently
    val firstV = Events.tierVersions(ev)
      .groupBy("user_id").agg(min("valid_from_day").as("v0"))
    val pre = ev.where(col("event_type") === "click")
      .select(col("user_id"), expr("es div 86400").as("day"))
      .join(firstV, Seq("user_id"), "left")
      .where(col("v0").isNull || col("day") < col("v0"))
      .count()
    assert(out.find(_.getLong(0) == -1L).map(_.getLong(1)).getOrElse(0L) == pre)
  }

  test("q242: the histogram rank formula equals the brute-force pair count") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q242_ab_effect_auc")(spark, sf).head()
    val users = Events.events(spark, sf).groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .withColumn("arm", graft.ops.TextCore.idBucket(col("user_id")) % lit(2L))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    val a0 = users.filter(_._2 == 0L).map(_._1)
    val a1 = users.filter(_._2 == 1L).map(_._1)
    // brute force: 2·U₁ = Σ over (x0, x1) pairs of 2·[x1 > x0] + [x1 = x0]
    val u2 = (for (x0 <- a0; x1 <- a1)
      yield if (x1 > x0) 2L else if (x1 == x0) 1L else 0L).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((a0.length.toLong, a1.length.toLong, u2)))
    assert(r.getLong(3) == u2 * 10000 / (2L * a0.length * a1.length))
  }

  test("q288: cohorts by first day, mark offsets only, truncating bp") {
    import spark.implicits._
    val days = Seq(
      // cohort 0, size 4: u1 retains at 1 and 3, u2 at 14, u3 never,
      // u6 only at the off-mark offset 2 (counts toward size, no row)
      (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 0L), (2L, 14L),
      (3L, 0L),
      (6L, 0L), (6L, 2L),
      // cohort 5, size 2: u4 at 1/7/14, u5 at 3
      (4L, 5L), (4L, 6L), (4L, 12L), (4L, 19L),
      (5L, 5L), (5L, 8L)
    ).toDF("user_id", "day")
    val got = Events.retentionTriangle(days).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      (0L, 1L) -> ((4L, 1L, 2500L)), (0L, 3L) -> ((4L, 1L, 2500L)),
      (0L, 14L) -> ((4L, 1L, 2500L)),
      (5L, 1L) -> ((2L, 1L, 5000L)), (5L, 3L) -> ((2L, 1L, 5000L)),
      (5L, 7L) -> ((2L, 1L, 5000L)), (5L, 14L) -> ((2L, 1L, 5000L))))
  }

  test("q291: embargo strictly flanks the test block; counts partition the corpus") {
    import spark.implicits._
    // width 10, gap 2; days span folds 0..3 with boundary-adjacent days
    val daily = Seq(
      (0L, 5L), (9L, 7L),            // fold 0
      (10L, 11L), (12L, 1L), (19L, 3L), // fold 1
      (20L, 2L), (22L, 9L),          // fold 2
      (31L, 4L)                      // fold 3
    ).toDF("day", "cnt")
    val total = 5L + 7 + 11 + 1 + 3 + 2 + 9 + 4
    val got = Events.purgedSplitReport(daily).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // fold 0: test {0,9}=12; embargo [−2,11]\fold = {10,11}→day10=11
    assert(got(0L) == ((0L, 9L, 12L, 11L, total - 12L - 11L)))
    // fold 1: test {10,12,19}=15; embargo [8,21]\fold = {9→7, 20→2}
    assert(got(1L) == ((10L, 19L, 15L, 9L, total - 15L - 9L)))
    // fold 2: test {20,22}=11; embargo [18,31]\fold = {19→3, 31→4}
    assert(got(2L) == ((20L, 29L, 11L, 7L, total - 11L - 7L)))
    // fold 3: test {31}=4; embargo [28,41]\fold = ∅ (28/29 absent)
    assert(got(3L) == ((30L, 39L, 4L, 0L, total - 4L)))
    // counts partition the corpus in every fold
    got.values.foreach { case (_, _, t, e, tr) => assert(t + e + tr == total) }
  }

  test("q292: a 3-day shifted copy correlates perfectly at lag +3 and wins best") {
    import spark.implicits._
    // x over days 0..19 (non-collinear); y_d = x_{d−3} on days 3..22.
    // 20 days keep every lag in [−7, 7] at n ≥ 10 pairs — with only 2
    // pairs ANY lag correlates at |r| = 1 (two points define a line)
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L,
      5L, 8L, 9L, 7L, 9L, 3L, 2L, 3L, 8L, 4L)
    val x = xs.zipWithIndex.map { case (v, d) => (d.toLong, v) }.toDF("day", "x")
    val y = xs.zipWithIndex.map { case (v, d) => (d.toLong + 3L, v) }
      .toDF("yday", "y")
    val rows = Events.leadLagSweep(x, y).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2), r.getLong(3))))
      .toMap
    // at lag +3 every pair is (v, v): r = 1.0 exactly → 10000, best
    assert(rows(3L) == ((20L, 10000L, 1L)))
    // every other lag is strictly weaker and not best
    rows.filter(_._1 != 3L).foreach { case (lag, (_, r, b)) =>
      assert(r < 10000L && b == 0L, s"lag $lag: r=$r best=$b")
    }
  }

  test("q293: a level shift splits at its boundary; a constant series gains zero") {
    import spark.implicits._
    val daily =
      ((0L to 4L).map(d => ("t", d, 10L)) ++ (5L to 9L).map(d => ("t", d, 50L)) ++
        (0L to 4L).map(d => ("c", d, 7L)))
        .toDF("event_type", "day", "cnt")
    val got = Events.changepointReport(daily).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // t: split at day 5, means 10 / 50; gain vs flat-30 baseline:
    // score = (50²+250²)·10⁴/5 = 1.3e8·10⁴/...: base = 300²·10⁴/10 =
    // 9e7·10⁴... gain_bp = (130e6−90e6)·10⁴/90e6 = 4444
    assert(got("t") == ((5L, 5L, 5L, 10L, 50L, 4444L)))
    // c: every split scores the baseline — earliest candidate, gain 0
    assert(got("c") == ((1L, 1L, 4L, 7L, 7L, 0L)))
  }

  test("q294: hand Lorenz layout with a tie block — G = 10/32 exactly") {
    import spark.implicits._
    // spends 1,1,2,4: Σi·x = (1+2)·1 + 3·2 + 4·4 = 25; n=4, S=8
    // G = (2·25 − 5·8)/(4·8) = 10/32 → 3125 bp
    val spend = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 4L))
      .toDF("user_id", "cents")
    val r = Events.giniFromSpend(spend).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 8L, 3125L)))
  }

  test("q295: Poisson-ish stays under the flag, a bursty series fires, singleton NULL") {
    import spark.implicits._
    val daily = Seq(
      ("p", 0L, 4L), ("p", 1L, 5L), ("p", 2L, 6L),
      ("b", 0L, 1L), ("b", 1L, 1L), ("b", 2L, 28L),
      ("s", 0L, 9L)
    ).toDF("event_type", "day", "cnt")
    val got = Events.dispersionFromDaily(daily).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))).toMap
    // p: (3·77 − 225)·10⁴ / (2·15) = 6·10⁴/30 = 2000
    assert(got("p") == ((3L, 2000L, 0L)))
    // b: (3·786 − 900)·10⁴ / (2·30) = 1458·10⁴/60 = 243000
    assert(got("b") == ((3L, 243000L, 1L)))
    assert(got("s") == ((1L, -1L, 0L)))
  }

  test("q296: pair support, Jaccard and lift on a hand co-click layout") {
    import spark.implicits._
    // u1:{1,2} u2:{1,2} u3:{1,3} → (1,2) co=2, (1,3) co=1
    val ui = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L))
      .toDF("user_id", "k")
    val got = Events.cooccurrenceTopPairs(ui).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (1,2): jac = 2·10⁴/(3+2−2) = 6666; lift = 2·3·10⁴/(3·2) = 10000
    assert(got((1L, 2L)) == ((2L, 6666L, 10000L)))
    // (1,3): jac = 1·10⁴/3 = 3333; lift = 1·3·10⁴/(3·1) = 10000
    assert(got((1L, 3L)) == ((1L, 3333L, 10000L)))
    assert(!got.contains((2L, 3L)), "never-co-clicked pairs are absent")
  }

  test("q328: migration codes each half independently; inactive halves take code 0") {
    import spark.implicits._
    // days 0..9 → split = 9 div 2 + 1 = 5. Active-in-A counts {u1:4,
    // u2:1, u4:2} (n=3) code 1/4/7 by min-rank; B counts {u1:2, u3:1,
    // u4:3} code 4/1/7
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (1L, 5L), (1L, 6L),
      (2L, 0L),
      (3L, 9L),
      (4L, 0L), (4L, 1L), (4L, 5L), (4L, 6L), (4L, 7L)
    ).toDF("user_id", "day")
    val got = Events.decileMigration(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 1L) -> 1L, (1L, 0L) -> 1L,
      (4L, 7L) -> 1L, (7L, 4L) -> 1L))
  }

  test("q330: censored users hold the at-risk denominator but never a numerator") {
    import spark.implicits._
    // horizon e = 34: u1 (tenure wk 0) and u2 (wk 2) churned (l ≥ 14
    // days before e); u3 (wk 3, l = e) censored
    val ev = Seq((1L, 0L), (2L, 0L), (2L, 20L), (3L, 10L), (3L, 34L))
      .toDF("user_id", "day")
    val got = Events.tenureHazard(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // at-risk suffix-sums the tenure histogram: wk0 all 3, wk2 the 2
    // survivors, wk3 the censored 1 (hazard 0 — no churn evidence)
    assert(got.toSeq == Seq((0L, 3L, 1L, 3333L), (2L, 2L, 1L, 5000L),
      (3L, 1L, 0L, 0L)))
  }

  test("q329: densePairGrid equals the self-join grid; duplicates fold as set semantics") {
    import spark.implicits._
    // duplicate (u1, 1) row must count once in every statistic —
    // cooccurrencePairGrid's caller distincts, densePairGrid's
    // collect_set absorbs it in-plan
    val raw = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L)).toDF("user_id", "k")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("k1", "k2", "co_users", "jaccard_bp", "lift_bp")
      .collect().map(_.toSeq).toSet
    assert(rows(Events.densePairGrid(raw)) ==
      rows(Events.cooccurrencePairGrid(raw.distinct())))
    assert(rows(Events.densePairGrid(raw)).nonEmpty)
  }

  test("q306: the neighbor table is the mirrored grid, ranked per item") {
    import spark.implicits._
    val ui = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L))
      .toDF("user_id", "k")
    val got = Events.itemNeighbors(ui).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // item 1 ranks 2 (co=2) above 3 (co=1); items 2 and 3 each see the
    // SWAPPED row with identical symmetric statistics
    assert(got((1L, 1)) == ((2L, 2L, 6666L, 10000L)))
    assert(got((1L, 2)) == ((3L, 1L, 3333L, 10000L)))
    assert(got((2L, 1)) == ((1L, 2L, 6666L, 10000L)))
    assert(got((3L, 1)) == ((1L, 1L, 3333L, 10000L)))
    assert(got.size == 4)
  }

  test("q298: impurity 0 for a rail, exact 3750 bp for a 3:1 split") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("d", "e", 5L))
      .toDF("from_type", "to_type", "n")
    val got = Events.impurityFromEdges(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // a: 1 − (9+1)/16 = 6/16 → 3750 bp; d: certain next step → 0
    assert(got("a") == ((4L, 2L, 3750L)))
    assert(got("d") == ((5L, 1L, 0L)))
  }

  test("q299: φ² = 1 on a perfectly dependent 2×2, 0 on exact independence") {
    import spark.implicits._
    val dep = Seq((0L, "A", 10L), (1L, "B", 10L)).toDF("wd", "event_type", "o")
    val rd = Events.chi2FromCells(dep).collect().head
    assert((rd.getLong(0), rd.getLong(1), rd.getLong(2), rd.getLong(3),
      rd.getLong(4), rd.getLong(5)) == ((20L, 2L, 1L, 10000L, 10000L, 1L)))
    val ind = Seq((0L, "A", 5L), (0L, "B", 5L), (1L, "A", 5L), (1L, "B", 5L))
      .toDF("wd", "event_type", "o")
    val ri = Events.chi2FromCells(ind).collect().head
    assert((ri.getLong(3), ri.getLong(4), ri.getLong(5)) == ((0L, 0L, 0L)))
  }

  test("q300: HDR bucket geometry — lb(id) ≤ v < next lb, ids monotone, small values exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val vs = Seq(1L, 2L, 15L, 16L, 17L, 31L, 32L, 255L, 256L, 257L,
      4902L, 65535L, 65536L, (1L << 31) - 1, 1L << 31, (1L << 62) - 1)
    val rows = vs.toDF("vc")
      .select(col("vc"), expr(Events.hdrBucketSql("vc")).as("id"))
      .withColumn("lb", expr(Events.hdrLbSql("id")))
      .withColumn("lbNext", expr(Events.hdrLbSql("(id + 1)")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (v, _, lb, lbNext) =>
      assert(lb <= v && v < lbNext, s"v=$v lb=$lb next=$lbNext")
      // the 1/16 relative-error contract: bucket width ≤ lb/16 for v ≥ 16
      if (v >= 16) assert(lbNext - lb <= lb / 16, s"v=$v width=${lbNext - lb}")
    }
    // ids monotone in v; values < 16 are their own (exact) bucket
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    rows.filter(_._1 < 16).foreach { case (v, id, lb, _) =>
      assert(id == v && lb == v)
    }
  }

  test("q300: HDR cells are additive — shard sketches sum to the whole-corpus sketch") {
    import spark.implicits._
    val cents = (1L to 200L).map(i => ("click", i * i % 977 + 1))
    val whole = Events.hdrCells(cents.toDF("event_type", "vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (a, b) = cents.splitAt(73)
    val merged = (Events.hdrCells(a.toDF("event_type", "vc")).collect() ++
      Events.hdrCells(b.toDF("event_type", "vc")).collect())
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(merged == whole)
  }

  test("q304: absorption recursion on a hand graph — common-denominator ppm") {
    // a → buy (1) / a → b (1); b → buy (2). h1(a) = 1e6/2; h2(a) = 1e6
    // (the a → b path reaches buy on the second step); buy itself never
    // recurses (absorbing); c has no outgoing edges → 0 at every step.
    val edges = Seq(("a", "purchase", 1L), ("a", "b", 1L),
      ("b", "purchase", 2L), ("purchase", "c", 1L))
    val got = graft.ops.Events.absorptionFold(edges, "purchase")
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((500000L, 1000000L, 1000000L)))
    assert(got("b") == ((1000000L, 1000000L, 1000000L)))
    assert(got("c") == ((0L, 0L, 0L)))
    // 'purchase' as a START: its only move is to c, which never converts
    assert(got("purchase") == ((0L, 0L, 0L)))
  }

  test("q309: seasonal-naive backtest — only lag-7-paired days score") {
    import spark.implicits._
    // week 1 flat 10, week 2 flat 12 → 7 pairs, |err| = 2 each:
    // MAE = 2, MAPE = 14·10⁴/84 = 1666
    val daily = ((0L to 6L).map(d => ("t", d, 10L)) ++
      (7L to 13L).map(d => ("t", d, 12L))).toDF("event_type", "day", "cnt")
    val r = Events.backtestFromDaily(daily).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("t", 7L, 2L, 1666L)))
  }

  test("q312: churned/new/retained partition the two-week actives") {
    import spark.implicits._
    // dmax = 27: curr = [21, 27], prev = [14, 20]
    val days = Seq((1L, 15L), (1L, 22L), // retained
      (2L, 16L),                          // churned
      (3L, 25L),                          // new
      (4L, 5L), (4L, 27L)                 // old activity + curr → new? no:
      // u4 has prev=0 (day 5 < 14), curr=1 → counts as new
    ).toDF("user_id", "day")
    val r = Events.churnFromDays(days).collect().head
    // prev = {u1, u2} = 2; curr = {u1, u3, u4} = 3; churned = {u2};
    // new = {u3, u4}; retained = {u1}; churn_bp = 1·10⁴/2
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 3L, 1L, 2L, 1L, 5000L)))
  }

  test("q321: a hand flap sequence counts its switches; calendar gaps pair nothing") {
    import spark.implicits._
    // type t: day 0 all in bucket 0, day 1 all in bucket 1, day 2
    // bucket 1, day 3 bucket 0, day 4 bucket 0 → pair TVs
    // 10000, 0, 10000, 0 → alarms 1,0,1,0 → 3 switches
    val cells = Seq(
      ("t", 0L, 0L, 10L), ("t", 1L, 1L, 10L), ("t", 2L, 1L, 10L),
      ("t", 3L, 0L, 10L), ("t", 4L, 0L, 10L),
      // g: days 0 and 2 only — the missing day 1 must produce NO
      // phantom pair (an empty side would read as 50% TV)
      ("g", 0L, 0L, 5L), ("g", 2L, 0L, 5L),
      // h: pairs at days 0 and 4 (days 0,1 then 4,5 present) with
      // opposite alarm states — the 3-day gap BETWEEN pairs must not
      // count as a switch (adjacency guard)
      ("h", 0L, 0L, 9L), ("h", 1L, 1L, 9L),
      ("h", 4L, 2L, 9L), ("h", 5L, 2L, 9L)
    ).toDF("event_type", "day", "bucket", "cnt")
    val got = Events.flapFromCells(cells).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("t") == ((4L, 2L, 10000L, 3L)))
    assert(!got.contains("g"), "gap days must not fabricate pairs")
    // h: pair(0) TV=10000 alarm, pair(4) TV=0 no alarm — 2 pairs,
    // 1 alarm, 0 switches because the pairs are not day-adjacent
    assert(got("h") == ((2L, 1L, 10000L, 0L)))
  }

  test("q324: cohort LTV marks accumulate through the offsets") {
    import spark.implicits._
    val first = Seq((1L, 0L), (2L, 0L), (3L, 10L)).toDF("user_id", "cohort_day")
    val spend = Seq(
      (1L, 0L, 100L),  // day-0 purchase
      (1L, 7L, 50L),   // inside d7
      (2L, 10L, 30L),  // inside d14 only
      (3L, 12L, 80L)   // cohort 10, offset 2 → d7 and d14
    ).toDF("user_id", "day", "cents")
    val got = Events.ltvCurve(first, spend).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // cohort 0 (2 users): d0 = 100, d7 = 150, d14 = 180; ltv7 = 75, ltv14 = 90
    assert(got(0L) == ((2L, 100L, 150L, 180L, 75L, 90L)))
    // cohort 10 (1 user): purchase at offset 2 lands in d7 and d14
    assert(got(10L) == ((1L, 0L, 80L, 80L, 80L, 80L)))
  }

  test("q290: KS from known ECDFs — max gap, tie to lowest cent, one-sided NULL") {
    import spark.implicits._
    val cells = Seq(
      // t: a=(1,1,1,2) b=(2,2,3,3) → D at cent 1: |3·4−0·4|=12 of 16
      ("t", 0L, 1L, 3L), ("t", 0L, 2L, 1L),
      ("t", 1L, 2L, 2L), ("t", 1L, 3L, 2L),
      // u: a={1,3} b={2,4} → gap 2/4 attained at cents 1 AND 3 → cent 1
      ("u", 0L, 1L, 1L), ("u", 0L, 3L, 1L),
      ("u", 1L, 2L, 1L), ("u", 1L, 4L, 1L),
      // v: epoch 1 empty → ks NULL, drifted 0
      ("v", 0L, 5L, 2L)
    ).toDF("event_type", "epoch", "cent", "cnt")
    val got = Events.ksFromCells(cells).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got("t") == ((4L, 4L, 7500L, 1L, 1L)))
    assert(got("u") == ((2L, 2L, 5000L, 1L, 1L)))
    assert(got("v") == ((2L, 0L, -1L, 5L, 0L)))
  }

  test("q331: attribution fold — null-sink removal, never renormalized") {
    // (start) → {A 2, B 2}; A → buy 2; B → C 2; C → {buy 1, D 1}.
    // base h3((start)) = (2·1e6 + 2·5e5) / 4 = 750000.
    // Removing A drops its OUTGOING edge only: (start)'s denominator
    // stays 4 (the 2 sessions entering A still spend mass), so the
    // removed reach is (2·0 + 2·5e5)/4 = 250000 — a renormalized fold
    // would read 500000, which is exactly the bug this pins.
    // D has no outgoing edges, so its removal drops nothing.
    val edges = Seq(("(start)", "A", 2L), ("(start)", "B", 2L),
      ("A", "purchase", 2L), ("B", "C", 2L),
      ("C", "purchase", 1L), ("C", "D", 1L))
    val got = graft.ops.Events.attributionFold(
      edges, "purchase", Seq("A", "B", "C", "D"))
    assert(got == Seq(
      ("A", 750000L, 250000L),
      ("B", 750000L, 500000L),
      ("C", 750000L, 500000L),
      ("D", 750000L, 750000L)))
    // monotonicity under truncation: removal never INCREASES reach
    assert(got.forall { case (_, base, removed) => removed <= base })
  }

  test("q334: iterated h-index converges to coreness on a triangle + tail") {
    import spark.implicits._
    // triangle A–B–C (the 2-core) with pendant D on A (the 1-core).
    // degrees: A 3, B 2, C 2, D 1. One h-index step already lands on
    // the exact coreness here; further steps must be FIXED POINTS —
    // the monotone-convergence property the fixed horizon rides on.
    val und = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("A", "D"))
    val adj = (und ++ und.map(_.swap)).toDF("v", "u")
    var cor = adj.groupBy("v").agg(count(lit(1)).as("c"))
    val trajectory = (1 to graft.ops.Events.coreIters).map { _ =>
      cor = graft.ops.Events.hIndexStep(adj, cor)
      cor.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val expected = Map("A" -> 2L, "B" -> 2L, "C" -> 2L, "D" -> 1L)
    assert(trajectory.head == expected)   // one step reaches coreness
    assert(trajectory.forall(_ == expected)) // ...and stays there
  }

  test("q337: U-shaped credits — every conversion splits to exactly 10000 bp") {
    import spark.implicits._
    // five journeys: k = 1 (all 10000), k = 2 (5000/5000), k = 3
    // (4000/2000/4000), k = 5 (the remainder case: interior 2000/3 =
    // 666 each, +2 to the FIRST interior → 668/666/666), a session
    // with no purchase (credits nothing), a purchase-first session
    // (no touches — the trailing view must not be credited), and a
    // double-purchase session (only the FIRST purchase converts)
    val rows = Seq(
      (1L, 1L, 10L, 1L, "view"), (1L, 1L, 20L, 2L, "purchase"),
      (2L, 1L, 10L, 1L, "view"), (2L, 1L, 20L, 2L, "click"),
      (2L, 1L, 30L, 3L, "purchase"),
      (3L, 1L, 10L, 1L, "view"), (3L, 1L, 20L, 2L, "click"),
      (3L, 1L, 30L, 3L, "signup"), (3L, 1L, 40L, 4L, "purchase"),
      (4L, 1L, 10L, 1L, "view"), (4L, 1L, 20L, 2L, "click"),
      (4L, 1L, 30L, 3L, "click"), (4L, 1L, 40L, 4L, "click"),
      (4L, 1L, 50L, 5L, "signup"), (4L, 1L, 60L, 6L, "purchase"),
      (5L, 1L, 10L, 1L, "view"), (5L, 1L, 20L, 2L, "click"),
      (6L, 1L, 10L, 1L, "purchase"), (6L, 1L, 20L, 2L, "view"),
      (7L, 1L, 10L, 1L, "view"), (7L, 1L, 20L, 2L, "purchase"),
      (7L, 1L, 30L, 3L, "click"), (7L, 1L, 40L, 4L, "purchase"))
      .toDF("user_id", "session_id", "es", "event_id", "event_type")
    val got = graft.ops.Events.positionCredits(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("view") == ((5L, 33000L, 6600L)))
    assert(got("click") == ((5L, 9000L, 1800L)))
    assert(got("signup") == ((2L, 8000L, 1600L)))
    assert(!got.contains("error") && !got.contains("purchase"))
    // the invariant: total credit = 10000 per converting-with-touch
    // session (5 here), and the k = 5 remainder landed (668+666+666)
    assert(got.values.map(_._2).sum == 50000L)
  }

  test("q344: dyad census — mutual counted once, asym, null, reciprocity") {
    import spark.implicits._
    // directed: 1↔2 (mutual), 1→3 (asym); node 4 is isolated.
    // dyads C(4,2) = 6 → null = 6 − 1 − 1 = 4; reciprocity 2M/E = 2/3
    val ed = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val nn = Seq(4L).toDF("n").agg(max("n").as("n_nodes"))
    val r = graft.ops.Events.dyadCensus(ed, nn).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((4L, 3L, 1L, 1L, 4L, 6666L)))
  }

  test("q341: exact modularity — two cliques, one community, anti-communities") {
    import spark.implicits._
    // two triangles bridged by one edge: m = 7, each clique a community
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    def labs(m: Map[Long, Long]) =
      m.toSeq.toDF("user_id", "hr")
    def q(labels: Map[Long, Long]): Long =
      graft.ops.Events.modularityFromParts(und, labs(labels))
        .collect().head.getLong(3)
    // aligned: L = 3+3, D = 7+7 → Q·4m² = 2·(84−49) = 70 → 3571 bp
    assert(q(Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
      == 3571L)
    // one community holds everything → Q = 0 exactly (the known case)
    assert(q(Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L, 6L -> 0L))
      == 0L)
    // communities cut ACROSS the cliques: zero intra edges, Q·4m² = −66
    // → −3367 bp with toward-zero truncation (−3368 would be flooring)
    assert(q(Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 6L -> 2L))
      == -3367L)
  }

  test("q336: Kendall's W — perfect agreement, perfect churn, membership rule") {
    import spark.implicits._
    // two weeks, same ordering a > b > c → W = 10000 exactly
    val same = Seq((0L, "a", 30L), (0L, "b", 20L), (0L, "c", 10L),
      (1L, "a", 9L), (1L, "b", 8L), (1L, "c", 7L))
      .toDF("week", "event_type", "cnt")
    val r1 = graft.ops.Events.concordanceFromWeekly(same).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 3L, 10000L)))
    // week 2 reversed → every rank sum is equal → W = 0
    val churn = Seq((0L, "a", 30L), (0L, "b", 20L), (0L, "c", 10L),
      (1L, "a", 7L), (1L, "b", 8L), (1L, "c", 9L))
      .toDF("week", "event_type", "cnt")
    val r2 = graft.ops.Events.concordanceFromWeekly(churn).collect().head
    assert(r2.getLong(2) == 0L)
    // a type absent from one week is EXCLUDED and must not occupy a
    // rank: d tops week 0 but is missing in week 1 — the full-type
    // ranking is the `same` matrix and W stays exactly 10000
    val partial = Seq((0L, "d", 99L)) ++ Seq((0L, "a", 30L), (0L, "b", 20L),
      (0L, "c", 10L), (1L, "a", 9L), (1L, "b", 8L), (1L, "c", 7L))
    val r3 = graft.ops.Events.concordanceFromWeekly(
      partial.toDF("week", "event_type", "cnt")).collect().head
    assert((r3.getLong(1), r3.getLong(2)) == ((3L, 10000L)))
  }

  test("q332: Mann–Kendall S, tie-corrected variance, toward-zero tau") {
    import spark.implicits._
    val daily = Seq(
      // strictly increasing: S = pairs = 6, no ties, var18 = 4·3·13
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L), ("up", 4L, 4L),
      // one tied pair: S = 2 of 3, tie18 = 2·1·9 = 18, var18 = 66−18
      ("tied", 1L, 5L), ("tied", 2L, 5L), ("tied", 3L, 7L),
      // decreasing with a tie: S = −2 of 3 pairs → tau truncates toward
      // zero to −6666 (a flooring engine would emit −6667 — the pin)
      ("down", 1L, 9L), ("down", 2L, 4L), ("down", 3L, 4L),
      // single active day: no pairs, tau NULL, var18 = 0
      ("solo", 1L, 3L)).toDF("event_type", "day", "cnt")
    val got = graft.ops.Events.mannKendallFromDaily(daily).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    assert(got("up") == ((4L, 6L, 6L, 156L, 10000L)))
    assert(got("tied") == ((3L, 3L, 2L, 48L, 6666L)))
    assert(got("down") == ((3L, 3L, -2L, 48L, -6666L)))
    assert(got("solo") == ((1L, 0L, 0L, 0L, null)))
  }

  test("handoffEdges memo: builds once per session and equals the direct lag derivation") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    // identity — the r18 regression guard: all five graph queries must
    // read the SAME materialized artifact, not re-run the corpus pass
    val memo = Events.handoffEdges(spark, d)
    assert(memo eq Events.handoffEdges(spark, d))
    assert(Events.simpleHandoffEdges(spark, d) eq Events.simpleHandoffEdges(spark, d))
    assert(Events.userIds(spark, d) eq Events.userIds(spark, d))
    // parity with the direct per-bucket lag pass the r17 query bodies
    // inlined (weights included — the memo is the most general artifact)
    val wh = Window.partitionBy("hb").orderBy("es", "event_id")
    val direct = Events.events(spark, d)
      .select(col("user_id"), col("es"), col("event_id"))
      .withColumn("hb", expr("es div 3600"))
      .withColumn("src", lag("user_id", 1).over(wh))
      .where(col("src").isNotNull && col("src") =!= col("user_id"))
      .groupBy(col("src"), col("user_id").as("dst"))
      .agg(count(lit(1)).as("w"))
    val got = memo.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the simple graph is the least/greatest distinct of the memo
    val simple = Events.simpleHandoffEdges(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantSimple = got.map { case (s0, d0, _) =>
      (math.min(s0, d0), math.max(s0, d0)) }
    assert(simple == wantSimple)
    assert(simple.forall { case (a, b) => a < b })
  }

  test("transitionGapCells memo: builds once and equals the direct lead-pass marginal") {
    val d = "/root/testdata/sf0.001"
    val memo = Events.transitionGapCells(spark, d)
    assert(memo eq Events.transitionGapCells(spark, d))
    // parity with the per-rep pass the r17 bodies ran: the cells are the
    // (from, to, gap) marginal of the sessionized lead rows
    val want = Events.transitionGapRows(spark, d)
      .groupBy(col("event_type"), col("next_type"), col("gap_s"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got = memo.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the transition matrix folds from the cells losslessly
    val mat = Events.sessionTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val wantMat = want.groupBy(t => (t._1, t._2)).map { case ((f, t), g) =>
      (f, t, g.toSeq.map(_._4).sum) }.toSet
    assert(mat == wantMat)
  }

  test("sessionEntryExit memo: equals the windowed first/last derivation; q331 edges decompose onto it") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    val memo = Events.sessionEntryExit(spark, d)
    assert(memo eq Events.sessionEntryExit(spark, d))
    val sess = Events.withSessionIds(Events.events(spark, d)
      .select(col("user_id"), col("event_id"), col("es"), col("event_type")))
    val w = Window.partitionBy("user_id", "session_id")
      .orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val want = sess
      .withColumn("entry", first("event_type").over(w))
      .withColumn("exit", last("event_type").over(w))
      .withColumn("ne", count(lit(1)).over(w))
      .groupBy("user_id", "session_id")
      .agg(max("entry").as("entry"), max("exit").as("exit"), max("ne").as("ne"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    val got = memo.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // q331's edge decomposition: interior (= the transition matrix) plus
    // one (start)->entry edge per session must equal the single
    // coalesce(lag, start) pass the r17 body ran
    val ws = Window.partitionBy("user_id", "session_id").orderBy("es", "event_id")
    val direct = sess
      .withColumn("from_type",
        coalesce(lag("event_type", 1).over(ws), lit("(start)")))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val interior = Events.sessionTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val entries = got.groupBy(_._3).map { case (t, g) =>
      ("(start)", t, g.size.toLong) }
    assert((interior.toSet ++ entries) == direct)
  }

  test("dailyCells memo: builds once, equals the direct daily marginal; weekday contingency folds from it") {
    val d = "/root/testdata/sf0.001"
    val memo = Events.dailyCells(spark, d)
    assert(memo eq Events.dailyCells(spark, d))
    assert(Events.driftCells(spark, d) eq Events.driftCells(spark, d))
    assert(Events.ksCells(spark, d) eq Events.ksCells(spark, d))
    val want = Events.events(spark, d)
      .groupBy(col("event_type"), expr("CAST(es div 86400 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = memo.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the q299 weekday contingency folds from the daily cells exactly
    // (same weekday arithmetic, summed day counts == counted events)
    val derived = memo
      .select(expr("(day + 4) % 7").as("wd"), col("event_type"), col("cnt"))
      .groupBy("wd", "event_type").agg(sum("cnt").as("o")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val direct = Events.events(spark, d)
      .select(expr("(es div 86400 + 4) % 7").as("wd"), col("event_type"))
      .groupBy("wd", "event_type").agg(count(lit(1)).as("o")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(derived == direct)
  }

  test("driftDayCells memo equals the direct day-grain marginal; the epoch cells fold from it (r19)") {
    val d = "/root/testdata/sf0.001"
    val memo = Events.driftDayCells(spark, d)
    assert(memo eq Events.driftDayCells(spark, d)) // one build
    val want = Events.events(spark, d)
      .select(col("event_type"), expr("es div 86400").as("day"),
        Events.driftBucketCol.as("bucket"))
      .groupBy("event_type", "day", "bucket")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val got = memo.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
    // epoch cells fold exactly: epoch = driftEpoch(day), counts sum
    val folded = Events.driftCells(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val direct = Events.driftCellCounts(Events.events(spark, d)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(folded == direct)
  }

  test("q301 HDR cells derived from exact value cells equal the raw-row HDR cells") {
    val d = "/root/testdata/sf0.001"
    val ev = Events.events(spark, d)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .where(col("vc") >= 1L)
    val exCells = ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    // additivity: each cent value maps to exactly one HDR bucket, so
    // summing cell counts per bucket == counting raw rows per bucket
    val derived = exCells
      .select(col("event_type"), expr(Events.hdrBucketSql("vc")).as("id"),
        col("cnt"))
      .groupBy("event_type", "id").agg(sum("cnt").as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val raw = Events.hdrCells(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(derived == raw)
    assert(derived.nonEmpty)
  }
}
