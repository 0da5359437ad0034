package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec

/** The TPC-H pair's scale posture: date predicates must reach the
  * parquet scans as pushed filters (a filter on the derived epoch cast
  * silently reads everything), and Q3's plan must stay equi-join-only. */
class TpchSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def pushed(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.SparkPlan
    def scans(plan: SparkPlan): Seq[String] = plan.collect {
      case f: FileSourceScanExec =>
        Seq(f.metadata.getOrElse("PushedFilters", ""))
      // a Ckpt.persisted frame hides its scans inside the cached
      // relation (itself AQE-wrapped) — the pushdown pin must look
      // through both layers
      case m: InMemoryTableScanExec => scans(m.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case p => scans(p)
    }
  }

  test("q203: the shipdate cutoff is pushed to the lineitem scan") {
    val df = SparkEntry.queries("q203_tpch_q1")(spark, sf)
    val p = pushed(df)
    assert(p.exists(_.contains("LessThanOrEqual(l_shipdate")),
      s"no pushed shipdate filter in: $p")
  }

  test("q204: all three scans carry their pushed predicates; joins are equi") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q204_tpch_q3")(spark, sf)
    val p = pushed(df)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(p.exists(_.contains("GreaterThan(l_shipdate")), s"lineitem: $p")
    assert(p.exists(_.contains("LessThan(o_orderdate")), s"orders: $p")
    assert(p.exists(_.contains("EqualTo(c_mktsegment,BUILDING)")), s"customer: $p")
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
  }

  test("q205: the region→nation dim side broadcasts; plan carries no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q205_tpch_q5")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "expected the kilobyte nation dim to ride a broadcast hash join")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    val p = pushed(df)
    assert(p.exists(_.contains("EqualTo(r_name,ASIA)")), s"region: $p")
    assert(p.exists(_.contains("o_orderdate")), s"orders: $p")
  }

  test("q214: outer join preserved (zero-order customers kept); no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q214_tpch_q13")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
    // the optimizer must NOT fold the outer join to inner: a c_count=0
    // histogram bucket can only come from customers without counted
    // orders (order-side filter lives in the join condition)
    assert(plan.toString.contains("LeftOuter") || plan.toString.contains("RightOuter"),
      s"outer join missing from plan:\n$plan")
  }

  test("q215: AQE elects broadcast for the survivor set at bench scale; no forced hint") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q215_tpch_q18")(spark, sf)
    // the logical plan must carry NO broadcast hint: a hint bypasses
    // AQE's size check, and the qty>300 survivor set is a constant
    // FRACTION of orders (linear in the corpus) — forcing it broadcast
    // would ship millions of rows at sf100k (r14 verdict item 2)
    assert(!df.queryExecution.optimizedPlan.toString.contains("ResolvedHint"),
      "q215 must not force-broadcast the linearly-growing survivor set")
    // AQE finalizes join strategies at runtime — execute, then pin that
    // it DID elect broadcast while the set is actually small. The final
    // adaptive plan nests materialized stages as LEAF QueryStageExec
    // nodes, so the traversal must recurse into each stage's plan.
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }.flatten
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"AQE should elect a broadcast hash join for the under-threshold survivor set:\n${df.queryExecution.executedPlan}")
    assert(!nodes.exists(n => n.isInstanceOf[CartesianProductExec] ||
      n.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  test("q216: decorrelated plan has no anti/nested-loop join; orders status filter pushed") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q216_tpch_q21")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    // the oracle's correlated EXISTS/NOT EXISTS would plan as anti/semi
    // self-joins of the fact; the decorrelated form must carry none
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
    assert(!plan.toString.contains("LeftAnti"), "decorrelation must avoid anti-joins")
    val p = pushed(df)
    assert(p.exists(_.contains("EqualTo(o_orderstatus,F)")), s"orders: $p")
  }

  test("q218: the quarter bounds push to the orders scan; the EXISTS plans as a semi join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q218_tpch_q4")(spark, sf)
    val p = pushed(df)
    assert(p.exists(_.contains("GreaterThanOrEqual(o_orderdate")), s"orders: $p")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.toString.contains("LeftSemi"), s"semi join missing:\n$plan")
  }

  test("q219: all three raw-column predicates reach the single lineitem scan; no join") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q219_tpch_q6")(spark, sf)
    val p = pushed(df)
    assert(p.exists(s => s.contains("l_shipdate") && s.contains("l_discount") &&
      s.contains("LessThan(l_quantity,24.0)")), s"lineitem: $p")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.collect { case j: BroadcastHashJoinExec => j
                          case j: SortMergeJoinExec => j }.isEmpty,
      "Q6 is a zero-join single-scan aggregate")
  }

  test("q220/q221/q226: dims broadcast, no cartesian/BNLJ anywhere") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    for (q <- Seq("q220_tpch_q7", "q221_tpch_q8", "q226_tpch_q19")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case x => x
      }
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"$q: expected broadcast dim joins")
      assert(plan.collect { case c: CartesianProductExec => c
                            case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$q: cartesian/BNLJ in plan")
    }
  }

  test("q224: the global max rides a broadcast value equi-join, not a window or cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("q224_tpch_q15")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty)
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b
                          case w: WindowExec => w }.isEmpty,
      "max selection must be the 1-row broadcast value join")
  }

  test("q227: the no-orders predicate plans as a left anti hash join") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q227_tpch_q22")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.toString.contains("LeftAnti"), s"anti join missing:\n$plan")
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
  }

  test("q225 returns one non-degenerate row (the correlated-avg survivors exist)") {
    val r = SparkEntry.queries("q225_tpch_q17")(spark, sf).collect()
    assert(r.length == 1)
    assert(!r(0).isNullAt(r(0).fieldIndex("avg_yearly_c")),
      "expected Brand#1 small-part survivors at sf0.001")
  }

  test("q203 yields the canonical 6-group pricing summary with qty conservation") {
    val rows = SparkEntry.queries("q203_tpch_q1")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      // disc_price <= base price (nonneg discounts), charge >= disc_price
      assert(r.getAs[Long]("sum_disc_price_c") <= r.getAs[Long]("sum_base_price_c"))
      assert(r.getAs[Long]("sum_charge_c") >= r.getAs[Long]("sum_disc_price_c"))
    }
  }

  test("derived partsupp: one row per traded pair, spec ranges, md5-replayable") {
    import org.apache.spark.sql.functions._
    val ps = graft.ops.Tpch.partsupp(spark, sf)
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct().count()
    val rows = ps.collect()
    assert(rows.length.toLong == pairs, "grain: one row per distinct (part, supp)")
    // spec ranges, and a JVM md5 replay of the hex-prefix derivation on
    // every row — the two engines rebuild THIS table independently, so
    // the derivation must be bit-stable
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val (pk, sk) = (r.getAs[Long]("ps_partkey"), r.getAs[Long]("ps_suppkey"))
      val hex = md.digest(s"${pk}_$sk".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val avail = 1L + java.lang.Long.parseLong(hex.substring(0, 4), 16) % 9999L
      val cost = 1L + java.lang.Long.parseLong(hex.substring(4, 8), 16) % 100000L
      assert(r.getAs[Long]("ps_availqty") == avail, s"availqty of ($pk,$sk)")
      assert(r.getAs[Long]("ps_supplycost_c") == cost, s"supplycost of ($pk,$sk)")
      assert(avail >= 1 && avail <= 9999 && cost >= 1 && cost <= 100000)
    }
  }

  test("q256: the per-part MIN window equals the correlated scalar-min replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q256_tpch_q2")(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("s_suppkey")))
    // driver-side replay of the spec's correlated form over the tiny
    // sf0.001 tables: per eligible part, min cost across EU suppliers
    val eu = spark.read.parquet(s"$sf/supplier.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf/region.parquet").where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .where(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val psRows = graft.ops.Tpch.partsupp(spark, sf).collect()
      .filter(r => eu.contains(r.getAs[Long]("ps_suppkey")) &&
        parts.contains(r.getAs[Long]("ps_partkey")))
      .map(r => (r.getAs[Long]("ps_partkey"), r.getAs[Long]("ps_suppkey"),
        r.getAs[Long]("ps_supplycost_c")))
    val expect = psRows.groupBy(_._1).toSeq.flatMap { case (pk, g) =>
      val m = g.map(_._3).min
      g.filter(_._3 == m).map(t => (pk, t._2)).toSeq
    }.toSet
    assert(got.toSet == expect, "window decorrelation must equal the correlated min")
    assert(got.nonEmpty, "fixture must exercise the min-cost join")
  }

  test("q260: a pair with no in-window shipments never qualifies (NULL-compare semantics)") {
    import org.apache.spark.sql.functions._
    // the decorrelation replaced the spec's correlated subquery (NULL
    // sum compares false) with an INNER join — prove no supplier owes
    // its presence to a pair that shipped nothing in the window
    val winPairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_suppkey").distinct().count()
    val allPairs = graft.ops.Tpch.partsupp(spark, sf).count()
    assert(winPairs < allPairs,
      "fixture must contain pairs with zero in-window shipments for the test to bite")
    val got = SparkEntry.queries("q260_tpch_q20")(spark, sf).collect()
    assert(got.nonEmpty, "ASIA suppliers with excess stock exist at sf0.001")
  }

  test("r16 partsupp queries: pushdown reaches the scans; no undocumented cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def plan(name: String) = {
      val df = SparkEntry.queries(name)(spark, sf)
      (pushed(df), df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case x => x
      })
    }
    // q257: the part-name LIKE filter must reach the part scan
    val (p257, t257) = plan("q257_tpch_q9")
    assert(p257.exists(_.contains("StringContains(p_name,red)")), s"q257 part scan: $p257")
    // q259: brand/type/size filters reach the part scan
    val (p259, t259) = plan("q259_tpch_q16")
    assert(p259.exists(s => s.contains("Not(EqualTo(p_brand,Brand#1))") && s.contains("In(p_size")),
      s"q259 part scan: $p259")
    // q260: the name prefix filter reaches the part scan; shipdate
    // window reaches lineitem
    val (p260, t260) = plan("q260_tpch_q20")
    assert(p260.exists(_.contains("StringStartsWith(p_name,small)")), s"q260 part scan: $p260")
    assert(p260.exists(s => s.contains("GreaterThanOrEqual(l_shipdate") && s.contains("LessThan(l_shipdate")),
      s"q260 lineitem scan: $p260")
    // no cartesian anywhere; BNLJ only as q258's documented 1-row ride
    Seq("q256_tpch_q2" -> plan("q256_tpch_q2")._2, "q257_tpch_q9" -> t257,
      "q259_tpch_q16" -> t259, "q260_tpch_q20" -> t260).foreach { case (n, t) =>
      assert(t.collect { case c: CartesianProductExec => c
                         case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$n must stay equi/semi-join shaped")
    }
    val t258 = plan("q258_tpch_q11")._2
    assert(t258.collect { case c: CartesianProductExec => c }.isEmpty,
      "q258's total must ride a broadcast, not a cartesian")
  }
}
