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
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec =>
      f.metadata.getOrElse("PushedFilters", "")
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

  test("q215: the HAVING-filtered survivor set joins back broadcast; joins stay equi") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q215_tpch_q18")(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "the threshold-pruned big-order set must ride a broadcast hash join")
    assert(plan.collect { case c: CartesianProductExec => c
                          case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
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

  test("q203 yields the canonical 6-group pricing summary with qty conservation") {
    val rows = SparkEntry.queries("q203_tpch_q1")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      // disc_price <= base price (nonneg discounts), charge >= disc_price
      assert(r.getAs[Long]("sum_disc_price_c") <= r.getAs[Long]("sum_base_price_c"))
      assert(r.getAs[Long]("sum_charge_c") >= r.getAs[Long]("sum_disc_price_c"))
    }
  }
}
