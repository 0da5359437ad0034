package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The 100 TB fact⋈fact story (SURVEY.md §8 / Star scaladoc): when both
  * sides are bucketed on the join key, the sort-merge join runs with no
  * shuffle exchange — verified on the physical plan. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val dir = writeMiniStar(Seq(
      (1L, 1L, 101L, "2023-03-15", "A", "F", 3.0),
      (2L, 1L, 102L, "2023-09-01", "N", "F", 2.0),
      (3L, 2L, 103L, "2024-03-01", "R", "O", 4.0)))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          spark.table("li_bucketed")("l_orderkey") === spark.table("ord_bucketed")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty)
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
      assert(joined.count() == 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
