package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted two-phase aggregation equals the direct aggregation on a
  * skewed distribution (one key holding ~90% of rows). */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("saltedCountSum equals direct groupBy on a hot-key distribution") {
    import spark.implicits._
    val rows = (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("key", "v")

    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(df, col("key"), col("v"), numSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
