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

  test("saltedCountSum is invariant to the physical partitioning (salt nondeterminism is safe)") {
    import spark.implicits._
    // The salt derives from spark_partition_id + monotonically_increasing_id,
    // so DIFFERENT physical layouts of the same rows produce DIFFERENT salt
    // assignments — re-aggregability (count/sum are commutative monoids)
    // is the property that makes every assignment merge to the same totals.
    // Force three distinct layouts and require identical results.
    val rows = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"k${i % 20}", i.toLong))
    val df = rows.toDF("key", "v")
    def run(d: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      Skew.saltedCountSum(d, col("key"), col("v"), numSalts = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = run(df)
    assert(run(df.repartition(13)) == base)
    assert(run(df.repartition(1)) == base)
  }
}
