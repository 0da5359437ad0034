package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (100 TB posture; SURVEY.md §7.6 scale
  * notes). None of the sandbox datasets are skewed enough to need these —
  * AQE's skew-join handling covers the join side at runtime — but the
  * two-phase salted aggregation is the standard manual tool when one key
  * dominates a groupBy, and it is spec-tested for equivalence with the
  * direct aggregation. */
object Skew {

  /** Two-phase salted aggregation: count + sum per key, computed as
    * groupBy(key, salt) partials followed by a final groupBy(key) merge.
    * The salt spreads a hot key over `numSalts` reducers in phase 1; the
    * phase-2 input has at most `numSalts` rows per key. Sums must be
    * re-aggregatable (here: counts and exact integer/half-step sums). */
  def saltedCountSum(df: DataFrame, key: Column, value: Column, numSalts: Int): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    salted
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy("k")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
  }
}
