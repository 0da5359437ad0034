package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Star
import graft.etl.Star.withFact

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
    * re-aggregatable (here: counts and exact integer/half-step sums).
    *
    * The salt is NONDETERMINISTIC across task retries
    * (`spark_partition_id` + `monotonically_increasing_id` both change if
    * a task re-executes elsewhere) — and that is SAFE here, but only
    * because of what this operator computes: the salt never reaches the
    * output, it only partitions rows into phase-1 groups, and count/sum
    * are commutative monoids, so ANY assignment of rows to salts merges
    * to the same per-key totals in phase 2. Do NOT copy this salt
    * derivation into an operator whose aggregate is order- or
    * partition-sensitive (floating-point sums needing a fixed fold order,
    * first/last, collect_list) or whose salt value escapes — those need a
    * deterministic salt, e.g. `pmod(hash(payload-cols), numSalts)`.
    * SkewSpec pins the equivalence under a forced repartition; the q74
    * oracle (plain group-by in DuckDB) gates it per-round. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column, numSalts: Int): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    salted
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy("k")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
  }

  /** q74: the salted aggregation as an oracle-checked operator — grade
    * (`huruf`, 6 distinct values over the whole fact) is exactly the
    * hot-key shape salting exists for: a plain groupBy funnels each
    * grade's rows through one reducer; the salted form spreads each over
    * 8, then merges ≤ 8 partials per key. The oracle computes the PLAIN
    * group-by, so the equivalence of the two-phase rewrite is checked by
    * the gate itself (sks sums are integral doubles — exact,
    * order-free). */
  val q74_salted_agg: (SparkSession, String) => DataFrame = (s, d) =>
    saltedCountSum(Star.fact(s, d), col("huruf"), col("sks"), 8)
      .select(col("k").as("huruf"), col("n").as("n_rows"), col("s").as("sum_sks"))
      .orderBy("huruf")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q74_salted_agg" -> q74_salted_agg)

  val oracle: Map[String, String] = Map(
    "q74_salted_agg" -> withFact(
      """SELECT huruf, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS sum_sks
        |FROM fact GROUP BY huruf ORDER BY huruf""".stripMargin))
}
