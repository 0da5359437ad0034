package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Star
import graft.functions.WeightedGpa

/** The typed Aggregator equals the built-in ratio-of-sums per student. */
class WeightedGpaSpec extends AnyFunSuite with SparkTestBase {

  test("Aggregator weighted GPA matches the built-in ratio-of-sums") {
    import spark.implicits._
    val dir = writeMiniStar(Seq(
      (1L, 1L, 101L, "2023-03-15", "A", "F", 3.0),
      (1L, 1L, 102L, "2023-03-15", "N", "F", 2.0),
      (2L, 2L, 103L, "2023-09-01", "R", "O", 4.0),
      (3L, 2L, 104L, "2024-03-01", "A", "O", 5.0)))
    val fact = Star.fact(spark, dir)

    val builtIn = fact.groupBy("student")
      .agg(Star.round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ipk"))
      .collect().map(r => r.getAs[Long]("student") -> r.getAs[Double]("ipk")).toMap

    val typed = fact.select(col("student"), col("sks"), col("bobot"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedGpa.toColumn.name("ipk"))
      .collect().toMap

    assert(typed == builtIn)
  }
}
