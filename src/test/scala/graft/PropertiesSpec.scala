package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.etl.Star

/** Property layer (SURVEY.md §5): the deterministic-rounding and IPS/IPK
  * invariants hold for ScalaCheck-generated inputs, evaluated through the
  * real Spark expressions (batched per property to keep this fast). */
class PropertiesSpec extends AnyFunSuite with SparkTestBase {

  test("round2/round4 equal the scalar floor formula for arbitrary doubles") {
    import spark.implicits._
    val xs = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)).sample.get
    val got = xs.toDF("x")
      .select(Star.round2(col("x")).as("r2"), Star.round4(col("x")).as("r4"))
      .collect()
    xs.zip(got).foreach { case (x, r) =>
      assert(r.getDouble(0) == math.floor(x * 100 + 0.5) / 100)
      assert(r.getDouble(1) == math.floor(x * 10000 + 0.5) / 10000)
    }
  }

  test("ips is bounded by [min, max] course weight for random semesters") {
    import spark.implicits._
    val gen = Gen.listOfN(40, for {
      sks <- Gen.chooseNum(1, 6)
      w <- Gen.oneOf(Star.gradeWeights.map(_._2))
    } yield (sks.toDouble, w))
    val courses = gen.sample.get
    val df = courses.toDF("sks", "bobot")
      .agg(Star.round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ips"))
    val ips = df.collect().head.getDouble(0)
    val ws = courses.map(_._2)
    // floor-rounding can dip at most half a cent below the true minimum
    assert(ips >= ws.min - 0.005 && ips <= ws.max + 0.005)
  }

  test("hamming distance is 0 iff bitstrings equal, symmetric, <= 64") {
    import spark.implicits._
    val bits = Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)
    val pairs = Gen.listOfN(50, Gen.zip(bits, bits)).sample.get
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ops.TextCore.hamming(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      val (a, b, h) = (r.getString(0), r.getString(1), r.getInt(2))
      val want = a.zip(b).count { case (x, y) => x != y }
      assert(h == want)
      assert((h == 0) == (a == b))
      assert(h >= 0 && h <= 64)
    }
  }
}
