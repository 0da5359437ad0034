package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** The custom expressions are reachable from SQL text after registration
  * (the SparkSessionExtensions hook uses the same builders). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("graft_* functions usable from spark.sql after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)

    val sim = spark.sql(
      "SELECT graft_simhash64(array(md5('a'), md5('b'))) AS s")
      .collect().head.getString(0)
    assert(sim.length == 64 && sim.forall(c => c == '0' || c == '1'))

    val mh = spark.sql(
      "SELECT graft_minhash_signature(array(md5('a'), md5('b')), 3) AS m")
      .collect().head.getSeq[Long](0)
    assert(mh.length == 3)

    val ic = spark.sql(
      "SELECT graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .collect().head.getInt(0)
    assert(ic == 2)

    val sig = spark.sql(
      "SELECT graft_sign_lsh_signature(array(1.0D, -1.0D), array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS s")
      .collect().head.getString(0)
    assert(sig == "10")
  }
}
