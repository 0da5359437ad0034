package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.DataSkipping

/** [[DataSkipping.profile]] counts nulls, exact NDV and lexicographic
  * extrema the way ANALYZE would — pinned on a synthetic frame whose
  * nulls and duplicates the driver tables don't carry. */
class ProfilingSpec extends AnyFunSuite with SparkTestBase {

  test("profile: nulls excluded from NDV/extrema, duplicates collapse, lexicographic min/max") {
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(2L), Some("a")),
      (Some(2L), None),
      (None, Some("a"))
    ).toDF("k", "s")
    val got = DataSkipping.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // k: 4 rows, 3 non-null, NDV {10, 2} = 2; lexicographic "10" < "2"
    assert(got("k") == (4L, 3L, 2L, "10", "2"))
    // s: 4 rows, 3 non-null, NDV {a, b} = 2
    assert(got("s") == (4L, 3L, 2L, "a", "b"))
  }

  test("q197: lineitem profile is keyed and complete") {
    val rows = SparkEntry.queries("q197_table_profile")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 7)
    val m = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    // the primary-key-ish id columns must dominate the flag columns' NDV
    assert(m("l_orderkey") > m("l_returnflag"))
    assert(m("l_returnflag") <= 3L, "TPC-H return flags are {A, N, R}")
  }

  test("q287: native-type extrema (10 > 2), nulls counted not profiled") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(2L), Some("a")),
      (Some(2L), None),
      (None, Some("a"))
    ).toDF("k", "s")
    val got = graft.ops.Pipeline.columnProfile("t", df,
        Seq("k" -> col("k"), "s" -> col("s")))
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))).toMap
    // the distinguishing claim vs q197's string profile: min/max run in
    // the NATIVE type, so 2 < 10 (lexicographically "10" < "2")
    assert(got("k") == ((4L, 1L, 2L, "2", "10")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
  }
}
