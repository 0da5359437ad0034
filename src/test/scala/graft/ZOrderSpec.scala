package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.DataSkipping

/** q194's Morton interleave is the real bit interleave, and the z-order
  * layout's pruning advantage over the single-dim sort is pinned as an
  * inequality (the gate pins the exact numbers). */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private def z(x: Int, y: Int): Long =
    spark.sql(s"SELECT ${DataSkipping.zInterleaveSql(x.toString, y.toString, "div")} AS z")
      .head().getLong(0)

  test("zInterleaveSql is the Morton bit interleave (x at odd positions)") {
    assert(z(0, 0) == 0L)
    assert(z(255, 0) == 0xAAAAL)   // all odd bits
    assert(z(0, 255) == 0x5555L)   // all even bits
    assert(z(255, 255) == 0xFFFFL)
    assert(z(3, 1) == 11L)         // x=11b -> bits 3,1 (8+2); y=01b -> bit 0
    // bijectivity on a corner: distinct inputs, distinct z
    assert(Set(z(1, 0), z(0, 1), z(1, 1), z(2, 0)).size == 4)
  }

  test("q194: width-1024 z-files are exact 32x32 tiles, so the aligned box prunes to truth") {
    val rows = SparkEntry.queries("q194_zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, zScanFiles, zScanRows, zTruth) = rows("zorder")
    val (_, uScanFiles, uScanRows, uTruth) = rows("user_sorted")
    assert(zTruth == uTruth, "both layouts answer the same box query")
    // the z-file cut is a bijection-aligned tiling: min/max pruning is EXACT
    assert(zScanRows == zTruth)
    assert(zScanFiles <= 4)
    // the single-key sort cannot skip on the second dim: every surviving
    // stripe spans the whole y axis, so it reads a strict superset
    assert(uScanRows > zScanRows,
      s"single-dim layout must scan more rows (got user=$uScanRows vs z=$zScanRows)")
    assert(uScanFiles >= zScanFiles)
  }
}
