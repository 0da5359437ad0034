package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.LsmIndex

/** The shared LSM module's own contract (the three family specs —
  * DedupSpec span/chunk, RetrievalSpec postings — pin each domain's
  * semantics THROUGH this module; this suite pins what only the shared
  * code owns: the crash-safe compaction swap and stale-staging
  * recovery). */
class LsmIndexSpec extends AnyFunSuite with SparkTestBase {

  private def layout(bucketed: Boolean): (String, LsmIndex.Layout) = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_lsm").toString + "/idx"
    val l =
      if (bucketed) LsmIndex.Layout(out, Some(("b", pmod(col("k"), lit(4L)))))
      else LsmIndex.Layout(out)
    (out, l)
  }

  private def rowsOf(l: LsmIndex.Layout): Set[(Long, Long)] =
    LsmIndex.read(spark, l).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("compact folds generations via atomic swap: no staging/replaced residue, data intact") {
    import spark.implicits._
    val (out, l) = layout(bucketed = true)
    LsmIndex.write((0L until 8L).map(k => (k, k * 10)).toDF("k", "v"), l)
    LsmIndex.append((8L until 12L).map(k => (k, k * 10)).toDF("k", "v"), l, gen = 1L)
    val before = rowsOf(l)
    LsmIndex.compact(spark, l)()
    assert(rowsOf(l) == before)
    // gen=1 folded away, only gen=0 remains under every bucket
    val gens = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).flatMap(b => Option(b.listFiles()).getOrElse(Array.empty))
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens == Set("gen=0"))
    // the swap cleaned up after itself — neither sibling survives
    assert(!new java.io.File(out + ".compacting").exists())
    assert(!new java.io.File(out + ".replaced").exists())
  }

  test("compact recovers from a stale staging dir left by a crashed predecessor") {
    import spark.implicits._
    val (out, l) = layout(bucketed = false)
    LsmIndex.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), l)
    LsmIndex.append(Seq((3L, 30L)).toDF("k", "v"), l, gen = 1L)
    // a predecessor crashed mid-staging: junk at <path>.compacting must
    // not poison the next run (it is discarded, never merged)
    val stale = new java.io.File(out + ".compacting")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stale, "junk.txt").toPath, "not parquet")
    val before = rowsOf(l)
    LsmIndex.compact(spark, l)()
    assert(rowsOf(l) == before)
    assert(!stale.exists())
  }

  test("compact recovers the artifact from the between-renames crash window") {
    import spark.implicits._
    val (out, l) = layout(bucketed = false)
    LsmIndex.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), l)
    LsmIndex.append(Seq((3L, 30L)).toDF("k", "v"), l, gen = 1L)
    val before = rowsOf(l)
    // simulate a predecessor that died between its two renames: live is
    // gone, the only copy sits at <path>.replaced (plus stale staging) —
    // the r13 review case where cleanup-before-recovery destroyed it
    java.nio.file.Files.move(
      new java.io.File(out).toPath,
      new java.io.File(out + ".replaced").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val stale = new java.io.File(out + ".compacting")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stale, "junk.txt").toPath, "half-written staging")
    LsmIndex.compact(spark, l)()
    assert(rowsOf(l) == before)
    assert(!new java.io.File(out + ".compacting").exists())
    assert(!new java.io.File(out + ".replaced").exists())
  }

  test("a fold that merges rows is applied exactly once per compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (_, l) = layout(bucketed = false)
    // same key in both generations: the fold must sum them into one row
    LsmIndex.write(Seq((1L, 5L), (2L, 7L)).toDF("k", "v"), l)
    LsmIndex.append(Seq((1L, 3L)).toDF("k", "v"), l, gen = 1L)
    LsmIndex.compact(spark, l)(_.groupBy("k").agg(sum("v").as("v")))
    assert(rowsOf(l) == Set((1L, 8L), (2L, 7L)))
    // idempotent at the data level: compacting again changes nothing
    LsmIndex.compact(spark, l)(_.groupBy("k").agg(sum("v").as("v")))
    assert(rowsOf(l) == Set((1L, 8L), (2L, 7L)))
  }
}
