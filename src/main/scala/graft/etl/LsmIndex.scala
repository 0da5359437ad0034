package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** SHARED log-structured (LSM) maintenance for the engine's persisted
  * index artifacts — one definition of the gen-partitioned layout the
  * span index ([[graft.ops.Dedup.writeSpanIndex]]), the lexical
  * postings index ([[graft.ops.Retrieval.writeLexIndex]]) and the
  * chunk ledger ([[graft.ops.Dedup.writeChunkIndex]]) all maintain
  * (r12 verdict item 3: three copies of append/merge-on-read/compact
  * meant a bug fixed in one had to be found in three).
  *
  * The layout: rows land under `path/[bucket=…/]gen=N/`. Generation 0
  * is the nightly base build; each incremental batch appends a NEW
  * generation directory (dynamic `partitionBy` — base generation files
  * are never rewritten, spec-pinned byte-identical in all three
  * families), reads are merge-on-read unions over the generations, and
  * [[compact]] periodically folds everything back into a fresh gen 0.
  * At 100 TB this is exactly how log-structured stores absorb writes:
  * O(batch) per append, merge cost deferred to reads and bounded by
  * compaction. The optional hash-bucket column in front of `gen` is
  * the serving fan-out: a probe's bucket list is pushed down as a
  * static partition filter ([[prunedRead]]), so a search reads only
  * its keys' directories (the IVF "nprobe directories" story).
  */
object LsmIndex {

  /** One artifact's layout: its directory, the optional hash-bucket
    * partition in front of `gen` (name + derivation expression over
    * the row frame's columns), and whether each generation should land
    * as a single file (kilobyte sidecars like the BM25 stats row). */
  final case class Layout(
      path: String,
      bucket: Option[(String, Column)] = None,
      singleFile: Boolean = false) {
    private[LsmIndex] def partCols: Seq[String] = bucket.map(_._1).toSeq :+ "gen"
  }

  private def prep(rows: DataFrame, layout: Layout, gen: Long): DataFrame = {
    val bucketed = layout.bucket.fold(rows) { case (name, expr) =>
      rows.withColumn(name, expr)
    }
    val stamped = bucketed.withColumn("gen", lit(gen))
    if (layout.singleFile) stamped.coalesce(1) else stamped
  }

  /** Write generation 0 — the base build (full overwrite). */
  def write(rows: DataFrame, layout: Layout): Unit =
    prep(rows, layout, 0L).write.mode("overwrite")
      .partitionBy(layout.partCols: _*).parquet(layout.path)

  /** Incremental maintenance: the batch lands as a NEW generation
    * directory; base generation files are never touched. Batches must
    * be disjoint in the domain's row-identity (doc-disjoint for all
    * three current families — the incremental-family convention). */
  def append(rows: DataFrame, layout: Layout, gen: Long): Unit = {
    require(gen > 0, s"generation must be > 0 (0 is the base build); got $gen")
    prep(rows, layout, gen).write.mode("append")
      .partitionBy(layout.partCols: _*).parquet(layout.path)
  }

  /** Merge-on-read union over every generation, partition columns
    * dropped — domain folds (occurrence sums, df derivation) stay with
    * the caller, in the same scan that serves. */
  def read(s: SparkSession, layout: Layout): DataFrame =
    s.read.parquet(layout.path).drop(layout.partCols: _*)

  /** All generations WITH the `gen` column (bucket dropped) — the
    * staleness reports' input (what did the appends change?). */
  def readByGen(s: SparkSession, layout: Layout): DataFrame =
    layout.bucket.fold(s.read.parquet(layout.path)) { case (name, _) =>
      s.read.parquet(layout.path).drop(name)
    }

  /** The artifact read scoped to a probe's bucket list — the static
    * partition filter every serving path pushes into the file scan
    * (file-level-pinned in PartitionPruningSpec for both bucketed
    * families). */
  def prunedRead(s: SparkSession, layout: Layout, buckets: Seq[Long]): DataFrame = {
    val (name, _) = layout.bucket.getOrElse(
      throw new IllegalArgumentException(s"${layout.path} has no bucket fan-out"))
    s.read.parquet(layout.path)
      .where(col(name).isin(buckets: _*)).drop(layout.partCols: _*)
  }

  /** Driver-side distinct bucket list of a probe frame — bounded by
    * the probe batch, never the corpus (the Delta-style driver-pruning
    * pattern every serving path uses). */
  def probeBuckets(probe: DataFrame, bucketExpr: Column): Seq[Long] =
    probe.select(bucketExpr.as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq

  /** Major compaction: fold every generation into a fresh gen 0 —
    * bounds the generation-directory count a merge-on-read serve
    * unions. `fold` collapses cross-generation rows where the domain
    * state is mergeable (the span index sums its counts; postings and
    * chunks are already row-disjoint).
    *
    * CRASH-SAFE (r12 advice): the merged artifact streams into a
    * sibling staging directory first — the live files are only read,
    * never mid-rewrite — then two atomic renames swap it in and the
    * displaced copy is deleted last. Every step leaves a complete copy
    * of the data on disk: a crash before the swap loses only staging;
    * a crash between the renames leaves the full old artifact at
    * `<path>.replaced`, which the next [[compact]] restores as live
    * BEFORE discarding leftovers (spec-pinned); after, the new
    * gen 0 is live. This replaces the old checkpoint-then-overwrite,
    * whose only copy lived in executor memory during the rewrite. On
    * the versioned warehouse this would commit as a snapshot instead. */
  def compact(s: SparkSession, layout: Layout)(
      fold: DataFrame => DataFrame = identity): Unit = {
    val liveDir = new java.io.File(layout.path)
    val staging = new java.io.File(layout.path + ".compacting")
    val replaced = new java.io.File(layout.path + ".replaced")
    // crash-window RECOVERY before any cleanup (the r13 review fix: a
    // predecessor that died between its two renames left the only copy
    // at .replaced — deleting it here would destroy the artifact):
    // restore it as live, THEN discard leftovers
    if (!liveDir.exists() && replaced.exists())
      java.nio.file.Files.move(replaced.toPath, liveDir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Compact.deleteRecursively(staging)
    Compact.deleteRecursively(replaced)
    write(fold(read(s, layout)), layout.copy(path = staging.toString))
    java.nio.file.Files.move(liveDir.toPath, replaced.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(staging.toPath, liveDir.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Compact.deleteRecursively(replaced)
  }
}
