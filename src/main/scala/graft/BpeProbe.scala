package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not a driver surface): the BPE merge-count scaling curve.
  * The gated loop trains k = 6 merges; real tokenizers learn 10⁴–10⁵,
  * and the driver loop pays one vocabulary-sized job per merge — this
  * measures that wall-time curve at k = 6/16/32/64 so the SURVEY §8
  * design note rests on numbers, not expectation. Each k trains under
  * its own memo entry (cold), on the full corpus filter.
  *
  * Usage: `sbt "runMain graft.BpeProbe [sfDir]"` — prints one line per k.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the shared docShingles cache so k=6 isn't charged for it
    graft.ops.TextCore.docShingles(spark, sfDir).count()
    Seq(6, 16, 32, 64).foreach { k =>
      val t0 = System.nanoTime()
      val merges = graft.ops.TextStats.bpeTrainProbe(spark, sfDir, k)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpe_probe k=$k%-3d merges_learned=${merges.length}%-3d time=$secs%.2f s")
    }
    // the batched scale path: same k, passes divided by the batch size
    Seq(1, 4, 8).foreach { m =>
      val t0 = System.nanoTime()
      val merges = graft.ops.TextStats
        .bpeTrainBatched(spark, sfDir, numMerges = 32, batch = m)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpe_probe_batched k=32 batch=$m%-2d " +
        f"merges_learned=${merges.length}%-3d time=$secs%.2f s")
    }
    // DEPTH probe (r10 verdict item 3): the 10⁴–10⁵-merge claim was
    // extrapolated from k ≤ 64 — push the batched trainer to k = 256/512
    // at batch 16/32 and report fill rate (merges/passes ÷ batch): if
    // the disjointness filter starves (picks ≪ batch), the fallback
    // (re-rank within pass) is required; if fill stays ≥ b/2, the fixed
    // ⌈k/b⌉ pass contract holds at depth.
    for (k <- Seq(256, 512); m <- Seq(16, 32)) {
      val t0 = System.nanoTime()
      val (merges, stats) = graft.ops.TextStats
        .bpeTrainBatchedStats(spark, sfDir, numMerges = k, batch = m)
      val secs = (System.nanoTime() - t0) / 1e9
      // full-pool passes are where disjointness starvation would show;
      // shrunken pools mean the PAIR TABLE is running dry (corpus
      // exhaustion — the sequential trainer's early stop, not a batching
      // artifact)
      val full = stats.filter(_.poolSize >= 8 * m)
      val fullFill = if (full.isEmpty) Double.NaN
        else full.map(_.picks).sum.toDouble / (full.size * m)
      println(f"bpe_probe_depth k=$k%-4d batch=$m%-3d passes=${stats.size}%-3d " +
        f"merges_learned=${merges.length}%-4d fullpool_passes=${full.size}%-3d " +
        f"fullpool_fill=$fullFill%.2f time=$secs%.2f s " +
        s"per_pass=${stats.map(st => s"${st.picks}/${st.poolSize}").mkString(",")}")
    }
    // the starvation fallback: same depth points with in-pass re-ranking
    // on — every pass must fill its quota until the pair table dries
    for (k <- Seq(256, 512); m <- Seq(16, 32)) {
      val t0 = System.nanoTime()
      val (merges, stats) = graft.ops.TextStats
        .bpeTrainBatchedStats(spark, sfDir, numMerges = k, batch = m, refill = true)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpe_probe_refill k=$k%-4d batch=$m%-3d passes=${stats.size}%-3d " +
        f"merges_learned=${merges.length}%-4d time=$secs%.2f s " +
        s"per_pass=${stats.map(st => s"${st.picks}/${st.poolSize}").mkString(",")}")
    }
    spark.stop()
  }
}
