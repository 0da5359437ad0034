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
    spark.stop()
  }
}
