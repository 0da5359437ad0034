package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not a driver surface): the content-defined-chunking
  * family's scaling curve. q166/q167/q169 are gated for correctness at
  * sf0.01; this measures their wall time across the three driver scales
  * (10× docs per step) so the SURVEY §8 scale claim — chunking is
  * map-side, the shuffles key on the chunk hash, cost grows ~linearly
  * in corpus tokens — rests on numbers, not expectation. Each scale
  * uses its own memo entry (the chunk frame is built cold once per
  * dir, then the three queries share it — exactly the gate's shape).
  *
  * Usage: `sbt "runMain graft.ChunkProbe"` — one line per (sf, query).
  * Pass query names as args to curve ANY gated query the same way
  * (r12 verdict item 6 runs the quadratic-bounded families through it:
  * `runMain graft.ChunkProbe q34_dedup_ngram_jaccard q142_semdedup`).
  */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q166_cdc_chunk_dups", "q167_chunk_dup_docs", "q169_chunk_novelty")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { d =>
        // one cold pass charges the shared chunk build to the first query
        // (the gate's shape); a second warm pass isolates the per-query
        // aggregation cost over the cached frame
        for (pass <- Seq("cold", "warm"); q <- qs) {
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, d).count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"chunk_probe sf=${d.split('/').last}%-8s pass=$pass%-5s $q%-22s rows=$n%-7d time=$secs%.2f s")
        }
      }
    spark.stop()
  }
}
