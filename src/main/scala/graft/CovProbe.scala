package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (not a driver surface): q182's cost curve across embedding
  * WIDTH (r13 verdict item 8). The gated covariance merge law explodes
  * d²/2 upper-triangle cells per vector before the partial aggregate —
  * measured only at the corpus's d=64 (2,080 cells/vector); at
  * production widths (d=512 → 131,328 cells, d=1536 → 1.18 M) the
  * explode row-rate could dominate. This probe times the GATED shape
  * (covCellsOf → covMoments) on deterministic synthetic vectors at
  * d = 64 / 256 / 512, against the per-partition ARRAY-ACCUMULATOR
  * fold ([[graft.ops.Similarity.covMomentsAcc]]) — which this probe's
  * curve PROMOTED to q182's production path in r14 (explode 41.5 s vs
  * fold 0.36 s at d=512 / 2k vectors). Both paths produce the
  * identical moment table (asserted at every width before timing), so
  * the probe is also the standing parity check between the streaming
  * twin's exploded-cell artifact and the batch fold.
  *
  * Usage: `sbt "runMain graft.CovProbe [nVecs]"` — one line per
  * (d, path, pass). Results land in SURVEY §8 / PROBE_COV_r14.txt.
  */
object CovProbe {
  /** Deterministic synthetic corpus: component k of vector id is
    * md5-derived in [-1, 1] — same magnitude envelope as the driver's
    * embeddings, any width. */
  private def synth(s: SparkSession, n: Long, d: Int): DataFrame =
    s.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(d - 1)), k =>
        (conv(substring(md5(concat(col("id").cast("string"), lit(":"),
          k.cast("string"))), 1, 4), 16, 10).cast("double") / 32767.5) - 1.0)
        .as("v"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(2000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity
    for (d <- Seq(64, 256, 512)) {
      val vecs = synth(spark, n, d).localCheckpoint(true)
      // parity first: both paths must produce the identical moments
      val a = Similarity.covMoments(Similarity.covCellsOf(vecs)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
      val b = Similarity.covMomentsAcc(vecs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
      require(a == b, s"d=$d: accumulator path diverged from the gated shape")
      for (pass <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val rows = Similarity.covMoments(Similarity.covCellsOf(vecs)).count()
        val tExplode = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Similarity.covMomentsAcc(vecs).count()
        val tAcc = (System.nanoTime() - t1) / 1e9
        println(f"cov_probe d=$d%-4d n=$n cells/vec=${d * (d + 1) / 2}%-7d pass=$pass%-5s cells_rows=$rows%-7d explode=$tExplode%.2f s accumulator=$tAcc%.2f s")
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
