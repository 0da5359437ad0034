package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a driver surface): the ER pair stage's scaling curve
  * (r14 verdict item 8). q183/q187/q217's within-block join is argued
  * vocabulary²-bounded — "the block table is catalog-sized, so the
  * quadratic step never touches the corpus" — but that bound was never
  * MEASURED. This probe runs the three driver scales and reports, per
  * scale: the distinct-name vocabulary, block count, the largest
  * block, the exact blocked candidate-pair count Σ b·(b−1)/2 (the
  * quantity that would grow quadratically if blocks grew with the
  * corpus), the surviving fuzzy pairs, and the gated q183 wall time —
  * plus the same candidate count under a LENGTH-BAND prefix filter
  * (|len(a) − len(b)| ≤ maxDist is a necessary condition for edit
  * distance ≤ maxDist), the standard candidate-pruning rewrite to
  * reach for if the unfiltered curve ever turns superlinear.
  *
  * Usage: `sbt "runMain graft.ErProbe"` — one line per (sf, pass).
  * Results land in SURVEY §8 / PROBE_ER_r15.txt.
  */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val names = spark.read.parquet(s"$d/part.parquet")
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("block", element_at(split(col("name"), " "), 2))
        .localCheckpoint(true)
      val stats = names.groupBy("block").agg(count(lit(1)).as("b"))
        .agg(count(lit(1)).as("n_blocks"), max("b").as("max_block"),
          sum(expr("b * (b - 1) div 2")).as("cand_pairs"))
        .head()
      val nNames = names.count()
      // candidate pairs after the length-band prefix filter: the cheap
      // necessary condition for levenshtein <= 2 that the join-side
      // rewrite would add if the unfiltered curve went superlinear
      val banded = names.select(col("block"), length(col("name")).as("la"),
          col("name").as("name_a"))
        .join(names.select(col("block"), length(col("name")).as("lb"),
          col("name").as("name_b")), Seq("block"))
        .where(col("name_a") < col("name_b") && abs(col("la") - col("lb")) <= 2)
        .count()
      for (pass <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val pairs = graft.ops.Dedup.q183_fuzzy_entity(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"er_probe sf=$sf%-6s pass=$pass%-5s n_names=$nNames%-6d " +
          f"n_blocks=${stats.getAs[Long]("n_blocks")}%-5d " +
          f"max_block=${stats.getAs[Long]("max_block")}%-5d " +
          f"cand_pairs=${stats.getAs[Long]("cand_pairs")}%-8d " +
          f"len_banded=$banded%-8d fuzzy_pairs=$pairs%-7d q183=$wall%.2f s")
      }
      names.unpersist(false)
    }
    spark.stop()
  }
}
