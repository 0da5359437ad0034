package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a driver surface): the q296/q306 co-occurrence
  * stage's scaling curve. The pair stage is argued item-domain-bounded
  * — "each user expands to C(items_per_user, 2) pairs and the
  * aggregate lands on the item² grid, so the quadratic step never
  * grows with the corpus once the item vocabulary saturates" — this
  * probe MEASURES that across the three driver scales: distinct users,
  * distinct items, the (user, item) edge count, the exact expanded
  * pair count Σ_u C(k_u, 2) (the quantity that would blow up if
  * per-user baskets grew with the corpus), the occupied item-pair
  * grid cells, and the gated q296 wall. The curve to check: items and
  * grid cells SATURATE (domain-bounded) while edges grow linearly —
  * the expanded pair count then grows linearly with users, never
  * quadratically with the corpus.
  *
  * Usage: `sbt "runMain graft.CoocProbe"` — one line per (sf, pass).
  * Results land in SURVEY §8 / PROBE_COOC_r16.txt.
  */
object CoocProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val ui = spark.read.parquet(s"$d/events.parquet")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .where(col("k").isNotNull)
        .distinct()
        .localCheckpoint(true)
      val basket = ui.groupBy("user_id").agg(count(lit(1)).as("kk"))
      val st = basket.agg(count(lit(1)).as("n_users"), sum("kk").as("n_edges"),
        max("kk").as("max_basket"),
        sum(expr("kk * (kk - 1) div 2")).as("exp_pairs")).head()
      val nItems = ui.select("k").distinct().count()
      val gridCells = ui.join(ui.select(col("user_id"), col("k").as("k2")),
          "user_id")
        .where(col("k") < col("k2"))
        .select("k", "k2").distinct().count()
      for (pass <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val rows = graft.ops.Events.q296_item_cooccurrence(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"cooc_probe sf=$sf%-6s pass=$pass%-5s " +
          f"n_users=${st.getAs[Long]("n_users")}%-7d n_items=$nItems%-5d " +
          f"n_edges=${st.getAs[Long]("n_edges")}%-8d " +
          f"max_basket=${st.getAs[Long]("max_basket")}%-5d " +
          f"exp_pairs=${st.getAs[Long]("exp_pairs")}%-9d " +
          f"grid_cells=$gridCells%-7d q296_rows=$rows%-4d wall=$wall%.2f s")
      }
      ui.unpersist(false)
    }
    spark.stop()
  }
}
