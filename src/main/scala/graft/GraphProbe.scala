package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a driver surface): the graph family's scaling
  * curve around the r18 `events:handoffEdges` memo. The memo is
  * argued "one persisted edge artifact, orders of magnitude smaller
  * than the corpus" — this probe MEASURES that across the three
  * driver scales: event rows, distinct users (nodes), distinct
  * directed edges (the memo's cardinality), their undirected simple
  * projection, the compression ratio edges/events (the factor by
  * which every per-rep graph query shrinks its input by reading the
  * artifact instead of the corpus), the memo build wall, and the
  * warm walls of the five consumers. Measured (r18, committed as
  * PROBE_GRAPH_r18.txt): at the driver scales the DYAD DOMAIN is far
  * from saturated (sf0.1: 1500 users → 2.25M possible pairs, 100k
  * events → 97k distinct edges, edges_per_event ≈ 0.97), so the
  * artifact is NOT yet smaller than the corpus — the honest r18 win
  * at these scales is PASS-SHARING (five consumers × bench reps read
  * ONE materialized frame instead of fifteen corpus window-sorts).
  * The size claim is the bound, not the observation: |edges| ≤
  * min(|events|, n_active_dyads), so in the regime where the log
  * keeps growing over a stable population — the 100 TB case — repeat
  * handoffs collapse into weights and the artifact caps at the
  * interaction graph.
  *
  * Usage: `sbt "runMain graft.GraphProbe"` — one line per sf.
  * Results land in SURVEY §8 / PROBE_GRAPH_r18.txt.
  */
object GraphProbe {
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
    val consumers = Seq(
      "q265_user_pagerank", "q334_user_coreness", "q341_hour_modularity",
      "q344_dyad_census", "q345_degree_octaves")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val nEvents = spark.read.parquet(s"$d/events.parquet").count()
      val t0 = System.nanoTime()
      val edges = graft.ops.Events.handoffEdges(spark, d)
      val nEdges = edges.count()
      val buildWall = (System.nanoTime() - t0) / 1e9
      val nSimple = graft.ops.Events.simpleHandoffEdges(spark, d).count()
      val nNodes = graft.ops.Events.userIds(spark, d).count()
      val walls = consumers.map { q =>
        val t = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        f"${q.takeWhile(_ != '_')}=${(System.nanoTime() - t) / 1e9}%.2f"
      }.mkString(" ")
      println(f"graph_probe sf=$sf%-6s n_events=$nEvents%-8d " +
        f"n_nodes=$nNodes%-6d n_edges_dir=$nEdges%-7d n_simple=$nSimple%-7d " +
        f"edges_per_event=${nEdges.toDouble / nEvents}%.3f " +
        f"memo_build=$buildWall%.2f s warm: $walls")
    }
    spark.stop()
  }
}
