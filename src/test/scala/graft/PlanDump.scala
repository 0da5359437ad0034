package graft

/** Ad-hoc plan dumper (Test/runMain graft.PlanDump) — not a test. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.001"
    for (q <- args.toSeq match {
        case Nil => Seq("q165_weighted_sample", "q166_cdc_chunk_dups",
          "q167_chunk_dup_docs", "q169_chunk_novelty", "q168_hist_quantiles")
        case xs => xs
      }) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("InMemory") || l.contains("Exchange") || l.contains("WindowGroupLimit") ||
        l.contains("Window") || l.contains("Join") || l.contains("FileScan") ||
        l.contains("HashAggregate")).take(30).mkString("\n"))
    }
  }
}
