package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import graft.etl.StarBuilder

/** The warehouse facts are partitioned by `tahun` (StarBuilder.writeAll);
  * a year-filtered read must prune to that year's partition at planning
  * time — the partition-pruning story behind A19/A20. */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("tahun filter prunes fact partitions in the warehouse read") {
    val dir = writeMiniStar(Seq(
      (1L, 1L, 101L, "2023-03-15", "A", "F", 3.0),
      (2L, 1L, 102L, "2023-09-01", "N", "F", 2.0),
      (3L, 2L, 103L, "2024-03-01", "R", "O", 4.0)))
    val wh = java.nio.file.Files.createTempDirectory("graft_prune").toString
    StarBuilder.writeAll(spark, dir, wh)

    val filtered = spark.read.parquet(s"$wh/fact_nilai_mk").where(col("tahun") === 2023)
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    // only the 2023 directory is read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).forall(_.getPath.toString.contains("tahun=2023")))
    assert(filtered.count() == 2)
  }
}
