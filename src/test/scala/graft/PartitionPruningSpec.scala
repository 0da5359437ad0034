package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import graft.etl.StarBuilder

/** The warehouse facts are partitioned by `tahun` (StarBuilder.writeAll);
  * a year-filtered read must prune to that year's partition at planning
  * time — the partition-pruning story behind A19/A20. */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("a 4-probe query over the IVF index reads exactly 4 bucket directories") {
    // q37's scale claim made physical: writeIvfIndex lays the corpus out
    // partitioned by centroid id, so a probe set is a partition filter and
    // an nprobe search reads nprobe directories — not the corpus.
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    graft.ops.Similarity.writeIvfIndex(spark, "/root/testdata/sf0.001", idx)
    val probes = Seq(1L, 3L, 5L, 7L)
    val probed = spark.read.parquet(idx).where(col("c_id").isin(probes: _*))
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    val dirs = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files)
      .map(_.getPath.getParent.getName).distinct.sorted
    assert(dirs == probes.map(c => s"c_id=$c"),
      s"probe read touched: ${dirs.mkString(", ")}")
    // and the pruned read is the same rows the logical filter selects
    val expected = spark.read.parquet(idx)
      .collect().count(r => probes.contains(r.getAs[Long]("c_id")))
    assert(probed.count() == expected)
  }

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
