package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source-format coverage beyond parquet (A1): the same relation read
  * back from CSV and JSON-lines with explicit schemas is row-identical to
  * the parquet original — the plumbing a lakehouse ingest path needs for
  * raw drops before compaction to columnar. Explicit schemas, never
  * inference: schema inference is a full extra pass over the data at
  * scale and is non-deterministic on dirty input. */
class SourceFormatsSpec extends AnyFunSuite with SparkTestBase {

  // the events parquet stores TIMESTAMP(NANOS); the legacy nanosAsLong
  // conf is set once in SparkTestSession's builder (session-level, no
  // per-suite mutation to leak or restore)
  private def eventsDf =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("CSV, JSON-lines, and ORC round-trip the events relation losslessly") {
    val src = eventsDf
      .select(col("event_id"), col("user_id"), col("event_type"))
    val schema = src.schema
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")
    src.write.mode("overwrite").orc(s"$base/orc")

    val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(schema).json(s"$base/json")
    val fromOrc = spark.read.schema(schema).orc(s"$base/orc")

    val want = src.orderBy("event_id").collect().toSeq
    assert(fromCsv.orderBy("event_id").collect().toSeq == want)
    assert(fromJson.orderBy("event_id").collect().toSeq == want)
    assert(fromOrc.orderBy("event_id").collect().toSeq == want)
    assert(fromCsv.schema == schema && fromJson.schema == schema && fromOrc.schema == schema)
  }

  test("ORC pushes filters to the scan like parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft_orcpush").toString
    eventsDf
      .select(col("event_id"), col("user_id")).write.mode("overwrite").orc(base)
    val plan = spark.read.orc(base).where(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      "expected the user_id predicate in the ORC scan's PushedFilters")
  }
}
