package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Ev, EventStream}

/** Structured Streaming shapes over MemoryStream: stateful sessionization
  * (flatMapGroupsWithState) and watermarked tumbling windows. */
class EventStreamSpec extends AnyFunSuite with SparkTestBase {

  test("sessionize emits a closed session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(Ev(1L, 1L, 0L), Ev(1L, 2L, 100L))
      query.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open in state

      input.addData(Ev(1L, 3L, 5000L)) // gap 4900s > 1800s → closes it
      query.processAllAvailable()
      val got = spark.table("sess").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_es"),
          r.getAs[Long]("end_es"), r.getAs[Long]("n_events")))
      assert(got.toSeq == Seq((1L, 0L, 100L, 2L)))
    } finally query.stop()
  }

  test("windowedCounts emits a window once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val query = EventStream.windowedCounts(input.toDS().toDF("es", "event_type"))
      .writeStream.format("memory").queryName("winc").outputMode("append").start()
    try {
      input.addData((100L, "click"), (200L, "click"))
      query.processAllAvailable()
      input.addData((7300L, "view")) // advances watermark past hour 0
      query.processAllAvailable()
      input.addData((7400L, "view")) // next batch flushes the closed window
      query.processAllAvailable()
      val got = spark.table("winc").collect()
        .map(r => (r.getAs[Long]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events")))
      assert(got.toSeq.contains((0L, "click", 2L)))
    } finally query.stop()
  }
}
