package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel

/** Pins Ckpt's per-(session, thread) query scoping — the r14 verdict
  * item 3 guard. The Thrift-server scenario is two statements
  * interleaving on ONE session, each on its own connection thread: a
  * session-global registry would let statement B's `beginQuery`
  * unpersist statement A's mid-flight frames (silent recompute for
  * `persisted`, released blocks for `eager`). Scoping by driver thread
  * makes the release structurally impossible instead of merely
  * documented. */
class CkptSpec extends AnyFunSuite with SparkTestBase {

  test("beginQuery on another thread does not release a mid-flight statement's frames") {
    import spark.implicits._
    // "connection B" is ONE long-lived thread, as in a real Thrift
    // server — the scope is keyed by thread identity, so B's statements
    // must all run on the same thread
    val connB = java.util.concurrent.Executors.newSingleThreadExecutor()
    def onB[T](f: => T): T = connB.submit(() => f).get()
    try {
      // statement A on THIS thread: scope opens, a frame registers + runs
      Ckpt.beginQuery(spark)
      val a = Ckpt.persisted(Seq(1, 2, 3).toDF("x"))
      a.count()
      assert(a.storageLevel != StorageLevel.NONE, "precondition: A is persisted")

      // statement B begins on connection B's thread of the SAME session
      // while A is mid-flight (its result not yet consumed)
      val b = onB {
        Ckpt.beginQuery(spark)
        val bdf = Ckpt.persisted(Seq(4, 5).toDF("y"))
        bdf.count()
        bdf
      }

      // A's frame survived B's scope-open; B's own frame is live too
      assert(a.storageLevel != StorageLevel.NONE,
        "statement B's beginQuery must not unpersist statement A's frames")
      assert(b.storageLevel != StorageLevel.NONE)

      // A's NEXT statement (same thread) releases A's frames — and ONLY A's
      Ckpt.beginQuery(spark)
      assert(a.storageLevel == StorageLevel.NONE,
        "same-thread beginQuery must release the previous statement's frames")
      assert(b.storageLevel != StorageLevel.NONE,
        "thread A's scope must not hold thread B's registrations")

      // B's next statement releases B's frames — from B's own thread
      onB { Ckpt.beginQuery(spark) }
      assert(b.storageLevel == StorageLevel.NONE)
    } finally connB.shutdown()
  }

  test("same-thread sequential statements still release deterministically (the r14 lifecycle)") {
    import spark.implicits._
    Ckpt.beginQuery(spark)
    val df = Ckpt.persisted(Seq(1L).toDF("v"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    Ckpt.beginQuery(spark)
    assert(df.storageLevel == StorageLevel.NONE,
      "next statement on the same (session, thread) scope releases the previous frames")
  }
}
