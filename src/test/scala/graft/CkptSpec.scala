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

  test("a retired thread's frames are swept by the next beginQuery on any thread (r15 leak)") {
    import spark.implicits._
    // thread-per-statement pool: the thread registers a frame, returns
    // the result, and EXITS without ever issuing another statement — the
    // r15 leak. A later beginQuery on a different live thread must sweep
    // the dead scope.
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val orphan = try pool.submit(() => {
      Ckpt.beginQuery(spark)
      val df = Ckpt.persisted(Seq(7L).toDF("v"))
      df.count()
      df
    }).get() finally pool.shutdown()
    assert(pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(orphan.storageLevel != StorageLevel.NONE, "precondition: orphan persisted")
    // give the pool thread a beat to actually exit after shutdown
    val deadline = System.nanoTime() + 5_000_000_000L
    Ckpt.beginQuery(spark) // this thread's own scope; sweep runs too
    while (orphan.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline) {
      Thread.sleep(50); Ckpt.beginQuery(spark)
    }
    assert(orphan.storageLevel == StorageLevel.NONE,
      "sweep must release frames registered by a thread that has exited")
  }

  test("releaseAll releases every scope on the session, live threads included") {
    import spark.implicits._
    Ckpt.beginQuery(spark)
    val mine = Ckpt.persisted(Seq(1L).toDF("v"))
    mine.count()
    val connB = java.util.concurrent.Executors.newSingleThreadExecutor()
    val theirs = try connB.submit(() => {
      Ckpt.beginQuery(spark)
      val df = Ckpt.persisted(Seq(2L).toDF("w"))
      df.count()
      df
    }).get() finally ()
    try {
      assert(mine.storageLevel != StorageLevel.NONE)
      assert(theirs.storageLevel != StorageLevel.NONE)
      Ckpt.releaseAll(spark)
      assert(mine.storageLevel == StorageLevel.NONE, "releaseAll must clear this thread's scope")
      assert(theirs.storageLevel == StorageLevel.NONE, "releaseAll must clear other live threads' scopes")
    } finally connB.shutdown()
  }
}
