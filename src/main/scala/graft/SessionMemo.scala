package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Session-scoped DataFrame memo shared by the star, dim, and pair-set
  * caches: one (session, dir, key) → materialized frame per build.
  *
  * The in-session analog of materializing a table to the warehouse (the
  * cross-run form is a real write — `StarBuilder.writeAll` for the star,
  * a pair table for dedup). `materialize` is the policy knob: `persist`
  * for re-read-many lazy frames, eager `localCheckpoint` for frames whose
  * construction runs jobs (surrogate ids, verified pairs), identity for
  * frames already materialized by their builder.
  *
  * Shared caveats, in one place instead of three: entries live for the
  * session (never evicted — keys are bounded: tables × sf dirs), and a
  * dir whose CONTENTS change mid-session would serve stale data (the
  * driver's dirs are immutable snapshots). Keys are namespaced by caller
  * ("star:", "dim:", "pairs:", "docs:", "events:", "bpe:", "mix:",
  * "knn:", "pq:" — grep
  * SessionMemo for the live list before adding one) so modules cannot
  * collide. */
private[graft] object SessionMemo {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, dir: String, key: String)
           (build: => DataFrame)
           (materialize: DataFrame => DataFrame): DataFrame =
    cache.getOrElseUpdate((spark, dir, key), materialize(build))

  private val onceDone = TrieMap.empty[(SparkSession, String, String), Unit]

  /** Effect-valued twin of [[apply]]: run `body` the first time this
    * (session, dir, key) is seen, skip it after — for idempotent
    * artifact builds (a scratch warehouse's base commit) whose re-run
    * per bench rep costs real write I/O without changing any result.
    * Same staleness caveat as the frame memo: the dir must be an
    * immutable snapshot. */
  def once(spark: SparkSession, dir: String, key: String)(body: => Unit): Unit =
    onceDone.getOrElseUpdate((spark, dir, key), body)
}
