package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The r10-verdict span-family skew contract: a boilerplate-heavy
  * corpus (ONE window hash carrying ~30% of all windows — a license
  * header, a nav bar) must not concentrate the flag join on one
  * reducer. The flag join is salted ([[Dedup.flagAgainst]]); this spec
  * plants exactly that corpus and measures partition balance AND
  * result equivalence against the plain join. */
class SpanSkewSpec extends AnyFunSuite with SparkTestBase {

  // 600 docs: 8 shared boilerplate tokens + 2 unique ones → 3 windows
  // per doc, the boilerplate window's hash identical in every doc →
  // one hash holds 1/3 of all windows
  private lazy val dir = writeMiniDocs((0L until 600L).map { i =>
    i -> s"alpha beta gamma delta epsilon zeta eta theta u$i v$i"
  })

  test("planted boilerplate: salted flag join balances the hot hash") {
    // model the 100 TB shape: the dup-hash set is corpus-scale there —
    // never broadcastable — and partitions are nowhere near AQE's
    // coalescing threshold, so measure the static SHUFFLE partitioning
    // the salt actually targets (broadcast would sidestep the shuffle
    // entirely on this tiny fixture and prove nothing)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try skewScenario() finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  private def skewScenario(): Unit = {
    val docs = graft.ops.TextCore.docShingles(spark, dir)
    val windows = Dedup.spanWindowsOf(docs)
    val dup = windows.groupBy("h").agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1).select("h")
    // the planted mass: the hot hash is ~1/3 of all windows
    val total = windows.count()
    val hot = windows.groupBy("h").count().orderBy(col("count").desc)
      .limit(1).collect()(0).getLong(1)
    assert(hot * 3 >= total, s"planting failed: hot=$hot of $total")
    // plain equi-join: every hot-hash row lands on ONE reducer — its
    // join key IS the hot hash, so the hottest shuffle partition
    // carries at least the full hot mass (the straggler this spec
    // exists to catch)
    val plainParts = windows.join(dup, "h")
      .groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(plainParts.max >= hot,
      s"expected the plain join to concentrate the hot hash: ${plainParts.toSeq}")
    // salted join: the unit a reducer receives is the (h, salt) KEY —
    // at cluster scale shuffle partitions ≫ keys, so per-key mass IS
    // the straggler bound. The hot hash must split into spanSalts keys
    // of ≤ ~hot/spanSalts rows each (2× slack for salt-hash unevenness).
    val salted = Dedup.flagAgainst(windows, dup)
    val keyed = salted.groupBy(col("h"),
        graft.ops.Skew.rowSalt(
          Seq(col("h"), col("doc_id"), col("start")), 8).as("salt"))
      .count().collect().map(_.getLong(2))
    info(s"plain parts: ${plainParts.toSeq}; salted per-key: ${keyed.sorted.toSeq}")
    assert(keyed.max <= 2L * (hot / 8L),
      s"hot hash not spread by the salt: per-key ${keyed.sorted.toSeq}")
    // the local 4-partition layout still improves (collisions of salt
    // keys into few bins are a small-fixture artifact, so only a
    // strict-improvement bound is meaningful here)
    val saltedParts = salted.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(saltedParts.max < plainParts.max,
      s"salted layout no better: ${saltedParts.toSeq} vs ${plainParts.toSeq}")
    // and the salt changes NOTHING semantically: same flagged row set
    val plainSet = windows.join(dup, "h")
      .select("doc_id", "start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val saltedSet = Dedup.flagAgainst(windows, dup)
      .select("doc_id", "start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saltedSet == plainSet)
  }

  test("planted boilerplate: the dup-count stage is partial-aggregated") {
    // the OTHER potential hot spot — groupBy(h).count() — is already
    // skew-proof: Spark's partial (map-side) aggregation reduces the
    // hot hash to ONE row per map partition before the shuffle, so the
    // reducer sees ≤ #map-partitions rows for it. Pin that the plan
    // actually carries the two-phase HashAggregate pair.
    val docs = graft.ops.TextCore.docShingles(spark, dir)
    val plan = Dedup.spanWindowsOf(docs)
      .groupBy("h").agg(count(lit(1)).as("occ"))
      .queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final HashAggregate, plan:\n$plan")
    assert(plan.contains("partial_count") || aggs >= 2)
  }

  test("q105 report on the planted corpus is correct through the salt") {
    // every doc: 3 windows, 1 flagged (the boilerplate) → 1 span of 8
    // tokens removed out of 10 → frac 0.8
    val rows = Dedup.q105_span_dedup(spark, dir).collect()
    assert(rows.length == 600)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_windows") == 1L)
      assert(r.getAs[Long]("n_spans") == 1L)
      assert(r.getAs[Long]("tokens_removed") == 8L)
      assert(r.getAs[Double]("frac_removed") == 0.8)
    }
  }
}
