package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted two-phase aggregation equals the direct aggregation on a
  * skewed distribution (one key holding ~90% of rows). */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("saltedCountSum equals direct groupBy on a hot-key distribution") {
    import spark.implicits._
    val rows = (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("key", "v")

    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(df, col("key"), col("v"), numSalts = 8,
        saltOn = Seq(col("key"), col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the plain join under any physical layout") {
    import spark.implicits._
    // hot key 0 holds 90% of the probe side; the build side has one row
    // per key (the profile shape). Join multiplicity must be unchanged:
    // every probe row matches exactly its key's replica with its salt.
    // the index column is the high-cardinality payload the deterministic
    // rowSalt hashes — without it every hot row is identical and they
    // would all share one salt (documented degradation, not a bug)
    val left = ((1 to 9000).map(_ => 0L) ++ (1 to 1000).map(i => (i % 50 + 1).toLong))
      .zipWithIndex.map { case (k, i) => (k, s"t${k % 3}", i.toLong) }
      .toDF("user_id", "event_type", "i")
    val right = (0L to 51L).map(k => (k, k * 10)).toDF("user_id", "w")
    def agg(j: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      j.groupBy("event_type").agg(count(lit(1)).as("n"), sum("w").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val saltOn = Seq(col("user_id"), col("event_type"), col("i"))
    val plain = agg(left.join(right, "user_id"))
    assert(agg(Skew.saltedJoin(left, right, "user_id", 8, saltOn)) == plain)
    assert(agg(Skew.saltedJoin(left.repartition(13), right, "user_id", 8, saltOn)) == plain)
    assert(agg(Skew.saltedJoin(left.repartition(1), right.repartition(3), "user_id", 8, saltOn)) == plain)
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    import spark.implicits._
    // The automatic counterpart of saltedJoin: with adaptive skew-join
    // handling on (default) and the size thresholds scaled down to test
    // data, a join whose probe side funnels 90% of rows through one key
    // must show a skew-handled join in the FINAL adaptive plan. Configs
    // are restored in finally — a leaked threshold would distort every
    // later suite on the shared session (the r6 nanosAsLong lesson).
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      val left = ((1 to 40000).map(_ => 0L) ++ (1 to 2000).map(i => (i % 100 + 1).toLong))
        .map(k => (k, k.toString * 8)).toDF("k", "pad")
      val right = (0L to 101L).map(k => (k, k * 10)).toDF("k", "w")
      val joined = left.join(right, "k")
      // collect() executes THIS queryExecution (count() would plan a new
      // one and leave this adaptive plan unfinalized)
      assert(joined.collect().length == 42000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"expected a skew-handled join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedCountSum salt is deterministic: layout-invariant AND actually spreads the hot key") {
    import spark.implicits._
    // The salt is pmod(xxhash64(all columns), numSalts) — a pure function
    // of row CONTENT, so any physical layout (and any task retry, the
    // 100 TB fetch-failure case) assigns identical salts. Pin both halves
    // of the contract: identical results across layouts, and the hot
    // key's distinct (k, salt) partials actually use >1 salt (content
    // hashing spreads because v varies — a degenerate all-duplicate hot
    // key would collapse to one salt, which rowSalt's doc calls out).
    val rows = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"k${i % 20}", i.toLong))
    val df = rows.toDF("key", "v")
    def run(d: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      Skew.saltedCountSum(d, col("key"), col("v"), numSalts = 8,
          saltOn = Seq(col("key"), col("v")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = run(df)
    assert(run(df.repartition(13)) == base)
    assert(run(df.repartition(1)) == base)
    // the PRODUCTION salt expression, not a re-derivation — if rowSalt's
    // definition changes in a way that collapses spread, this fails
    val hotSalts = df.select(col("key"),
        Skew.rowSalt(Seq(col("key"), col("v")), 8).as("salt"))
      .where(col("key") === "hot").select("salt").distinct().count()
    assert(hotSalts > 1, s"hot key collapsed to $hotSalts salt(s) — no spread")
  }

  test("bloomSemiJoin equals the plain semi-join (no false negatives survive)") {
    import spark.implicits._
    // build keys are half the probe keys; the other half must be shed
    val big = (1L to 2000L).map(k => (k, k * 3)).toDF("k", "payload")
    val build = (1L to 2000L by 2).toDF("k")
    val plain = big.join(build, Seq("k"), "leftsemi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Skew.bloomSemiJoin(big, build, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == plain)
    assert(plain.size == 1000)
  }

  test("bloomPruned keeps every true match and sheds most non-matches") {
    import spark.implicits._
    val big = (1L to 5000L).toDF("k")
    val build = (1L to 100L).toDF("k")
    val kept = Skew.bloomPruned(big, build, "k")
      .collect().map(_.getLong(0)).toSet
    // no false negatives: every build key present in big survives
    assert((1L to 100L).forall(kept))
    // pruning power: with m = 2^20 and 100 keys the false-positive rate
    // is ~(200/2^20)^2 ≈ 4e-8 — the md5 positions are deterministic, so
    // this bound is stable, not a flaky sample
    assert(kept.size < 150, s"bloom prune kept ${kept.size} of 5000")
  }

  test("q199: the product-sum estimate equals a directly executed join's size") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q199_join_cardinality")(spark, sf).head()
    val ev = spark.read.parquet(s"$sf/events.parquet").select("user_id", "event_type")
    val clicks = ev.where(col("event_type") === "click").select("user_id")
    val purchases = ev.where(col("event_type") === "purchase").select("user_id")
    val actual = clicks.join(purchases, "user_id").count()
    assert(r.getLong(1) == actual, "Σ na·nb must BE the join cardinality")
    // the hottest key really is an argmax of pairs (the string tie-break
    // must not distort the ordering)
    val pairs = clicks.groupBy("user_id").count().withColumnRenamed("count", "na")
      .join(purchases.groupBy("user_id").count().withColumnRenamed("count", "nb"), "user_id")
      .select(col("user_id"), (col("na") * col("nb")).as("p"))
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    val best = pairs.map(_._2).max
    assert(r.getLong(2) == best)
    // replay the query's OWN tie-break — the lexicographic min of the
    // (inverted-pairs, user-id-string) encoding, NOT numeric id min:
    // the two disagree when tied ids have different digit counts
    // (r13 review), so the test must not over-specify
    val hot = pairs.map { case (id, p) =>
      f"${1000000000000000000L - p}%019d|$id" }.min.split("\\|")(1).toLong
    assert(hot == r.getLong(3), "hot_user must replay the encoded tie-break")
  }

  test("q346: skew stats — ceil-rank p99 and the 4×-mean advisory") {
    import spark.implicits._
    def stats(keys: Seq[String]) = graft.ops.Skew
      .keySkewStats(keys.toDF("k"), "t").collect().head
    // a×8, b, c: N = 10, 3 keys, top 8 (8000 bp); p99 rank =
    // ceil(99·3/100) = 3 → the cum walk lands on frequency 8; the
    // advisory needs top·n_keys > 4·N = 24 > 40 — NOT advised (with
    // ≤ 4 keys the hottest key can never exceed 4× the mean)
    val mild = stats(Seq.fill(8)("a") ++ Seq("b", "c"))
    assert((mild.getLong(1), mild.getLong(2), mild.getLong(3),
      mild.getLong(4), mild.getLong(5), mild.getLong(6)) ==
      ((10L, 3L, 8L, 8000L, 8L, 0L)))
    // a×50 over 9 singleton keys: 50·10 = 500 > 4·59 — advised
    val hot = stats(Seq.fill(50)("a") ++ ('b' to 'j').map(_.toString))
    assert((hot.getLong(3), hot.getLong(6)) == ((50L, 1L)))
  }
}
