package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** The r10-verdict q142 scale contract: SemDeDup's pairwise join must be
  * bounded by shards·cap², not bucket², even when the codebook is so
  * skewed that ONE bucket holds 50% of the corpus — and the cap's recall
  * cost must be measurable, not assumed.
  *
  * These tests drive the package-private [[Similarity.semCandidates]] /
  * [[Similarity.semDeDup]] / [[Similarity.semDedupCapRecall]] primitives
  * directly with a fabricated assignment frame, so the skew is planted
  * exactly (no dependence on what a codebook does to synthetic data).
  */
class SemDedupSkewSpec extends AnyFunSuite with SparkTestBase {

  /** (vec_id, c_id, v, nrm) with unit x-axis vectors (all pairwise
    * cosine 1 — every candidate pair is also a drop pair, worst case). */
  private def av(assign: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    assign.toDF("vec_id", "c_id")
      .withColumn("v", array(lit(1.0), lit(0.0), lit(0.0), lit(0.0)))
      .withColumn("nrm", lit(1.0))
  }

  // one bucket with 50% of the corpus: c_id 0 holds vec_id 0..399,
  // the other 400 vectors spread over buckets 1..15
  private val hotRows = 400L
  private lazy val skewed = av(
    (0L until hotRows).map(i => i -> 0L) ++
      (hotRows until 2 * hotRows).map(i => i -> (1L + i % 15)))

  test("planted skew: candidate rows bounded by shards·cap², not bucket²") {
    val cap = 32L
    val shards = (hotRows + cap - 1) / cap // 13
    val hotCands = Similarity.semCandidates(skewed, cap)
      .where(col("c_id") === 0L).count()
    val uncapped = hotRows * (hotRows - 1) / 2 // 79 800
    // per-shard pair count is ≤ C(cap + slack, 2); the contract bound is
    // shards·cap² — an order of magnitude under bucket²
    assert(hotCands <= shards * cap * cap,
      s"hot-bucket candidates $hotCands exceed shards*cap^2 = ${shards * cap * cap}")
    assert(hotCands * 4 < uncapped,
      s"cap did not materially reduce the join: $hotCands vs uncapped $uncapped")
    // and the uncapped path really is bucket-quadratic (the bound is real)
    val noCap = Similarity.semCandidates(skewed, Long.MaxValue)
      .where(col("c_id") === 0L).count()
    assert(noCap == uncapped)
  }

  test("planted skew: no cartesian/BNLJ in the capped plan") {
    val plan = Similarity.semCandidates(skewed, 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("gate-scale invariance: at sf0.001 the cap changes nothing") {
    // no driver bucket approaches semBucketCap rows, so the capped drop
    // set must equal the uncapped within-bucket drop set exactly —
    // this is what keeps the q142 oracle untouched by the r11 change
    val real = Similarity.semAv(spark, "/root/testdata/sf0.001")
    val r = Similarity.semDedupCapRecall(real, 0.45, Similarity.semBucketCap)
      .collect()(0)
    val nExact = r.getAs[Long]("n_bucket_dropped")
    assert(nExact == r.getAs[Long]("n_capped_dropped"))
    if (nExact > 0) assert(r.getAs[Double]("recall") == 1.0)
  }

  test("cap recall: planted cliques measure what sub-sharding costs") {
    // bucket 0: 10 cliques of 20 identical vectors (ids c*20..c*20+19) —
    // uncapped SemDeDup drops 19 per clique (190 total). cap = 16 splits
    // the bucket into shards; a clique member is kept iff it is its
    // shard's lowest clique id, so capped drops ≥ 190 − 10·(shards−1).
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, 0L, i / 20L))
    // one-hot per clique over 10 dims: same clique → cosine 1,
    // different cliques → cosine 0
    val frame = rows.toDF("vec_id", "c_id", "clique")
      .withColumn("v", array((0 until 10).map(j =>
        when(col("clique") === j, 1.0).otherwise(0.0)): _*))
      .withColumn("nrm", lit(1.0))
      .select("vec_id", "c_id", "v", "nrm")
    val cap = 16L
    val shards = (200L + cap - 1) / cap // 13
    val r = Similarity.semDedupCapRecall(frame, 0.99, cap).collect()(0)
    val nExact = r.getAs[Long]("n_bucket_dropped")
    val nCapped = r.getAs[Long]("n_capped_dropped")
    val recall = r.getAs[Double]("recall")
    assert(nExact == 190L, s"uncapped drops $nExact, expected 190")
    assert(nCapped >= 190L - 10L * (shards - 1),
      s"capped drops $nCapped below the per-shard-representative floor")
    assert(recall > 0.0 && recall <= 1.0)
    info(f"cap=$cap shards=$shards: capped drops $nCapped/190, recall $recall%.4f")
    // the capped drop set must be a SUBSET of the uncapped one (the cap
    // only removes comparisons; it can never invent a drop)
    assert(nCapped <= nExact)
  }

  test("k policy: seed floor at gate scales, corpus-linear above") {
    assert(Similarity.semNumCentroids(500L) == 16)
    assert(Similarity.semNumCentroids(2000L) == 16)
    assert(Similarity.semNumCentroids(65536L) == 16)
    assert(Similarity.semNumCentroids(1000000L) == 245)
    // 1e9 vectors → ~2.5e5 clusters: Abbas et al.'s web-scale regime
    assert(Similarity.semNumCentroids(1000000000L) == 244141)
  }
}
