package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** KNN on vectors with a known answer; brute force and IVF agree when
  * every vector is its own centroid bucket neighborhood. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir = writeMiniEmbeddings(Seq(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0.99f, 0.14f, 0f, 0f), // nearest to 0
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(0f, 0.99f, 0.14f, 0f), // nearest to 2
    4L -> Seq(0f, 0f, 1f, 0f),
    5L -> Seq(0.7f, 0.7f, 0f, 0f)))

  test("q62: quantization hits +/-127 at the extremes and zero vectors stay zero") {
    val qdir = writeMiniEmbeddings(Seq(
      0L -> Seq(1f, -1f, 0.5f, 0f),
      1L -> Seq(0f, 0f, 0f, 0f))) // zero vector: scale 0, quantizes to zeros
    val got = Similarity.q62_embed_quantize(spark, qdir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("q_sum"), r.getAs[Long]("q_min"), r.getAs[Long]("q_max")))
      .toMap
    // v0: scale = 1/127 → q = (127, -127, 64, 0); round-half-up: 0.5*127 = 63.5 → 64
    assert(got(0L) == (64L, -127L, 127L))
    assert(got(1L) == (0L, 0L, 0L))
  }

  test("q36: brute-force top-1 neighbors are the geometrically nearest") {
    val top1 = Similarity.q36_knn_brute(spark, dir)
      .where("rank = 1").collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(top1(0L) == 1L)
    assert(top1(1L) == 0L)
    assert(top1(2L) == 3L)
    assert(top1(3L) == 2L)
  }

  test("q37: IVF returns the same top-1 when all vectors are centroids") {
    val ivf = Similarity.q37_knn_ivf(spark, dir)
      .where("rank = 1").collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(ivf(0L) == 1L && ivf(2L) == 3L)
  }

  test("q99: singleton buckets train to themselves — trained equals naive") {
    // every vector is its own centroid, so each Lloyd mean is the mean of
    // one member = the vector itself: the trained codebook must reproduce
    // the naive row exactly (pins the fold+divide identity end to end)
    val rows = Similarity.q99_ivf_trained_recall(spark, dir).collect()
      .map(r => r.getAs[String]("codebook") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_found"), r.getAs[Double]("recall"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("min_bucket")))
      .toMap
    assert(rows.keySet == Set("naive", "trained"))
    assert(rows("trained") == rows("naive"))
    assert(rows("naive")._4 == 1L && rows("naive")._5 == 1L) // singleton buckets
  }

  test("q99: a centroid emptied by a duplicate seed keeps its seed vector") {
    // seeds 0 and 1 are identical: every vector ties at cosine 1.0·sim and
    // the c_id tie-break sends ALL members to centroid 0, leaving centroid
    // 1 memberless — the coalesce fallback path. The query must still
    // produce both well-formed rows (one populated bucket per codebook).
    val ddir = writeMiniEmbeddings(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),
      16L -> Seq(0.9f, 0.1f, 0f, 0f),
      17L -> Seq(0.9f, -0.1f, 0f, 0f)))
    val rows = Similarity.q99_ivf_trained_recall(spark, ddir).collect()
      .map(r => r.getAs[String]("codebook") ->
        (r.getAs[Long]("max_bucket"), r.getAs[Long]("min_bucket")))
      .toMap
    assert(rows("naive") == ((4L, 4L)))   // one bucket holds all 4 vectors
    assert(rows("trained") == ((4L, 4L))) // empty centroid kept its seed
  }

  test("q99: a bucket whose members sum to zero keeps its seed centroid") {
    // single centroid (id 0); member 16 is its exact negation, so the
    // Lloyd mean is the zero vector — cosine to it would be 0/0 for every
    // vector. The zero-norm fallback must keep the seed, making trained
    // identical to naive.
    val zdir = writeMiniEmbeddings(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      16L -> Seq(-1f, 0f, 0f, 0f)))
    val rows = Similarity.q99_ivf_trained_recall(spark, zdir).collect()
      .map(r => r.getAs[String]("codebook") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_found"), r.getAs[Double]("recall")))
      .toMap
    assert(rows("trained") == rows("naive"))
    assert(rows("naive") == ((1L, 1L, 1.0))) // query 0's only neighbor is 16
  }
}
