package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration of graft's custom Catalyst expressions as SQL functions —
  * both as a `SparkSessionExtensions` hook (for cluster deployments:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`) and as a
  * runtime helper for an existing session. After registration the
  * expressions are usable from `spark.sql(...)` text, not just the Column
  * API:
  *
  *   SELECT graft_dot(a, b), graft_simhash64(hs), graft_minhash_signature(hs, 12)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name) // class name slot unused for runtime fns

  private[functions] val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "dot product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_simhash64", info("graft_simhash64", "simhash"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("graft_minhash_signature", info("graft_minhash_signature", "minhash"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(k: Int, _) => MinHashSignature(es(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_signature: numHashes must be an integer literal, got $other")
      }),
    ("graft_sorted_intersect_count", info("graft_sorted_intersect_count", "sorted intersect"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    ("graft_sign_lsh_signature", info("graft_sign_lsh_signature", "sign-LSH signature"),
      (es: Seq[Expression]) => SignLshSignature(es(0), es(1))),
    ("graft_jpeg_sof", info("graft_jpeg_sof", "JPEG SOF [w, h] from a binary payload"),
      (es: Seq[Expression]) => JpegSofDims(es(0))))

  /** Register the same functions into an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
