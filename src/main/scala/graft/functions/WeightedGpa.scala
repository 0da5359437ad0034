package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo (SURVEY.md §7.5): weighted GPA as an
  * `Aggregator[(sks, bobot), (Σ sks·bobot, Σ sks), Double]` — the de-facto
  * UDAF the reference folds in Python (etl_2fact.py:228-230), expressed as
  * a mergeable two-accumulator aggregate (partial aggregation works because
  * merge is associative/commutative — the property the reference's
  * sequential fold doesn't need but a distributed engine does).
  *
  * Production queries use the built-in ratio-of-sums (codegen'd, and the
  * cross-engine-deterministic form); this exists to exercise and test the
  * typed path, cross-checked against the built-in in `WeightedGpaSpec`. */
object WeightedGpa extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._1) // a = (sks, bobot)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) 0.0 else math.floor(r._1 / r._2 * 100 + 0.5) / 100
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
