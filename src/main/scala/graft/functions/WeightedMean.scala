package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the Aggregator API — the third extension tier
  * after built-ins and codegen Expressions): decimal-exact weighted mean.
  *
  * The buffer carries exact decimal partial sums, so merge order across
  * partitions cannot change the result (the reason the engine's double
  * sums all go through decimal — SURVEY.md §4); the single double division
  * happens once in finish. Usable as a `TypedColumn` on Datasets or
  * registered via `spark.udf.register("weighted_mean", udaf(WeightedMean))`.
  */
object WeightedMean extends Aggregator[(Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
  private val Zero = java.math.BigDecimal.ZERO

  override def zero: (java.math.BigDecimal, java.math.BigDecimal) = (Zero, Zero)

  override def reduce(b: (java.math.BigDecimal, java.math.BigDecimal),
      a: (Double, Double)): (java.math.BigDecimal, java.math.BigDecimal) = {
    val (value, weight) = a
    val v = java.math.BigDecimal.valueOf(value)
    val w = java.math.BigDecimal.valueOf(weight)
    (b._1.add(v.multiply(w)), b._2.add(w))
  }

  override def merge(x: (java.math.BigDecimal, java.math.BigDecimal),
      y: (java.math.BigDecimal, java.math.BigDecimal)): (java.math.BigDecimal, java.math.BigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN
    else r._1.doubleValue() / r._2.doubleValue()

  override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
      .asInstanceOf[Encoder[(java.math.BigDecimal, java.math.BigDecimal)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
