package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`org.apache.spark.sql.expressions.Aggregator`):
  * exact weighted mean with decimal-free but order-stable semantics —
  * the buffer carries (Σwx, Σw) as scaled longs (inputs are 2-decimal
  * money values, so wx with a 2dp weight has at most 4 decimals; scale
  * by 10^4 into exact integer arithmetic). Merge is associative and
  * commutative, so results are identical under any partitioning — the
  * same guarantee graft.functions.Exact gives the built-in aggregates.
  */
object WeightedMean
    extends Aggregator[(Double, Double), (Long, Long), Double] {

  private val Scale = 10000L // 4 decimal places, exact for 2dp x 2dp

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) = {
    val (x, w) = a
    (b._1 + math.round(x * w * Scale), b._2 + math.round(w * 100))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN
    else (r._1.toDouble / Scale) / (r._2.toDouble / 100)

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
