package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SimHash vote accumulator: folds 64-bit token hashes into one
  * 64-counter vote buffer (+1 per set bit, -1 per clear bit) and packs
  * the sign of each counter into the final 64-bit SimHash.
  *
  * One typed buffer replaces the previous 64 separate
  * `sum(when(shiftright(h, i) & 1 …))` aggregate columns — a single
  * tight loop per input row instead of 64 independent codegen'd
  * aggregates, and (because votes are per-OCCURRENCE, which sums to the
  * same totals as the per-token-count weighting) it also removes the
  * whole (doc_id, token) term-frequency pre-aggregation: one shuffle of
  * per-doc buffers instead of two passes. Merge is elementwise add —
  * associative and commutative, so results are identical under any
  * partitioning.
  */
object SimhashVotes extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      b(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var r = 0L
    var i = 0
    while (i < 64) { if (b(i) > 0) r |= (1L << i); i += 1 }
    r
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
