package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data skipping.
  *
  * Sorting a table by `zValue(x, y)` clusters rows so that every file
  * covers a small rectangle of the (x, y) key space — per-file min/max
  * footer stats then prune scans filtered on EITHER column, not just
  * the leading sort key. This is the layout step behind
  * "OPTIMIZE ... ZORDER BY" in lakehouse engines; here it is plain
  * column arithmetic (shift/and/or chains — codegen'd, no UDF) feeding
  * `repartitionByRange` + `sortWithinPartitions` + a parquet write.
  *
  * The interleave is the standard magic-number bit spread: the low 16
  * bits of each dimension are spaced out to even positions
  * (0x0000FFFF -> 0x55555555 masks) and OR-ed together offset by one.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit lane (held in a long — no sign issues). */
  private def spread(v: Column): Column = {
    val v0 = v.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of (x, y): x's bits at even positions, y's at odd.
    * Inputs are taken modulo 2^16 (clamp or pre-scale wider domains —
    * rank-based bucketing first for real lakes). */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))

  /** The matching DuckDB SQL expression (same arithmetic, for the
    * oracle). */
  def zValueSql(x: String, y: String): String = {
    def spreadSql(v: String): String = {
      val v0 = s"(CAST($v AS BIGINT) & 65535)"
      val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
      val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
      val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
      s"(($v3 | ($v3 << 1)) & 1431655765)"
    }
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
  }
}
