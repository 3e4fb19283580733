package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic aggregate helpers.
  *
  * Floating-point SUM/AVG are order-dependent: a 32-way partial
  * aggregation sums in a different order than a single-threaded oracle,
  * so the last bits differ and a value-hash compare fails. These helpers
  * route the accumulation through exact decimal arithmetic (associative,
  * order-independent) and only convert to double at the very end — the
  * decimal->double conversion is a single deterministic rounding that
  * both Spark and DuckDB perform identically.
  *
  * At scale this is also the *correct* answer (no accumulation error
  * drift across 100 TB of partials), at the cost of decimal math in the
  * partial aggregate — still codegen'd, still map-side combinable.
  *
  * The matching DuckDB SQL fragments live in each operator module's
  * `oracleSql` map (pattern: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
  * DOUBLE)`, with a VARCHAR round-trip for sums whose scaled magnitude
  * can exceed 2^53).
  */
object Exact {

  /** Exact SUM of a 2-decimal-place double column, returned as double. */
  def sumD2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact SUM of a product of 2dp doubles (e.g. price * (1-discount)):
    * both factors are cast to decimal first so the multiply is exact. */
  def sumProdD2(a: Column, b: Column): Column =
    sum(a.cast("decimal(18,2)") * b.cast("decimal(18,2)")).cast("double")

  /** Exact 3-factor product sum: price * (1-disc) * (1+tax). */
  def sumProd3D2(a: Column, b: Column, c: Column): Column =
    sum(a.cast("decimal(18,2)") * b.cast("decimal(18,2)") *
      c.cast("decimal(18,2)")).cast("double")

  /** Exact AVG: decimal sum converted to double, divided by count in
    * double — both engines evaluate the identical double division. */
  def avgD2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))
}
