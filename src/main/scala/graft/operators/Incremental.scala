package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental aggregation via algebraic state merge — the pattern
  * that keeps a 100 TB daily pipeline from recomputing history: each
  * increment (e.g. one day's partition) aggregates to a tiny per-group
  * STATE (count / decimal sums / min / max), states are stored, and
  * the rollup MERGES states instead of rescanning rows. Every
  * aggregate here is algebraic (merge = sum/sum/min/max of partials),
  * and the decimal accumulation makes the merge order-independent, so
  * merged-increments ≡ direct-aggregate bit-for-bit — which is
  * precisely what the oracle (a direct aggregate over the full table)
  * proves.
  */
object Incremental {

  private val keys = Seq(col("l_returnflag"), col("l_linestatus"))

  /** Per-group aggregation state for one increment. Sums stay DECIMAL
    * here — converting to double per-increment would break the
    * order-independence the merge relies on. */
  def partialState(increment: DataFrame): DataFrame =
    increment.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))

  /** Merge any number of increment states into the final rollup. */
  def mergeStates(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys: _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sq")).cast("double").as("sum_qty"),
        min(col("mn")).as("min_price"),
        max(col("mx")).as("max_price"),
        sum(col("sp")).cast("double").as("sum_price"))
      .orderBy(keys: _*)

  /** The lineitem table split into a history / new-arrivals pair at a
    * ship-date watermark, aggregated per increment, merged. */
  def incrementalLineitemRollup(t: Tables,
      watermark: String = "1995-06-15"): DataFrame = {
    val cut = to_timestamp(lit(watermark))
    mergeStates(Seq(
      partialState(t.lineitem.filter(col("l_shipdate") < cut)),
      partialState(t.lineitem.filter(col("l_shipdate") >= cut))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_incremental_agg" ->
      ((s, d) => incrementalLineitemRollup(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q120_incremental_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
        |    AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
