package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Merged increment states must equal the direct aggregate exactly —
  * for the two-way watermark split the query uses AND for arbitrary
  * increment partitionings (the merge is algebraic, so how history was
  * sliced can never matter). */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SharedSession.spark

  private def t = Tables(spark, "/root/testdata/sf0.001")

  private def direct = t.lineitem
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("sum_price"))
    .select(col("l_returnflag"), col("l_linestatus"), col("n"),
      col("sum_qty"), col("min_price"), col("max_price"), col("sum_price"))
    .orderBy(col("l_returnflag"), col("l_linestatus"))

  test("watermark-split rollup equals the direct aggregate bit-for-bit") {
    assert(Incremental.incrementalLineitemRollup(t).collect().toSeq ==
      direct.collect().toSeq)
  }

  test("merge result is independent of how increments were sliced") {
    val threeWay = Seq(0, 1, 2).map(i => Incremental.partialState(
      t.lineitem.filter(pmod(col("l_orderkey"), lit(3)) === i)))
    assert(Incremental.mergeStates(threeWay).collect().toSeq ==
      direct.collect().toSeq)
  }
}
