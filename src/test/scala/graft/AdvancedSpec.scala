package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Advanced

class AdvancedSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark

  private def t = Tables(spark, "/root/testdata/sf0.001")

  test("corrMatrix: exact-moment correlations agree with the engine's " +
      "streaming corr, upper triangle complete and in [-1, 1]") {
    val rows = graft.operators.FunctionBreadth.corrMatrix(t).collect()
    assert(rows.length == 6) // C(4,2) over the sorted column list
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1)) // upper triangle
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-15)
      // the engine's corr is order-dependent in the last bits but
      // agrees to ~1e-9 — the exact-decimal path is the hash-stable one
      val builtin = t.lineitem
        .agg(corr(col(r.getString(0)), col(r.getString(1))))
        .head.getDouble(0)
      assert(math.abs(r.getDouble(3) - builtin) < 1e-9,
        s"$r vs builtin $builtin")
    }
  }

  test("asof join matches brute-force latest-order-at-or-before") {
    val asof = Advanced.asofOrders(t)
    // brute force: for each event, max (o_orderdate, o_orderkey) <= ts
    val brute = t.events.alias("e")
      .join(t.orders.alias("o"),
        col("e.user_id") === col("o.o_custkey") &&
          col("o.o_orderdate") <= col("e.ts"), "left")
      .groupBy(col("e.event_id"))
      .agg(max(struct(col("o.o_orderdate"), col("o.o_orderkey")))
        .as("best"))
      .select(col("event_id"), col("best.o_orderkey").as("bf_orderkey"))
    val joined = asof.join(brute, Seq("event_id"))
    val mismatch = joined.filter(
      not(col("o_orderkey") <=> col("bf_orderkey")))
    assert(mismatch.isEmpty)
    // and events truly before any order for that user have nulls
    assert(asof.filter(col("o_orderkey").isNull).count() ==
      brute.filter(col("bf_orderkey").isNull).count())
  }

  test("range join pairs respect the window and user identity") {
    val pairs = Advanced.purchaseErrorPairs(t)
    val bad = pairs.filter(
      col("error_ts") < col("purchase_ts") ||
        col("error_ts") > col("purchase_ts") + expr("INTERVAL 30 MINUTES"))
    assert(bad.isEmpty)
    // no duplicate pairs from the two-bucket expansion
    val dup = pairs.groupBy("purchase_id", "error_id").count()
      .filter(col("count") > 1)
    assert(dup.isEmpty)
  }

  test("grouping sets: grand total row equals orders count") {
    val gs = Advanced.orderGroupingSets(t)
    val grand = gs.filter(col("status") === "ALL" &&
      col("priority") === "ALL")
    assert(grand.count() == 1)
    assert(grand.head.getAs[Long]("n") == t.orders.count())
  }
}
