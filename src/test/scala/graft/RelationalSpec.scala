package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def t = Tables(spark, "/root/testdata/sf0.001")

  test("exact sums are partitioning-invariant (bit-identical)") {
    val df = t.lineitem
    def total(parts: Int): Double = df.repartition(parts)
      .agg(Exact.sumD2(col("l_extendedprice"))).head.getDouble(0)
    assert(total(1) == total(13))
  }

  test("fkIntegrity: planted orphans (incl. a NULL key) are counted " +
      "with exact fraction; the intact corpus reads all-zero orphans") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Relational.fkIntegrityRel("c->p", child, "ck", parent, "pk")
      .collect()(0)
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.6)

    val card = Relational.fkIntegrity(t).collect()
    assert(card.length == 7)
    assert(card.forall(_.getLong(2) == 0L), "synthetic corpus is intact")
    assert(card.forall(_.getDouble(3) == 0.0))
  }

  test("keyUniqueness: planted duplicate simple and composite keys " +
      "read exact surplus; the audit catches the corpus's broken " +
      "lineitem composite key and clears the nine id keys") {
    val dup = Seq(1L, 1L, 2L).toDF("k")
    val r1 = Relational.keyUniquenessOf("t1", dup, "k", col("k"))
      .collect()(0)
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 2L &&
      r1.getLong(4) == 1L && !r1.getBoolean(5))

    val comp = Seq((1L, 1L), (1L, 2L), (1L, 1L)).toDF("a", "b")
    val r2 = Relational.keyUniquenessOf("t2", comp, "a,b",
      col("a"), col("b")).collect()(0)
    assert(r2.getLong(2) == 3L && r2.getLong(3) == 2L &&
      r2.getLong(4) == 1L && !r2.getBoolean(5))

    // the card's real finding: every single-column id is unique, but
    // the synthetic generator does NOT honor TPC-H's composite
    // (l_orderkey, l_linenumber) key — the audit catches it, with the
    // surplus replaying exactly from a driver distinct count
    val card = Relational.keyUniqueness(t).collect()
    assert(card.length == 10)
    val (li, rest) = card.partition(_.getString(0) == "lineitem")
    rest.foreach { r =>
      assert(r.getBoolean(5) && r.getLong(4) == 0L &&
        r.getLong(2) == r.getLong(3), r)
    }
    val nKeys = t.lineitem
      .select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(li(0).getLong(2) == t.lineitem.count())
    assert(li(0).getLong(3) == nKeys)
    assert(li(0).getLong(4) == li(0).getLong(2) - nKeys &&
      li(0).getLong(4) > 0L && !li(0).getBoolean(5))
  }

  test("top-k orders agrees with full sort") {
    val viaLimit = Relational.topOrders(t).collect().map(_.getLong(0)).toSeq
    val full = t.orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).take(10).toSeq
    assert(viaLimit == full)
  }

  test("rollup grand total equals table count") {
    val grand = Relational.rollupQuantity(t)
      .filter(col("ret") === "ALL" && col("status") === "ALL")
      .head.getAs[Long]("n")
    assert(grand == t.lineitem.count())
  }

  test("semi + anti join partition the customer table") {
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val anti = Relational.customersWithoutOrders(t).count()
    val withUrgent = t.customer.join(
      t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(withUrgent + anti == t.customer.count())
    assert(withUrgent <= urgent)
  }

  test("per-group top-k never exceeds 3 rows per customer") {
    val over = Relational.topOrdersPerCustomer(t)
      .groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.isEmpty)
  }

  test("events pivot row sums match ungrouped totals") {
    val p = Relational.eventsPivotDaily(t)
    val nFromPivot = p.agg(sum("n_events")).head.getLong(0)
    assert(nFromPivot == t.events.count())
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has unique name; oracle keys are a subset") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }
}
