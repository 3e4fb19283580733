package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.Tables
import graft.functions.Exact

/** Explicit runtime-filter join pruning — the pattern behind Spark's
  * own `InjectRuntimeFilter` rule, stated as a first-class operator:
  * build a Bloom filter over the small side's join keys, broadcast it
  * into a scan-side predicate on the big side, and keep the exact join
  * afterwards so false positives never reach the result.
  *
  * At 100 TB this is the difference between shuffling every lineitem
  * row into the semi join versus dropping ~(1 - selectivity) of them
  * at the scan (the Bloom predicate sits right above the parquet
  * reader and is codegen'd — `BloomFilterMightContain` is the same
  * expression Spark's adaptive runtime filtering plants). The filter
  * build is one tiny job over the already-filtered key side — the same
  * extra job Spark's own rule materializes for its subquery filter.
  */
object RuntimeFilters {

  /** Spark's codegen'd Bloom-membership predicate over a driver-built
    * sketch embedded as a binary literal. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftColumnBridge.expression(value)))

  /** Serialized Bloom filter over one long-typed column of `keys`. */
  def buildBloom(keys: DataFrame, c: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bloom = keys.stat.bloomFilter(c, math.max(expectedItems, 1000L), fpp)
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Revenue of lineitems belonging to urgent orders: Bloom-prune the
    * lineitem scan with the urgent-order keys, then an exact semi join
    * (which removes the ~fpp false positives), then the aggregate.
    * Result is identical to the plain semi join — which is exactly
    * what the oracle states. */
  def bloomPrunedOrderRevenue(t: Tables,
      priority: String = "1-URGENT"): DataFrame = {
    val urgent = t.orders
      .filter(col("o_orderpriority") === priority)
      .select(col("o_orderkey"))
    // Two build-time jobs (count to size the sketch, then the bloom
    // aggregate) share one cached scan of the filtered key side;
    // ~1.2 MB at fpp=0.01 for 1M keys, fine to embed as a plan
    // literal. The semi join below re-scans with the pushed-down
    // priority filter at execution time — the cache is released
    // before the query runs so nothing leaks into the session.
    urgent.persist()
    val bloom =
      try buildBloom(urgent, "o_orderkey", urgent.count())
      finally urgent.unpersist(false)
    t.lineitem
      .filter(mightContain(bloom, col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Exact.sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_bloom_pruned_join" ->
      ((s, d) => bloomPrunedOrderRevenue(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q117_bloom_pruned_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
