package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join mitigation — the second leg of the skew
  * story next to the explicit salting in operators/Skew.scala: salting
  * fixes known-hot keys in the plan, AQE splits the skewed partitions
  * it discovers at runtime. This spec forces a sort-merge join with
  * one dominant key and asserts the adaptive final plan actually
  * split it (skew=true), proving the configuration works end-to-end
  * on this build, not just in documentation. */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSession.spark

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force SMJ — a broadcast join has no skewed shuffle to split
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one hot key carrying ~95% of the left side, with a payload
      // column so the skewed partition crosses the byte threshold
      val left = spark.range(0, 200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id"))
          .as("k"),
          concat(lit("x"), col("id")).as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution (count()
      // would build and run a different aggregate plan, leaving the
      // join's adaptive plan unfinalized)
      assert(joined.collect().length == 190005)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SMJ in the adaptive final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
