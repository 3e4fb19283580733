package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

/** K1/K2/K4 parity: the JDBC sink against embedded Derby — same Spark
  * code path (JdbcUtils DDL synthesis + batched PreparedStatement) as
  * the reference's Redshift load. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write.jdbc derives DDL, batches inserts, appends") {
    val df = Seq((1L, "amsterdam", 28.5), (2L, "berlin", 17.0),
      (3L, "paris", 45.25)).toDF("id", "city", "o3_daily_avg")
    Sinks.jdbc(df, url, "air_quality_o3", "", "")
    Sinks.jdbc(df.filter(col("id") === 1), url, "air_quality_o3", "", "")

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "air_quality_o3").load()
    assert(back.count() == 4) // 3 + 1 appended
    assert(back.schema.fieldNames.toSet == Set("id", "city", "o3_daily_avg"))
    val r = back.filter(col("id") === 3).head
    assert(r.getAs[String]("city") == "paris")
    assert(r.getAs[Double]("o3_daily_avg") == 45.25)
  }

  test("per-key routing writes one table per pollutant (K3)") {
    val tables = Map(
      "pm25" -> Seq((1L, 45.0)).toDF("id", "v"),
      "uvi" -> Seq((1L, 2.0)).toDF("id", "v"))
    Sinks.jdbcPerKey(tables, url, "aq_", "", "")
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "AQ_%", null)
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toSet
      assert(names == Set("AQ_PM25", "AQ_UVI"))
    } finally conn.close()
  }
}
