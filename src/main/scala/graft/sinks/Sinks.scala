package graft.sinks

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Load-stage sinks — the reference's K-series operators
  * (`/root/reference/dags/my_data_pipeline.py:91-140,163-197`).
  *
  * The reference hand-rolls DDL synthesis (K1), batched INSERT
  * transactions (K2), per-key table routing (K3) and connection
  * management (K4) over psycopg2; Spark's JDBC writer already does all
  * four (DDL via JdbcUtils.schemaString, batched PreparedStatement per
  * partition, `batchsize`/`isolationLevel` options), so each maps to
  * configuration rather than code. Failure semantics deliberately
  * differ: the reference silently skips the load when the connection
  * fails (`:171`); we fail fast (SURVEY.md §2.1).
  */
object Sinks {

  /** K1+K2+K4: append into a JDBC table, schema-derived DDL. The
    * `columnTypes` hook reproduces the reference's explicit type map
    * (e.g. VARCHAR(50), my_data_pipeline.py:101) when an external
    * system needs it. */
  def jdbc(df: DataFrame, url: String, table: String,
      user: String, password: String,
      columnTypes: Option[String] = None,
      batchSize: Int = 10000): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    val w = df.write.mode("append")
      .option("batchsize", batchSize.toString)
    columnTypes.fold(w)(ct => w.option("createTableColumnTypes", ct))
      .jdbc(url, table, props)
  }

  /** K3: one JDBC table per key — `air_quality_{pollutant}` routing. */
  def jdbcPerKey(tables: Map[String, DataFrame], url: String,
      tablePrefix: String, user: String, password: String): Unit =
    tables.foreach { case (key, df) =>
      jdbc(df, url, s"$tablePrefix$key", user, password)
    }

  /** Parquet lake sink — the scale-native replacement for per-key JDBC
    * tables: ONE table partitioned by the key column, giving partition
    * pruning instead of N physical tables. */
  def parquetPartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** K5: console sink. */
  def console(df: DataFrame, numRows: Int = 20): Unit =
    df.show(numRows, truncate = false)
}

/** F1+K6: the emailed describe() report becomes a pluggable trait —
  * the SMTP transport is an environment concern, not dataflow. */
trait ReportSink {
  def send(subject: String, body: String): Unit
}

/** Local stand-in for the reference's SMTP sink (K6): collect reports
  * in memory / print them. Tests assert on `sent`. */
final class ConsoleReportSink extends ReportSink {
  val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  override def send(subject: String, body: String): Unit = {
    sent += ((subject, body))
    println(s"=== $subject ===\n$body")
  }
}
