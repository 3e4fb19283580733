package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Summary statistics — the reference's A1 operator
  * (`/root/reference/dags/my_data_pipeline.py:212`, pandas
  * `df.describe()`: count/mean/std/min/25%/50%/75%/max per numeric
  * column).
  *
  * Two paths:
  *  - [[exact]] — oracle-grade: decimal-exact mean/stddev (order
  *    independent; see [[graft.functions.Exact]]) and true
  *    `percentile` quartiles (pandas-style linear interpolation,
  *    matching DuckDB `quantile_cont`). One aggregation pass per
  *    column, unioned — each pass is a single shuffle-free partial agg
  *    (percentile is the only memory-heavy piece; at 100 TB swap it
  *    for `approx_percentile` or a t-digest and accept the tolerance).
  *  - [[fast]] — Spark's built-in `summary()` (approx percentiles),
  *    the O(1)-memory scale path.
  */
object Describe {

  /** pandas-describe-compatible stats for the given numeric columns,
    * one output row per column. Stddev is the sample (ddof=1) form
    * computed from exact decimal sums: sqrt((Σx² - (Σx)²/n)/(n-1)). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val dec = col(c).cast("decimal(18,2)")
      val s = sum(dec).cast("double")
      val s2 = sum(dec * dec).cast("double")
      val n = count(col(c))
      df.agg(
        n.as("n"),
        (s / n).as("mean"),
        sqrt((s2 - s * s / n) / (n - lit(1))).as("stddev"),
        min(col(c)).cast("double").as("min"),
        percentile(col(c), lit(0.25)).as("p25"),
        percentile(col(c), lit(0.5)).as("p50"),
        percentile(col(c), lit(0.75)).as("p75"),
        max(col(c)).cast("double").as("max"))
        .select(lit(c).as("column"), col("n"), col("mean"), col("stddev"),
          col("min"), col("p25"), col("p50"), col("p75"), col("max"))
    }.reduce(_.unionAll(_)).orderBy(col("column"))

  /** Spark-native approximate path (percentile_approx under the hood). */
  def fast(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
      .summary("count", "mean", "stddev", "min", "25%", "50%", "75%", "max")

  /** Plain-text report block, mirroring the reference's
    * `describe().to_string()` email body (F1,
    * my_data_pipeline.py:209-216). Driver-side formatting of an
    * already-aggregated (tiny) result. */
  def report(title: String, described: DataFrame): String = {
    val rows = described.collect()
    val header = described.columns.map(c => f"$c%14s").mkString
    val body = rows.map(_.toSeq.map {
      case d: Double => f"$d%14.4f"
      case v => f"${String.valueOf(v)}%14s"
    }.mkString).mkString("\n")
    s"Summary statistics for $title:\n$header\n$body"
  }

  private val LineitemCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_describe_lineitem" ->
      ((s, d) => exact(Tables(s, d).lineitem, LineitemCols))
  )

  private def describeSql(c: String): String =
    s"""SELECT '$c' AS "column", COUNT($c) AS n,
       |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c) AS mean,
       |  sqrt((CAST(SUM(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS DOUBLE)
       |    - CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)
       |      * CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c))
       |    / (COUNT($c) - 1)) AS stddev,
       |  CAST(MIN($c) AS DOUBLE) AS min,
       |  quantile_cont($c, 0.25) AS p25,
       |  quantile_cont($c, 0.5) AS p50,
       |  quantile_cont($c, 0.75) AS p75,
       |  CAST(MAX($c) AS DOUBLE) AS max
       |FROM lineitem""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q50_describe_lineitem" ->
      (LineitemCols.map(describeSql).mkString("", "\nUNION ALL\n", "\n") +
        """ORDER BY "column"""")
  )
}
