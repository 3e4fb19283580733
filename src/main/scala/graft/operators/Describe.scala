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
    * computed from exact decimal sums: sqrt((Σx² - (Σx)²/n)/(n-1)).
    *
    * All columns are aggregated in ONE pass over the table (a single
    * partial+final aggregate, no per-column rescan); the wide 1-row
    * result is then exploded to the per-column long layout driver-side
    * shape. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val dec = col(c).cast("decimal(18,2)")
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(dec).cast("double").as(s"${c}__s"),
        sum(dec * dec).cast("double").as(s"${c}__s2"),
        min(col(c)).cast("double").as(s"${c}__min"),
        percentile(col(c), lit(0.25)).as(s"${c}__p25"),
        percentile(col(c), lit(0.5)).as(s"${c}__p50"),
        percentile(col(c), lit(0.75)).as(s"${c}__p75"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val n = col(s"${c}__n")
      val s = col(s"${c}__s")
      val s2 = col(s"${c}__s2")
      struct(
        lit(c).as("column"), n.as("n"),
        (s / n).as("mean"),
        sqrt((s2 - s * s / n) / (n - lit(1))).as("stddev"),
        col(s"${c}__min").as("min"), col(s"${c}__p25").as("p25"),
        col(s"${c}__p50").as("p50"), col(s"${c}__p75").as("p75"),
        col(s"${c}__max").as("max"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("column"))
  }

  /** Exact linear-interpolation quantiles via value counts: one
    * groupBy(value) shuffle (domain-sized, not data-sized), then a
    * range-partitioned distributed prefix sum over the distinct values
    * ([[rankedBoundary]]) to locate the <= 2·|probs| boundary values,
    * interpolated driver-side — the same scalars a subquery would pull.
    * Matches `percentile`/`quantile_cont` bitwise (identical
    * h = p(n-1), lo + d·(hi-lo) arithmetic) while avoiding both
    * Percentile's per-partition hashmap of every distinct value AND any
    * single-reducer global window: the cumulative sum runs per range
    * bucket in parallel, with per-bucket offsets (one tiny collect of
    * #buckets rows) added back. The counts frame is persisted across
    * the two jobs (bucket totals, boundary probe) so the base table is
    * scanned once. */
  def exactQuantiles(df: DataFrame, c: String, probs: Seq[Double],
      knownCount: Option[Long] = None): Seq[Double] = {
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val n = knownCount.getOrElse(
        counts.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0))
      if (n == 0) return probs.map(_ => Double.NaN)
      val positions = probs.map { p =>
        val h = p * (n - 1)
        (h, math.floor(h).toLong, math.ceil(h).toLong)
      }
      val wanted = positions.flatMap(x => Seq(x._2, x._3)).distinct.sorted
      // value at 0-based sorted index i is the first v with cum > i
      val boundary = rankedBoundary(counts, wanted)
        .filter(wanted.map(i => col("cum") > i &&
          (col("cum") - col("cnt")) <= i).reduce(_ || _))
        .select(col("v"), col("cnt"), col("cum"))
        .collect()
      val at = wanted.map { i =>
        i -> boundary.find(r =>
          r.getAs[Long]("cum") > i &&
            r.getAs[Long]("cum") - r.getAs[Long]("cnt") <= i).get
          .getAs[Double]("v")
      }.toMap
      positions.map { case (h, lo, hi) =>
        val (vl, vh) = (at(lo), at(hi))
        vl + (h - lo) * (vh - vl)
      }
    } finally counts.unpersist(false)
  }

  /** Distributed running rank over distinct-value counts, with NO
    * global window: split the value domain into ~equi-depth range
    * buckets (approx_percentile boundaries, collected once and embedded
    * as LITERALS so bucket id is a deterministic pure function of `v`
    * — consistent across jobs by construction), cumulative-sum WITHIN
    * each bucket in parallel, and add each bucket's starting offset — a
    * driver-side prefix over the per-bucket totals (#buckets rows,
    * O(parallelism)). Only the buckets that can contain a wanted rank
    * are probed, so the boundary job touches a |wanted|-bounded subset.
    * Returns rows with `v`, `cnt` and the exact global running count
    * `cum`. */
  private[graft] def rankedBoundary(counts: DataFrame, wanted: Seq[Long],
      parts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bnds = Option(
        counts.agg(approx_percentile(col("v"),
          array((1 until parts).map(i => lit(i.toDouble / parts)): _*),
          lit(10000)).as("q")).head().getSeq[Double](0))
      .getOrElse(Seq.empty).distinct.sorted
    val bucketCol =
      if (bnds.isEmpty) lit(0)
      else size(filter(typedLit(bnds), x => x <= col("v")))
    val bucketed = counts.withColumn("b", bucketCol)
    val totals = bucketed.groupBy(col("b"))
      .agg(sum(col("cnt")).as("bc"))
      .collect()
      .map(r => (r.getAs[Int]("b"), r.getAs[Long]("bc")))
      .sortBy(_._1)
    var running = 0L
    val offsets = totals.map { case (b, bc) =>
      val o = (b, running, bc); running += bc; o
    }
    val needed = offsets.collect {
      case (b, off, bc) if wanted.exists(i => i >= off && i < off + bc) =>
        (b, off)
    }
    if (needed.isEmpty) return bucketed.filter(lit(false))
      .withColumn("cum", lit(0L))
    val offExpr = element_at(
      map(needed.flatMap { case (b, off) => Seq(lit(b), lit(off)) }: _*),
      col("b"))
    val wLocal = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed
      .filter(col("b").isin(needed.map(_._1): _*))
      .withColumn("cum", sum(col("cnt")).over(wLocal) + offExpr)
  }

  /** [[exact]] for big/near-continuous data: moments in one scan,
    * quartiles via [[exactQuantiles]] (domain-sized counts instead of
    * Percentile's all-distinct-values hashmap). Values are bit-
    * identical to [[exact]]; the result is assembled driver-side from
    * the collected scalars. */
  def exactLarge(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val aggs = cols.flatMap { c =>
      val dec = col(c).cast("decimal(18,2)")
      Seq(count(col(c)), sum(dec).cast("double"),
        sum(dec * dec).cast("double"), min(col(c)).cast("double"),
        max(col(c)).cast("double"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = cols.sorted.map { c =>
      val b = cols.indexOf(c) * 5
      val n = r.getLong(b)
      val s = r.getDouble(b + 1)
      val s2 = r.getDouble(b + 2)
      val qs = exactQuantiles(df, c, Seq(0.25, 0.5, 0.75), Some(n))
      org.apache.spark.sql.Row(c, n, s / n,
        math.sqrt((s2 - s * s / n) / (n - 1)), r.getDouble(b + 3),
        qs(0), qs(1), qs(2), r.getDouble(b + 4))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("mean",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("stddev",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("min",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("p25",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("p50",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("p75",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("max",
          org.apache.spark.sql.types.DoubleType))))
  }

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
      ((s, d) => exactLarge(Tables(s, d).lineitem, LineitemCols))
  )

  // DuckDB's direct DECIMAL->DOUBLE cast is not correctly rounded for
  // values whose scaled magnitude exceeds 2^53 (observed 1-ulp error on
  // the sf0.1 sum of squares); the VARCHAR round-trip IS correctly
  // rounded and therefore bit-matches Spark's BigDecimal.doubleValue.
  private def d(expr: String): String =
    s"CAST(CAST($expr AS VARCHAR) AS DOUBLE)"

  private def describeSql(c: String): String =
    s"""SELECT '$c' AS "column", COUNT($c) AS n,
       |  ${d(s"SUM(CAST($c AS DECIMAL(18,2)))")} / COUNT($c) AS mean,
       |  sqrt((${d(s"SUM(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2)))")}
       |    - ${d(s"SUM(CAST($c AS DECIMAL(18,2)))")}
       |      * ${d(s"SUM(CAST($c AS DECIMAL(18,2)))")} / COUNT($c))
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
