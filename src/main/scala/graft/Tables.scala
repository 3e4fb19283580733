package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema plus the
  * `events`/`documents`/`embeddings` tables (see TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets a real
  * file scan to push filters/projections into — at 100 TB these become
  * partitioned/bucketed catalog tables, and every operator in this
  * library keeps working unchanged because it only sees a DataFrame.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** `events.ts` has shipped in two physical encodings across driver
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 refuses to
    * read natively, so we read nanos-as-long and rebuild a micro
    * timestamp — and plain TIMESTAMP(MICROS), which reads directly.
    * Branch on the type the scan actually resolves so both generations
    * of data load to the same session-TZ TIMESTAMP column. The nanos
    * path is lossless here (the generator emits micro-aligned values),
    * and DuckDB's own read truncates to micros identically.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer `div` — a double `/` would lose
        // precision at ns-epoch scale
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
