package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every query takes
  * (session, sfDir) and returns a deterministic, totally-ordered
  * DataFrame; `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query (same column names, same ordering).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    QueryModule(operators.Relational.queries, operators.Relational.oracleSql),
    QueryModule(operators.Advanced.queries, operators.Advanced.oracleSql),
    QueryModule(operators.FunctionBreadth.queries,
      operators.FunctionBreadth.oracleSql),
    QueryModule(operators.TpchShapes.queries, operators.TpchShapes.oracleSql),
    QueryModule(operators.ScalePatterns.queries,
      operators.ScalePatterns.oracleSql),
    QueryModule(operators.Quality.queries, operators.Quality.oracleSql),
    QueryModule(operators.Behavioral.queries, operators.Behavioral.oracleSql),
    QueryModule(operators.CorpusSignals.queries,
      operators.CorpusSignals.oracleSql),
    QueryModule(operators.Sketches.queries, operators.Sketches.oracleSql),
    QueryModule(operators.RuntimeFilters.queries,
      operators.RuntimeFilters.oracleSql),
    QueryModule(operators.Incremental.queries, operators.Incremental.oracleSql),
    QueryModule(operators.Merge.queries, operators.Merge.oracleSql),
    QueryModule(operators.TextAnalysis.queries, operators.TextAnalysis.oracleSql),
    QueryModule(operators.DataHygiene.queries, operators.DataHygiene.oracleSql),
    QueryModule(operators.Dedup.queries, operators.Dedup.oracleSql),
    QueryModule(operators.Ingest.queries, operators.Ingest.oracleSql),
    QueryModule(operators.Similarity.queries, operators.Similarity.oracleSql),
    QueryModule(operators.Describe.queries, operators.Describe.oracleSql),
    QueryModule(operators.WaqiParity.queries, operators.WaqiParity.oracleSql),
    QueryModule(streaming.StreamingOps.queries, streaming.StreamingOps.oracleSql),
    QueryModule(multimodal.Multimodal.queries, multimodal.Multimodal.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}

/** A bundle of queries + their oracle SQL contributed by one module. */
final case class QueryModule(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracleSql: Map[String, String])
