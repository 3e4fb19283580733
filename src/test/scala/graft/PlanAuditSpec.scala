package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-WIDE physical-plan audit: every registered query is planned
  * (not executed) at sf0.001 and scanned for the two classic
  * scale-killers —
  *
  *  1. `CartesianProduct` joins (quadratic row blow-up), and
  *  2. data-sized UNPARTITIONED windows (`row_number() OVER (ORDER BY
  *     …)` with no PARTITION BY — the single-reducer sort).
  *
  * Each has a small allowlist of queries whose use is deliberate and
  * documented (a tiny×tiny cross join; windows over provably
  * parallelism-sized relations). Every new query joins the audit
  * automatically on registration, so a scale regression fails CI
  * instead of surfacing in a 100 TB run. Final single-row aggregates
  * and TakeOrdered/broadcast exchanges are NOT flagged — a global agg
  * legitimately funnels its few partial rows to one task.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("columnStats default path plans without a multi-distinct Expand") {
    import org.apache.spark.sql.functions.col
    val li = Tables(spark, sf).lineitem
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity",
      "l_returnflag")
    val approx = operators.Quality.columnStats(li, cols)
      .queryExecution.executedPlan.toString
    assert(!approx.contains("Expand"),
      "approx-NDV default must not Expand the scan")
    // and the audit configuration pays exactly that price — if Spark
    // ever plans multi-distinct without Expand, this doc-pin tells us
    val exact = operators.Quality.columnStats(li, cols, exactNdv = true)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"))
    // same contract, differing only in the ndv column
    val a = operators.Quality.columnStats(li, cols)
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_value"), col("max_value")).collect().toSeq
    val e = operators.Quality.columnStats(li, cols, exactNdv = true)
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_value"), col("max_value")).collect().toSeq
    assert(a == e)
  }

  // deliberate cross joins: q18 is the tiny×tiny cross-join demo
  private val cartesianOk = Set("q18_cross_join")

  // unpartitioned windows over provably tiny relations (documented in
  // EXPLAIN.md): q67's shard-offset prefix and q149's offset table
  // both run over exactly #shards (= parallelism) rows; q191's offset
  // prefix runs over ≤ 2·parallelism quality-range shard totals
  // q204's cumulative-novelty prefix runs over ≤ #sources rows
  // q222's offset prefix runs over ≤ 256 hash-shard count rows
  // q223's cumulative-coverage prefix runs over the counts-of-counts
  // rollup — O(√total_tokens) rows by Zipf, vocab-bounded
  // q227's ranking + solve windows ride the |sources|-row rollup
  // q225 inherits q67's #shards-row offset window (same plan + rollup)
  private val globalWindowOk = Set("q67_token_batches",
    "q149_global_row_ids", "q191_curriculum_batches",
    "q204_source_novelty", "q222_epoch_shuffle",
    "q223_vocab_coverage", "q227_budget_waterfill",
    "q225_packing_efficiency", "q229_waterfill_sample")

  // streaming sources can't plan in a batch session; DSv2/JDBC/report
  // queries touch external state — they have their own suites
  private val skip = Set(
    "q40_tumbling_daily", "q41_sliding_2d", "q42_session_windows",
    "q83_stream_enrich_category", "q103_event_throttle",
    "q132_contamination_stream",
    "q60_waqi_flatten_long", "q61_waqi_pivot_wide",
    "q62_waqi_per_pollutant", "q63_waqi_dsv2_source",
    "q86_quality_report", "q162_bucketed_join")

  /** An unpartitioned window spec renders as `windowspecdefinition(`
    * whose FIRST argument is already an ordering term (`col ASC` /
    * `col DESC`) — partitioned specs list partition columns first. */
  private def hasGlobalWindow(plan: String): Boolean =
    "windowspecdefinition\\(([^,()]*) (ASC|DESC)".r
      .findFirstIn(plan).isDefined

  test("no registered query plans a CartesianProduct or a global window") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan at $sf: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct") && !cartesianOk(name))
          offenders += s"$name: CartesianProduct"
        if (hasGlobalWindow(plan) && !globalWindowOk(name))
          offenders += s"$name: unpartitioned window"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
