package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-WIDE physical-plan audit: every registered query is planned
  * (not executed) at sf0.001 and scanned for the three classic
  * scale-killers —
  *
  *  1. `CartesianProduct` joins (quadratic row blow-up),
  *  2. data-sized UNPARTITIONED windows (`row_number() OVER (ORDER BY
  *     …)` with no PARTITION BY — the single-reducer sort), and
  *  3. `BroadcastNestedLoopJoin` (the round-11 blind spot: non-equi
  *     pair joins — the brute-force candidate shape — plan as BNLJ,
  *     not CartesianProduct, whenever one side fits the broadcast
  *     threshold, which at sf0.001 is always).
  *
  * Each has an allowlist of queries whose use is deliberate and
  * documented (a tiny×tiny cross join; windows over provably
  * parallelism-sized relations; declared brute-force audit tiers and
  * broadcast model-sized probes). Every new query joins the audit
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

  // CONDITIONED BroadcastNestedLoopJoins — a non-equi join is the
  // physical shape of a brute-force candidate generator (|L|·|R| work
  // unless one side is model-sized), so every occurrence must be one
  // of the two reviewed idioms:
  //  (a) declared exact/audit pair tiers whose all-pairs join IS the
  //      contract (the q190-convention price of an oracle-replayable
  //      edge set) — each ships next to a banded/bucketed scale twin:
  //      q32/q306 (→q310), q26/q269 (→q274/q307), the graph family's
  //      shared similarPairs edges (→ the LSH edge swap, q196);
  //  (b) a data-sized scan probed by a BROADCAST model-sized side
  //      (query sets, centroid tables, k-row probe slices) — linear
  //      in the corpus, the right plan at any scale.
  // (Graph-family queries riding similarPairs — q158/q226/q284/q290/
  // q136/q82/… — do NOT appear here: their edge relation
  // localCheckpoints eagerly during construction, so the audited plan
  // reads the checkpoint, not a live pair join.)
  private val bnljConditionedOk = Set(
    // (a) declared exact/audit ALL-PAIRS tiers — the non-equi
    //     corpus×corpus join IS the contract, each next to a
    //     banded/bucketed scale twin (q32/q306 → q310; q152's
    //     triangle audit rides the same pair tier; q265's exact cross
    //     → the documented ANN-shortlist swap; q262's probe slice is
    //     corpus/10 — declared probe-broadcast exact tier)
    "q32_similar_pairs", "q306_embedding_leakage",
    "q152_triangle_counts", "q262_knn_labels", "q265_bitext_margin",
    // (b) non-equi THRESHOLD/RANGE joins against a broadcast
    //     model-/domain-sized side — linear in the corpus: bucket
    //     bounds (q118), tier cuts (q154), scalar thresholds
    //     (q184/q64/q289/q287), |sources|-sized solves/signatures
    //     (q243/q250/q252), decile literals (q267), day-window
    //     fan-out (q279), |labels|² centroid matrix (q288), 3-row
    //     threshold dim (q303), broadcast query probe (q31)
    "q118_equi_depth_hist", "q154_fluency_tiers", "q184_important_stock",
    "q243_source_overlap_sketch", "q250_epoch_allocation",
    "q252_epoch_schedule", "q267_type_growth", "q279_rolling_active",
    "q287_concentration_card", "q288_cluster_separation",
    "q289_zipf_profile", "q303_memorization_spectrum",
    "q64_sales_opportunity", "q31_cosine_topk",
    // (c) crossJoin(broadcast(model-sized)) Cross BNLJs whose
    //     rendered condition is a pushed isnotnull(...) residual on
    //     the shard/epoch arithmetic — the r12 ADVICE regex fix made
    //     these VISIBLE (the old ', (' heuristic classified them as
    //     bare Cross); reviewed: every build side is the #shards-/
    //     |sources|-row offset or allocation relation already
    //     documented in bnljCrossOk
    "q67_token_batches", "q149_global_row_ids", "q168_epoch_mixture",
    "q187_epoch_build", "q207_lang_epoch_mixture",
    "q225_packing_efficiency", "q229_waterfill_sample")

  // bare-Cross BNLJs (no join condition) — the explicit
  // `crossJoin(broadcast(model-sized))` idiom: 1-row cards/totals,
  // k-row centroid/quantile/alloc literals, probed-cell sidecars
  // fanned against one corpus scan. Reviewed one by one (every entry
  // is a model-sized build side); listed exhaustively so a NEW
  // unreviewed crossJoin fails the audit instead of shipping.
  private val bnljCrossOk = Set(
    "q119_key_skew_profile", "q127_source_mixture", "q140_bigram_fluency",
    "q146_nearest_centroid", "q149_global_row_ids", "q154_fluency_tiers",
    "q165_bm25_topk", "q168_epoch_mixture", "q170_importance_weights",
    "q176_semdedup", "q187_epoch_build", "q18_cross_join",
    "q205_ivf_materialized", "q207_lang_epoch_mixture",
    "q211_release_card", "q212_heldout_fluency", "q223_vocab_coverage",
    "q225_packing_efficiency", "q227_budget_waterfill",
    "q229_waterfill_sample", "q230_length_spectrum",
    "q235_cleaning_impact_card", "q238_interleaved_order",
    "q248_cluster_adjacent_order", "q250_epoch_allocation",
    "q252_epoch_schedule", "q255_retrieval_triplets",
    "q263_lsh_band_plan", "q267_type_growth", "q268_collocations",
    "q271_kn_fluency", "q272_ess_card", "q283_affinity_lift",
    "q284_modularity_card", "q286_stationary_mix",
    "q287_concentration_card", "q291_fk_integrity", "q295_path_motifs",
    "q296_anisotropy_card", "q298_anisotropy_sampled",
    "q302_ivfpq_topk", "q303_memorization_spectrum",
    "q308_windowed_pmi", "q311_ivfpq_served", "q313_ivf_exact_topk",
    "q34_ann_ivf", "q67_token_batches", "q88_price_histogram",
    "q94_funnel", "q314_semdedup_exact",
    // q319's probe crossJoins the broadcast cells×Dim centroid
    // sidecar against the k-row query slice (q313's probe shape,
    // served from the artifact)
    "q319_ivf_exact_served",
    // q326's cell assignment crossJoins the broadcast k×Dim exact
    // centroids against the corpus (q313/q314's assignment shape);
    // the quota window after it is cell-keyed, never global
    "q326_cluster_balanced_sample",
    // q327 assigns the INCREMENT slice against the broadcast centroid
    // sidecar (q319's probe shape at nprobe=1); the decision join
    // after it is cell-keyed against the partition-pruned base scan
    "q327_semdedup_incremental",
    // q328: the same sidecar assignment plus a 1-row totals broadcast
    // fanned against the ≤cells-row occupancy relation
    "q328_index_staleness",
    // q330 is q327's decision against the DURABLE artifact: the same
    // increment-vs-broadcast-sidecar assignment crossJoin (the cents
    // frame now a lake parquet read instead of a catalog table)
    "q330_semdedup_atrest",
    // q340/q341 compose the q327/q330 semantic screen — the same
    // broadcast-sidecar assignment crossJoin, one per composition
    "q340_nightly_admission", "q341_nightly_admission_atrest",
    // q344 is q330's decision against the APPENDED index (frozen
    // centroids; base ∪ delta scan) — the same increment-vs-
    // broadcast-sidecar assignment crossJoin; q342 composes it
    "q344_sem_appended", "q342_nightly_admission_appended",
    // q348 serves q342's composition from the COMPACTED homes and
    // q350 composes the media screens on top of q342 — both inherit
    // the same single broadcast-sidecar assignment crossJoin
    "q348_nightly_admission_compacted", "q350_nightly_admission_media")

  /** Every BNLJ operator line, classified: `true` = carries a join
    * condition (non-equi candidate shape), `false` = bare Cross
    * (explicit broadcast crossJoin). The operator renders as
    * `BroadcastNestedLoopJoin BuildSide, JoinType[, condition]` — the
    * condition usually opens with '(' but a bare attribute or
    * function call would not, so ANY non-space after ', ' counts as
    * conditioned (ADVICE r12). */
  private def bnljOccurrences(plan: String): Seq[Boolean] =
    "BroadcastNestedLoopJoin (?:BuildLeft|BuildRight), (\\w+)(, \\S)?".r
      .findAllMatchIn(plan)
      .map(m => m.group(2) != null || m.group(1) != "Cross")
      .toSeq

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
        val bnlj = bnljOccurrences(plan)
        if (bnlj.contains(true) && !bnljConditionedOk(name))
          offenders += s"$name: conditioned BroadcastNestedLoopJoin"
        if (bnlj.contains(false) && !bnljCrossOk(name))
          offenders += s"$name: bare-Cross BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
