package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-GROWTH scale trial — the missing axis of [[ScaleTrial]],
  * which deliberately copies the embeddings table as-is (its trial
  * list excludes the all-pairs embedding tiers, so growing the table
  * there would only add noise). The embedding-family scale claims —
  * "q306's exact pair audit is O(n²) BY CONTRACT; q310's banded tier
  * rides bucket density; q302/q311's serving cost is bounded by the
  * probed cells" — need the embeddings table itself to grow, so this
  * trial builds a `factor`× replica:
  *
  *  - vec_id shifts by the id span per replica (disjoint id spaces);
  *  - dimension 0 gets a tiny per-replica perturbation (+replica·1e-3)
  *    so replicas are NEAR-duplicates of their originals (cosine
  *    ≈ 0.9999) rather than byte-equal — every original gains
  *    factor−1 cross-replica near-twins, the dense true-pair growth a
  *    bigger crawl's semantic dup mass actually produces (the
  *    documents-replica convention of [[ScaleTrial]]);
  *  - labels copy unchanged.
  *
  * Expected shapes: q306 grows ~factor² (the exact tier's declared
  * quadratic — the q190 trial precedent, 20.9x at 10x); q310 grows
  * with banded-bucket density (the true-pair mass, not corpus²);
  * q302/q311 stay training-/serve-bounded. Other tables copy as-is
  * (the trial queries read only embeddings).
  *
  * Usage: runMain graft.EmbedScaleTrial [baseSfDir] [factor] [workDir]
  */
object EmbedScaleTrial {

  private val TrialQueries = Seq(
    "q306_embedding_leakage", // exact pair audit: O(n²) BY CONTRACT
    "q310_leakage_lsh", // the scale twin: capped banded candidates
    "q302_ivfpq_topk", // IVF-PQ train+serve fused (one-time cost inside)
    "q311_ivfpq_served", // serve-from-artifact: the steady-state cell
    "q313_ivf_exact_topk", // exact-arithmetic IVF: train linear, serve cell-bounded
    "q314_semdedup_exact", // SemDeDup: pair work rides cell occupancy
    "q315_portable_rp_pairs", // portable sign-LSH: same banded regime as q310
    "q318_rp_pairs_auto", // AUTO-sized bands: width re-derives per corpus
    "q326_cluster_balanced_sample") // balanced sampling: one assign pass + per-cell ranks

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val workDir = if (args.length > 2) args(2) else "/tmp/graft_escale"
    val spark = Bench.timingSession()
    val scaledDir = s"$workDir/x$factor"
    buildScaled(spark, baseDir, scaledDir, factor)
    // the SPARSE twin: replicas dimension-ROLLED, so cross-replica
    // cosines are background-level and the true-pair mass grows only
    // ~factor (within-replica). The contrast cell: the exact tier
    // pays factor² candidate work on BOTH replicas; the banded tier's
    // work rides true-pair mass, so it grows ~factor here while the
    // dense replica drives it ~factor².
    val sparseDir = s"$workDir/x${factor}r"
    buildScaledRolled(spark, baseDir, sparseDir, factor)
    Bench.warmUp(spark, baseDir)
    // optional 4th arg "counts": print only the structural counts
    // (cheap re-entry after a timing run); "inc": only the
    // fixed-increment serving-economics cells (r13 verdict item 2)
    val countsOnly = args.length > 3 && args(3) == "counts"
    if (args.length > 3 && args(3) == "inc") {
      incEconomics(spark, baseDir, scaledDir, factor)
      spark.stop(); return
    }
    if (!countsOnly) {
    println(f"${"query"}%-28s ${"base_s"}%8s ${"x" + factor + "_s"}%8s " +
      f"${"x" + factor + "r_s"}%8s dense sparse")
    // the band-WIDTH sizing knob demonstrated at the grown corpus:
    // 16-bit bands (nPlanes=64, bands=4) cut the random-background
    // collision term b·n²/2^w 256× vs the default 8-bit bands — the
    // (b, r) re-tune a 10x corpus calls for (operator Scaladoc)
    val wide: (SparkSession, String) => DataFrame = (s, d) =>
      operators.Similarity.embeddingSplitLeakageLsh(
        Tables(s, d).embeddings, nPlanes = 64, bands = 4)
    // the md5 plane family's own 16-bit re-tune cell (r12 verdict
    // item: q315's knob claim measured on its own family, not by
    // citing q310's shared candidate machinery)
    val wide315: (SparkSession, String) => DataFrame = (s, d) =>
      operators.Similarity.portableRpPairs(
        Tables(s, d).embeddings, nPlanes = 64, bands = 4)
    (TrialQueries.map(n => n -> SparkEntry.queries(n)) :+
        ("q310_wideband_16bit" -> wide) :+
        ("q315_wideband_16bit" -> wide315)).foreach { case (name, fn) =>
      val base = time(spark, baseDir, fn)
      val dense = time(spark, scaledDir, fn)
      val sparse = time(spark, sparseDir, fn)
      println(f"$name%-28s $base%8.2f $dense%8.2f $sparse%8.2f " +
        f"${dense / base}%5.1fx ${sparse / base}%5.1fx")
    }
    }
    // the STRUCTURAL counts behind the wall clocks: exact-tier pair
    // space (n(n-1)/2 comparisons by contract) vs banded candidate
    // volume at both band widths — the b·n²/2^w sizing analysis in
    // numbers
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(baseDir, scaledDir, sparseDir)) {
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val c8 = operators.Similarity
        .rpLshCandidates(emb, 32, 4, 10000).count()
      val c16 = operators.Similarity
        .rpLshCandidates(emb, 64, 4, 10000).count()
      // the AUTO-sized width at THIS corpus size — what q318/
      // rpLshPairsAuto actually runs; the row that shows the sizing
      // rule keeping candidate volume true-pair-bounded at 10x
      val wAuto = operators.Similarity.signBandWidth(n)
      val cAuto = operators.Similarity
        .rpLshCandidates(emb, 4 * wAuto, 4, 10000).count()
      println(s"$dir: n=$n exact_pairs=${n * (n - 1) / 2} " +
        s"banded_8bit_cands=$c8 banded_16bit_cands=$c16 " +
        s"auto_w=$wAuto auto_cands=$cAuto")
    }
    spark.stop()
  }

  /** The INCREMENTAL-SemDeDup economics at grown base — the r13
    * verdict's item 2: q327/q328/q330 claim the nightly work "scales
    * with the increment and the touched-cell fraction, never the
    * base", pinned until now only by plan specs and one bench cell.
    * This mode MEASURES it with the increment held FIXED while the
    * base grows `factor`×:
    *
    *  - increment: the BASE corpus's vec_id % 10 = 3 slice (same 10%
    *    slice q327 uses), identical at both scales;
    *  - base_small: the base corpus minus the increment;
    *  - base_big: the dense replica corpus minus the increment's id
    *    slots (the replicas of increment docs STAY in the big base as
    *    near-copies — a bigger crawl really does contain more
    *    near-dups of tonight's batch);
    *  - build: one-time quantizer + partitioned write (allowed to
    *    grow ~linearly — paid once per index lifetime, the q328 gate
    *    decides when);
    *  - serve: the q327 decision against the PRE-BUILT index (the
    *    steady-state nightly cost — the claim is ≈ flat), decomposed
    *    with the partition counts the pruned scan actually read;
    *  - fused contrast: q314's whole-corpus SemDeDup, which re-pays
    *    the corpus every night (the cost the incremental path
    *    exists to avoid — grows with the base).
    */
  private def incEconomics(spark: SparkSession, baseDir: String,
      scaledDir: String, factor: Int): Unit = {
    import operators.Similarity
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val embS = Tables(spark, baseDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val embB = Tables(spark, scaledDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val span = embS.agg(max(col("vec_id"))).head.getLong(0) + 1
    val inc = embS.filter(pmod(col("vec_id"), lit(10L)) === 3)
      .localCheckpoint()
    val nInc = inc.count()
    val cases = Seq(
      ("base_x1", embS.filter(pmod(col("vec_id"), lit(10L)) =!= 3)),
      (s"base_x$factor", embB.filter(
        !(pmod(col("vec_id"), lit(10L)) === 3 && col("vec_id") < span))))
    println(f"${"cell"}%-12s ${"n_base"}%8s ${"build_s"}%8s " +
      f"${"serve_s"}%8s ${"parts"}%9s ${"fused_s"}%8s")
    cases.foreach { case (label, base0) =>
      val base = base0.localCheckpoint()
      val nBase = base.count()
      val key = s"incEcon|$label|$scaledDir"
      def clock[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val a = f
        ((System.nanoTime() - t0) / 1e9, a)
      }
      val (tBuild, table) = clock {
        Similarity.materializedIvfExactIndex(spark, base,
          key + "#incbase")
      }
      // steady-state serve (index pre-built): best-of-2
      def serveOnce: (Double, DataFrame) = clock {
        val df = Similarity.semDedupAgainstIndex(spark, inc, base, key)
        df.write.format("noop").mode("overwrite").save()
        df
      }
      val (t1, df1) = serveOnce
      val (t2, _) = serveOnce
      val tServe = math.min(t1, t2)
      // partition decomposition: metrics live on the EXECUTED plan, so
      // drive this QueryExecution directly (collect), then read them
      df1.collect()
      def partsOf(df: DataFrame): Long =
        scansOf(df.queryExecution.executedPlan)
          .filter(_.metadata("Location").contains("graft_ivfx_"))
          .filterNot(_.metadata("Location").contains("cents"))
          .head.metrics("numPartitions").value
      val partsRead = partsOf(df1)
      val allCells = spark.table(table).select(col("cell"))
        .distinct().count()
      // a SINGLE-batch probe (10 vectors): the touched-cell fraction
      // the per-batch streaming serve (q327's stream twin) actually
      // pays — a small batch touches few cells, and the base scan
      // reads only those partitions
      val tiny = inc.limit(10).localCheckpoint()
      val tinyDf = Similarity.semDedupAgainstIndex(spark, tiny, base,
        key)
      tinyDf.collect()
      val tinyParts = partsOf(tinyDf)
      val (tFused, _) = clock {
        Similarity.semDedupExact(base.unionByName(inc))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"$label%-12s $nBase%8d $tBuild%8.2f $tServe%8.2f " +
        f"$partsRead%4d/$allCells%-4d $tFused%8.2f  tiny10=" +
        f"$tinyParts%d/$allCells%d")
    }
    println(s"increment fixed at n=$nInc (the base corpus's % 10 = 3 " +
      "slice) at both scales; tiny10 = partitions a 10-vector batch " +
      "reads (the per-micro-batch streaming probe)")
  }

  /** The sparse-growth twin of [[buildScaled]]: each replica's
    * vectors are circularly SHIFTED by `replica` dimensions (norms
    * and within-replica geometry preserved exactly; cross-replica
    * cosines fall to the random background), written to `outDir`. */
  def buildScaledRolled(spark: SparkSession, baseDir: String,
      outDir: String, factor: Int): Unit = {
    if (new java.io.File(s"$outDir/embeddings.parquet/_SUCCESS").exists())
      return
    new java.io.File(outDir).mkdirs()
    val emb = Tables(spark, baseDir).embeddings
    // derive the dimension from the data: a hardcoded 64 would give
    // replica `dim` a zero roll (identical, not background, vectors)
    // and factor > dim negative slice lengths (ADVICE r12)
    val dim = emb.select(size(col("embedding")).as("d")).head.getInt(0)
    require(factor <= dim,
      s"rolled replicas need factor <= dim ($factor > $dim): replica " +
        "rolls repeat and the sparse-growth premise breaks")
    val span = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val reps = (0 until factor).map { i =>
      val r = i % dim
      emb.withColumn("vec_id", col("vec_id") + lit(i * span))
        .withColumn("embedding",
          concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r)))
    }
    reps.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** Best-of-2 of construction + full materialization (the
    * [[ScaleTrial]] clock — the IVF/PQ tiers run model-sized driver
    * actions during construction). */
  private def time(spark: SparkSession, dir: String,
      fn: (SparkSession, String) => DataFrame): Double = {
    def once: Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once, once)
  }

  /** Idempotent scaled-twin build (embeddings grown, everything else
    * copied — `_SUCCESS` on embeddings is the completion marker). */
  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    if (new java.io.File(s"$outDir/embeddings.parquet/_SUCCESS").exists())
      return
    new java.io.File(outDir).mkdirs()
    // raw byte-for-byte copies (the ScaleTrial nanosAsLong device
    // covers legacy TIMESTAMP(NANOS) events files)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { n =>
      spark.read.parquet(s"$baseDir/$n.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }
    val emb = Tables(spark, baseDir).embeddings
    val span = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val reps = (0 until factor).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * span))
        .withColumn("embedding", transform(col("embedding"),
          (x, idx) => when(idx === 0,
            x + lit(i * 1e-3f)).otherwise(x).cast("float")))
    }
    reps.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
