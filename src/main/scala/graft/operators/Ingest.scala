package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The NIGHTLY-INGEST ADMISSION manifest — the composition a
  * training-data pipeline actually runs on tonight's crawl slice,
  * assembled from the three screens this library ships as separately
  * driver-checked primitives:
  *
  *  1. EXACT screen (q145/q189/q258/q336): is the doc's content
  *     fingerprint already in the base corpus?
  *  2. NEAR-DUP screen (q335/q337): does the doc near-duplicate a
  *     base doc under the portable MinHash bands (min matching base
  *     id — deterministic)?
  *  3. SEMANTIC screen (q327/q330): does the doc's embedding
  *     SemDeDup-collapse onto a base vector under the base-trained
  *     at-rest index (best match, ties to min id)?
  *
  * One row per increment doc: (doc_id, exact_dup, near_dup_of,
  * sem_dup_of, admit) with `admit` = passed all three — the manifest
  * a nightly job writes before packing tonight's batch. The
  * embeddings table is the documents' embedding sidecar keyed
  * `vec_id = doc_id` (the synthetic-corpus convention); docs without
  * a vector simply pass the semantic screen, both engines (LEFT
  * JOIN).
  *
  * The whole composition is HASH-EXACT: each screen's oracle chain
  * was already SQL-replayable, and the q340 oracle stitches the three
  * chains (shared CTE fragments — [[Similarity.semDedupDecisionChain]]
  * and [[Dedup.portableIncCtes]] — so the composition CANNOT drift
  * from its components) into one statement ending in the same
  * three LEFT JOINs.
  *
  * Scale: the three screens share the increment scan; each is
  * individually increment-bounded (broadcast Bloom/fps, inc×base
  * bucket probe, partition-pruned cell scan), so the manifest costs
  * the sum of its screens, never a corpus pass. The at-rest tier
  * ([[nightlyAdmissionAtRest]]) serves all three from durable
  * artifacts — the form a real nightly job runs. */
object Ingest {

  // ONE fingerprint definition for the exact screen — Dedup's own
  // (q145/q258/q336's), not a copy that could drift
  private def contentFpSql = Dedup.contentFpSql
  private def contentFp = Dedup.contentFp

  /** The session-tier composition (screens build their artifacts in
    * the session memo — the q327/q335 forms; the exact screen is the
    * plain fps semi join, the q145 shape). */
  def nightlyAdmission(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, key: String): DataFrame = {
    val baseFps = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
      .select(contentFp.as("fp")).distinct()
    val ex = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
      .select(col("doc_id"), contentFp.as("fp"))
      .join(baseFps, Seq("fp"), "left_semi")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    assemble(docs, ex,
      Dedup.portableIncrementalNearDups(docs),
      Similarity.semDedupIncremental(s, embeddings, key))
  }

  /** The composition as a nightly job actually runs it: ALL THREE
    * screens serve from DURABLE commit-marked artifacts — the exact
    * screen from the q336 Bloom + bucketed-fps screen base (survivors
    * anti-join; the base corpus is never re-fingerprinted), the
    * near-dup screen from the q337 band-bucket base, the semantic
    * screen from the q330 index — so tomorrow's JVM pays
    * increment-sized work only. Same decisions by shared cores /
    * row-identity pins — registered against the same oracle as the
    * session tier (q341 vs q340, the q330 convention). */
  def nightlyAdmissionAtRest(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, nearDir: String, semDir: String,
      screenDir: String): DataFrame = {
    val inc = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
    // the durable screen returns the SURVIVORS (definite-new routed
    // around the shuffle + maybe-branch anti join) — exact dups are
    // the increment minus them (row-identical to the fps semi join,
    // the q258/q336 pin)
    val survivors = Dedup.crossCorpusNewFromDurableArtifact(s,
      inc, docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3),
      screenDir)
    val ex = inc.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"),
        "left_anti")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    assemble(docs, ex,
      Dedup.portableIncrementalNearDupsDurable(s, docs, nearDir),
      Similarity.semDedupIncrementalDurable(s, embeddings, semDir))
  }

  /** DAY-2 of the nightly loop — the r15 MAINTENANCE composition:
    * day-0 bases (doc_id/vec_id % 10 ∉ {3,4}) built durable once,
    * day-1's crawl (% 10 = 4) APPENDED to all three screens as
    * commit-marked deltas ([[Dedup.appendFpsToScreenBase]],
    * [[Dedup.appendToNearDupBase]], [[Similarity.appendToIvfIndex]]),
    * and tonight's increment (% 10 = 3) admitted against
    * (base + delta) — so the 100 TB base is rebuilt only when the
    * staleness gates (q328/q339) fire, never nightly. The exact and
    * near-dup screens are append ≡ rebuild by per-doc determinism
    * (their oracle fragments collapse the union slice); the semantic
    * screen keeps the FROZEN day-0 quantizer — its oracle fragment
    * ([[Similarity.semDedupAppendedChain]]) trains on day-0 and
    * argmin-assigns the union membership, stating the append
    * semantics exactly. */
  def nightlyAdmissionAppended(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, nearDir: String, semDir: String,
      screenDir: String): DataFrame = {
    val base0 =
      docs.filter(!pmod(col("doc_id"), lit(10L)).isin(3L, 4L))
    val day1 = docs.filter(pmod(col("doc_id"), lit(10L)) === 4)
    val inc = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
    // exact screen: ensure day-0 base, append day-1 fps, screen day-2
    Dedup.materializedScreenBaseDurable(s, base0, screenDir)
    Dedup.appendFpsToScreenBase(s, day1, screenDir, "m4")
    val survivors =
      Dedup.crossCorpusNewFromAppendedArtifact(s, inc, base0, screenDir)
    val ex = inc.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    // near-dup screen: ensure day-0 buckets, append day-1 band keys
    Dedup.portableNearDupBaseDurableFrom(s, base0, nearDir)
    Dedup.appendToNearDupBase(s, day1, nearDir, "m4")
    val near = Dedup.portableIncNearDupsAgainstAppendedArtifact(s, inc,
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3), base0, nearDir)
    // semantic screen: frozen-quantizer appended index (ensures +
    // appends internally)
    val sem =
      Similarity.semDedupIncrementalAppended(s, embeddings, semDir)
    assembleFor(inc.select(col("doc_id")), ex, near, sem)
  }

  /** DAY-3 of the nightly loop — the r16 compaction composition: the
    * q342 homes (day-0 base + day-1 delta) FOLDED by the three
    * compactors into fresh durable homes
    * ([[Dedup.compactScreenBase]], [[Dedup.compactNearDupBase]],
    * [[Similarity.compactIvfIndex]] — artifact rows only, the corpus
    * is never re-fingerprinted / re-shingled, the quantizer never
    * retrains), and tonight's increment admitted ENTIRELY from the
    * compacted homes. Registered against q342's oracle VERBATIM (the
    * q341 convention): the driver itself checks that the fold changes
    * no admission decision — compacted ≡ appended, hash-exact. The
    * compactors are params-safe: each reads the source sidecar and
    * refuses mismatched knobs before folding. */
  def nightlyAdmissionCompacted(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, nearDir: String, semDir: String,
      screenDir: String, nearCDir: String, semCDir: String,
      screenCDir: String): DataFrame = {
    val base0 =
      docs.filter(!pmod(col("doc_id"), lit(10L)).isin(3L, 4L))
    val day1 = docs.filter(pmod(col("doc_id"), lit(10L)) === 4)
    val inc = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val eBase0 = e.filter(!pmod(col("vec_id"), lit(10L)).isin(3L, 4L))
    // days 0-2 (idempotent: homes + "m4" deltas are shared with q342)
    Dedup.materializedScreenBaseDurable(s, base0, screenDir)
    Dedup.appendFpsToScreenBase(s, day1, screenDir, "m4")
    Dedup.portableNearDupBaseDurableFrom(s, base0, nearDir)
    Dedup.appendToNearDupBase(s, day1, nearDir, "m4")
    Similarity.ivfExactIndexDurable(s, eBase0, semDir)
    Similarity.appendToIvfIndex(s,
      e.filter(pmod(col("vec_id"), lit(10L)) === 4), semDir, "m4")
    // day-3: fold (base + delta) into the compacted homes
    Dedup.compactScreenBase(s, screenDir, screenCDir)
    Dedup.compactNearDupBase(s, nearDir, nearCDir)
    Similarity.compactIvfIndex(s, semDir, semCDir)
    // serve tonight's increment from the COMPACTED homes only (the
    // base frames are by-name on every path — never evaluated)
    val survivors = Dedup.crossCorpusNewFromAppendedArtifact(s, inc,
      base0, screenCDir)
    val ex = inc.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    val near = Dedup.portableIncNearDupsAgainstAppendedArtifact(s, inc,
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3), base0,
      nearCDir)
    val sem = Similarity.semDedupAgainstAppendedIndex(s,
      e.filter(pmod(col("vec_id"), lit(10L)) === 3), eBase0, semCDir)
    assembleFor(inc.select(col("doc_id")), ex, near, sem)
  }

  /** The manifest with the MEDIA screens composed in (the r15
    * verdict's #3): the q342 text screens PLUS per-kind media
    * fingerprint membership (image aHash / audio chunked-RMS / video
    * frame-sequence) against the durable media artifact — day-0 media
    * decoded once into the base artifact, day-1 appended as a
    * commit-marked delta, tonight's increment decoded once and probed
    * against at-rest 8-byte fingerprints (zero base decode, media
    * bytes never shuffle). One row per increment doc:
    * (doc_id, exact_dup, near_dup_of, sem_dup_of, media_dup_of,
    * admit) with admit now requiring ALL FOUR screens clean.
    * Rows-only BY DESIGN (codec family); the text columns equal
    * q342's verbatim, the media column equals the screen recomputed,
    * and artifact ≡ inline per media tier — all spec-pinned
    * (IngestSpec component-agreement rows). Per-doc independent on
    * every screen, so micro-batched serving unions to this manifest
    * by construction. */
  def nightlyAdmissionWithMedia(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, nearDir: String, semDir: String,
      screenDir: String, mediaDir: String): DataFrame = {
    import graft.multimodal.Multimodal
    val manifest = nightlyAdmissionAppended(s, docs, embeddings,
      nearDir, semDir, screenDir)
    val md = Multimodal.mediaFingerprintArtifact(s,
      Multimodal.syntheticMediaFrom(
        docs.filter(!pmod(col("doc_id"), lit(10L)).isin(3L, 4L))),
      mediaDir)
    Multimodal.appendToMediaFingerprintArtifact(s,
      Multimodal.syntheticMediaFrom(
        docs.filter(pmod(col("doc_id"), lit(10L)) === 4)), md, "m4")
    val hits = Multimodal.mediaAdmissionScreen(s,
      Multimodal.syntheticMediaFrom(
        docs.filter(pmod(col("doc_id"), lit(10L)) === 3)), md)
    manifest
      .join(hits.withColumnRenamed("media_id", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup"), col("near_dup_of"),
        col("sem_dup_of"), col("media_dup_of"),
        (col("admit") && col("media_dup_of").isNull).as("admit"))
      .orderBy(col("doc_id"))
  }

  /** The DELTA-PRESSURE card — q328/q339's staleness-gate discipline
    * applied to the DELTA dimension: one row per screen artifact with
    * its committed delta count, base rows, delta rows and the
    * serve-side union width (rows every nightly serve must union).
    * The compaction trigger reads THIS card: when n_deltas (or the
    * delta/base row ratio) outgrows what serving should pay while the
    * q328/q339 health gates still say the banding/quantizer is fine,
    * fold ([[nightlyAdmissionCompacted]]'s day-3); when the gates
    * fire, rebuild. HASH-EXACT: every count is a corpus-derivable
    * fact (fps are per-doc deterministic, band keys are bands×docs,
    * index rows are one per vector), so the oracle restates each from
    * the tables. Reads artifact metadata + artifact-mass counts only —
    * never corpus text. */
  def deltaPressureCard(s: SparkSession, docs: DataFrame,
      embeddings: DataFrame, nearDir: String, semDir: String,
      screenDir: String): DataFrame = {
    val base0 =
      docs.filter(!pmod(col("doc_id"), lit(10L)).isin(3L, 4L))
    val day1 = docs.filter(pmod(col("doc_id"), lit(10L)) === 4)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    // ensure the q342 homes + day-1 deltas (idempotent, shared)
    Dedup.materializedScreenBaseDurable(s, base0, screenDir)
    Dedup.appendFpsToScreenBase(s, day1, screenDir, "m4")
    Dedup.portableNearDupBaseDurableFrom(s, base0, nearDir)
    Dedup.appendToNearDupBase(s, day1, nearDir, "m4")
    Similarity.ivfExactIndexDurable(s,
      e.filter(!pmod(col("vec_id"), lit(10L)).isin(3L, 4L)), semDir)
    Similarity.appendToIvfIndex(s,
      e.filter(pmod(col("vec_id"), lit(10L)) === 4), semDir, "m4")
    def card(family: String, home: String, sub: String)
        : (String, Long, Long, Long) = {
      val canon = graft.Artifacts.canonical(home)
      val deltas = graft.Artifacts.committedDeltas(canon)
      val baseRows = s.read.parquet(s"$canon/$sub").count()
      val deltaRows = deltas
        .map(dd => s.read.parquet(s"$dd/$sub").count()).sum
      (family, deltas.size.toLong, baseRows, deltaRows)
    }
    import s.implicits._
    Seq(card("ivfx", semDir, "t"),
      card("neardup", nearDir, "buckets"),
      card("screen", screenDir, "fps"))
      .toDF("family", "n_deltas", "base_rows", "delta_rows")
      .withColumn("serve_rows", col("base_rows") + col("delta_rows"))
      .orderBy(col("family"))
  }

  /** Per-micro-batch admission over an ARBITRARY crawl-record frame
    * (doc_id, text, lang, source, embedding) — every screen serves
    * from its durable artifact, and per-doc decisions are independent
    * (no screen ever pairs increment docs with each other), so
    * micro-batched serving unions to the batch manifest by
    * construction (spec-pinned stream == q341). Also usable directly
    * for ad-hoc "would this batch be admitted?" probes. */
  def admitBatch(s: SparkSession, records: DataFrame,
      baseDocs: => DataFrame, baseEmb: => DataFrame, nearDir: String,
      semDir: String, screenDir: String): DataFrame = {
    val incDocs = records.select(col("doc_id"), col("text"),
      col("lang"), col("source"))
    val incVecs = records.filter(col("embedding").isNotNull)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val survivors = Dedup.crossCorpusNewFromDurableArtifact(s,
      incDocs, baseDocs, screenDir)
    val ex = incDocs.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    assembleFor(incDocs.select(col("doc_id")), ex,
      Dedup.portableIncNearDupsAgainstArtifact(s, incDocs, baseDocs,
        nearDir),
      Similarity.semDedupAgainstIndexDurable(s, incVecs, baseEmb,
        semDir))
  }

  /** The admission manifest run CONTINUOUSLY — a crawl-record stream
    * (doc_id, text, lang, source, embedding) admitted per micro-batch
    * against the three static durable artifacts, into idempotent
    * per-batch parquet (the q83/q145 stream-twin convention:
    * [[admitBatch]] IS the batch transform, so stream == batch by
    * construction; StreamingSpec pins the union of batches against
    * the q341 manifest). Stateless — the artifacts are the static
    * side Spark re-plans per batch. */
  def nightlyAdmissionStream(s: SparkSession, crawlStream: DataFrame,
      baseDocs: DataFrame, baseEmb: DataFrame, nearDir: String,
      semDir: String, screenDir: String, path: String,
      checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    crawlStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        graft.streaming.StreamingOps.writeBatchIdempotent(
          admitBatch(s, batch, baseDocs, baseEmb, nearDir, semDir,
            screenDir),
          batchId, path))

  /** The admission stream run as a NIGHTLY DRAIN —
    * `Trigger.AvailableNow`: one invocation admits every crawl record
    * available at start, in checkpointed micro-batches, then STOPS —
    * the reference's `catchup=False` daily semantics
    * (`dags/airflow_dag.py:27-29`) on the streaming engine: tonight's
    * run processes tonight's backlog exactly once and exits; a
    * crashed run resumes from the checkpoint, and a REPLAYED batch
    * (same batchId) overwrites its own directory idempotently, so
    * delivery to the manifest is effectively-once (both spec-pinned
    * in StreamingSpec). */
  def nightlyAdmissionDrain(s: SparkSession, crawlStream: DataFrame,
      baseDocs: DataFrame, baseEmb: DataFrame, nearDir: String,
      semDir: String, screenDir: String, path: String,
      checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    nightlyAdmissionStream(s, crawlStream, baseDocs, baseEmb, nearDir,
      semDir, screenDir, path, checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())

  private def assemble(docs: DataFrame, exactHits: DataFrame,
      nearPairs: DataFrame, semDecision: DataFrame): DataFrame =
    assembleFor(
      docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
        .select(col("doc_id")),
      exactHits, nearPairs, semDecision)

  private def assembleFor(incIds: DataFrame, exactHits: DataFrame,
      nearPairs: DataFrame, semDecision: DataFrame): DataFrame = {
    val inc = incIds
    val ex = exactHits
    val near = nearPairs
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("base_id")).as("near_dup_of"))
    val sem = semDecision
      .select(col("vec_id").as("doc_id"), col("dup_of").as("sem_dup_of"))
    inc
      .join(ex, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_hit"), lit(false)).as("exact_dup"),
        col("near_dup_of"), col("sem_dup_of"),
        (coalesce(col("exact_hit"), lit(false)) === false &&
          col("near_dup_of").isNull && col("sem_dup_of").isNull)
          .as("admit"))
      .orderBy(col("doc_id"))
  }

  /** q340's DuckDB twin: the semantic decision chain + the portable
    * near-dup chain (both SHARED fragments — the components' own
    * oracles use the same text) + the fingerprint screen, stitched by
    * three LEFT JOINs. Concatenation, not an outer stripMargin (the
    * fragments strip their own margins). */
  private def admissionOracle: String =
    s"WITH ${Similarity.semDedupDecisionChain(8, 2, 0.35)},\n" +
      s"${Dedup.portableIncCtes},\n" + admissionTail

  /** q342's DuckDB twin — the SAME stitched statement with ONE
    * substitution: the semantic fragment is the frozen-quantizer
    * appended chain (train day-0 % 10 ∉ {3,4}, assign the union
    * % 10 <> 3) instead of the union-trained chain. The exact and
    * near-dup fragments are append-invariant (per-doc fingerprints /
    * band keys — the union collapses), so they stay VERBATIM. */
  private def admissionAppendedOracle: String =
    s"WITH ${Similarity.semDedupAppendedChain(8, 2, 0.35,
        "vec_id % 10 NOT IN (3, 4)", "vec_id % 10 <> 3")},\n" +
      s"${Dedup.portableIncCtes},\n" + admissionTail

  /** The stitch shared by q340/q341/q342: near-dup caps + candidate
    * join + verify, the fingerprint screen, and the three LEFT JOINs
    * into the per-doc manifest. */
  private def admissionTail: String =
    s"""ok_i AS (
         |  SELECT band, bh FROM b WHERE is_inc GROUP BY band, bh
         |  HAVING count(*) <= 10000),
         |ok_b AS (
         |  SELECT band, bh FROM b WHERE NOT is_inc GROUP BY band, bh
         |  HAVING count(*) <= 10000),
         |ki AS (
         |  SELECT bb.doc_id, bb.band, bb.bh
         |  FROM b bb JOIN ok_i USING (band, bh) WHERE bb.is_inc),
         |kb AS (
         |  SELECT bb.doc_id, bb.band, bb.bh
         |  FROM b bb JOIN ok_b USING (band, bh) WHERE NOT bb.is_inc),
         |ncand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS base_id
         |  FROM ki x JOIN kb y
         |    ON x.band = y.band AND x.bh = y.bh),
         |nj AS (
         |  SELECT new_id, base_id,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM ncand
         |  JOIN docs x ON x.doc_id = ncand.new_id
         |  JOIN docs y ON y.doc_id = ncand.base_id),
         |near AS (
         |  SELECT new_id, min(base_id) AS near_dup_of
         |  FROM nj WHERE jaccard >= 0.5 GROUP BY new_id),
         |bfp AS (
         |  SELECT DISTINCT $contentFpSql AS fp
         |  FROM documents WHERE doc_id % 10 <> 3),
         |ifp AS (
         |  SELECT doc_id, $contentFpSql AS fp
         |  FROM documents WHERE doc_id % 10 = 3),
         |ex AS (
         |  SELECT DISTINCT ifp.doc_id FROM ifp JOIN bfp USING (fp)),
         |di AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 10 = 3)
         |SELECT di.doc_id,
         |  ex.doc_id IS NOT NULL AS exact_dup,
         |  near.near_dup_of,
         |  best.base_id AS sem_dup_of,
         |  (ex.doc_id IS NULL AND near.near_dup_of IS NULL
         |    AND best.base_id IS NULL) AS admit
         |FROM di
         |LEFT JOIN ex ON ex.doc_id = di.doc_id
         |LEFT JOIN near ON near.new_id = di.doc_id
         |LEFT JOIN best ON best.vec_id = di.doc_id
         |ORDER BY di.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q340_nightly_admission" -> ((s, d) =>
      nightlyAdmission(s, Tables(s, d).documents,
        Tables(s, d).embeddings, key = d)),
    // the at-rest form — durable artifacts for both the near-dup base
    // and the semantic index; registered against the SAME oracle so
    // the driver checks the cross-job serving path changes nothing
    // screen home prefixed "screen10": the %10-split base is a
    // DIFFERENT input than q336's %2-split screen — same knobs,
    // different data must never share a durable dir (the params
    // sidecar can't tell frames apart; the dir scheme must)
    "q341_nightly_admission_atrest" -> ((s, d) =>
      nightlyAdmissionAtRest(s, Tables(s, d).documents,
        Tables(s, d).embeddings,
        Dedup.docsDurableDir("pndbase", d),
        Similarity.ivfExactDurableDir(d),
        Dedup.docsDurableDir("screen10", d))),
    // DAY-2 of the loop (r15): every screen serves from (day-0 base
    // artifact + day-1 commit-marked delta). Homes SHARED with the
    // per-screen maintenance tiers (q343/q344/q345) — one build + one
    // append serve all four queries, the production amortization
    "q342_nightly_admission_appended" -> ((s, d) =>
      nightlyAdmissionAppended(s, Tables(s, d).documents,
        Tables(s, d).embeddings,
        Dedup.docsDurableDir("pnd9", d),
        Similarity.ivfExactAppendDurableDir(d),
        Dedup.docsDurableDir("screen9", d))),
    // DAY-3 of the loop (r16): the q342 homes folded by the three
    // params-safe compactors into fresh homes, tonight's increment
    // admitted ENTIRELY from the compacted artifacts. Same oracle as
    // q342 VERBATIM — the driver checks the fold changes nothing
    "q348_nightly_admission_compacted" -> ((s, d) =>
      nightlyAdmissionCompacted(s, Tables(s, d).documents,
        Tables(s, d).embeddings,
        Dedup.docsDurableDir("pnd9", d),
        Similarity.ivfExactAppendDurableDir(d),
        Dedup.docsDurableDir("screen9", d),
        Dedup.docsDurableDir("pnd9c", d),
        Similarity.ivfExactCompactDurableDir(d),
        Dedup.docsDurableDir("screen9c", d))),
    // the FULL manifest (r16): all three text screens + the three
    // media fingerprint screens as admission columns. Rows-only BY
    // DESIGN (codec family — javax.imageio/PCM bytes aren't SQL);
    // its text columns ride q342's oracle and its media column is
    // spec-pinned artifact ≡ inline (IngestSpec)
    "q350_nightly_admission_media" -> ((s, d) =>
      nightlyAdmissionWithMedia(s, Tables(s, d).documents,
        Tables(s, d).embeddings,
        Dedup.docsDurableDir("pnd9", d),
        Similarity.ivfExactAppendDurableDir(d),
        Dedup.docsDurableDir("screen9", d),
        graft.multimodal.Multimodal.mediaFp9DurableDir(d))),
    // the compaction TRIGGER's input: delta count + row pressure per
    // screen artifact (hash-exact — every count is corpus-derivable)
    "q349_delta_pressure" -> ((s, d) =>
      deltaPressureCard(s, Tables(s, d).documents,
        Tables(s, d).embeddings,
        Dedup.docsDurableDir("pnd9", d),
        Similarity.ivfExactAppendDurableDir(d),
        Dedup.docsDurableDir("screen9", d))),
    // the nightly job's BOOKKEEPING: one row per artifact home under
    // the lake root — family, params, committed, size, delta count,
    // and fingerprint LIVENESS against this dataset's tables (a
    // regenerated input's predecessors show live=false: gcArtifacts
    // food). Rows-only BY DESIGN: the inventory describes whatever
    // artifact population earlier jobs left in the shared root — not
    // a corpus fact SQL could restate. A 1-row sentinel artifact is
    // ensured first so the inventory is never vacuously empty
    "q346_artifact_inventory" -> ((s, d) => {
      graft.Artifacts.durable(s,
        graft.Artifacts.durableDirFor("invsent", d,
          "documents.parquet"), "sentinel|v1") { dd =>
        s.range(1).write.mode("overwrite").parquet(s"$dd/t")
      }
      graft.Artifacts.inventory(s, graft.Artifacts.durableRoot,
        Seq((d, "documents.parquet"), (d, "embeddings.parquet")))
    })
  )

  /** q349's DuckDB twin: every pressure number restated from the
    * corpus — fps are per-doc deterministic (count distinct), band
    * keys are bands×docs, index rows are one per vector; n_deltas is
    * 1 by the chain's construction (one "m4" delta per home). */
  private def deltaPressureOracle: String = {
    val (bands, _) = Dedup.lshBandChoice(16, 0.3, 0.7)
    s"""SELECT family, n_deltas, base_rows, delta_rows,
       |  base_rows + delta_rows AS serve_rows
       |FROM (
       |  SELECT 'ivfx' AS family, CAST(1 AS BIGINT) AS n_deltas,
       |    (SELECT count(*) FROM embeddings
       |      WHERE vec_id % 10 NOT IN (3, 4)) AS base_rows,
       |    (SELECT count(*) FROM embeddings
       |      WHERE vec_id % 10 = 4) AS delta_rows
       |  UNION ALL
       |  SELECT 'neardup', CAST(1 AS BIGINT),
       |    $bands * (SELECT count(*) FROM documents
       |      WHERE doc_id % 10 NOT IN (3, 4)),
       |    $bands * (SELECT count(*) FROM documents
       |      WHERE doc_id % 10 = 4)
       |  UNION ALL
       |  SELECT 'screen', CAST(1 AS BIGINT),
       |    (SELECT count(DISTINCT $contentFpSql) FROM documents
       |      WHERE doc_id % 10 NOT IN (3, 4)),
       |    (SELECT count(DISTINCT $contentFpSql) FROM documents
       |      WHERE doc_id % 10 = 4)
       |)
       |ORDER BY family""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q340_nightly_admission" -> admissionOracle,
    "q341_nightly_admission_atrest" -> admissionOracle,
    "q342_nightly_admission_appended" -> admissionAppendedOracle,
    "q348_nightly_admission_compacted" -> admissionAppendedOracle,
    "q349_delta_pressure" -> deltaPressureOracle
  )
}
