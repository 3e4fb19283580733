package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level hygiene over `SparkEntry.queries`/`oracleSql` — the
  * contracts the driver's correctness gate ASSUMES but can only
  * surface as opaque failures after the fact:
  *
  *  1. every oracle key names a registered query (a typo'd key would
  *     silently demote its query to rows-only);
  *  2. the rows-only remainder (queries minus oracles) is EXACTLY the
  *     declared design set from SURVEY §8 — a new query that forgets
  *     its oracle fails HERE with its name, before the driver's gate
  *     quietly counts one more `no_oracle` row;
  *  3. no oracle SQL line begins with `|` — the stripMargin hazard
  *     (an outer template's stripMargin eats through an interpolated
  *     line that starts with the SQL `||` concat operator, leaving a
  *     bare `|` binder error; bit us in the q320 refactor and again
  *     in q325's first slice CTE). Generated SQL must keep operators
  *     at line END.
  */
class OracleRegistrySpec extends AnyFunSuite {

  /** SURVEY §8's declared rows-only set (35): ANN recall tiers,
    * engine-specific k-means / xxhash / media-codec / zlib / sketch
    * / float-GD / jump-LCG production tiers — every one now paired
    * with a hash-exact twin where the semantics are replayable at
    * all. The four r14 `*_atrest` media tiers are codec-family
    * members served from the durable fingerprint artifact
    * (artifact ≡ inline pinned bit-for-bit in MultimodalSpec).
    * Additions to this list are DESIGN DECISIONS: update SURVEY §8
    * in the same commit. */
  private val declaredRowsOnly = Set(
    // q346 (r15) describes whatever artifact population earlier jobs
    // left in the shared lake root — operational state, not a corpus
    // fact SQL could restate; the GC/liveness semantics are pinned by
    // ArtifactMaintenanceSpec instead
    "q346_artifact_inventory",
    // q347 (r15) is the media family's maintenance tier — rows-only
    // like the whole codec family; appended ≡ rebuilt ≡ inline
    // spec-pinned in ArtifactMaintenanceSpec
    "q347_image_dedup_appended",
    // q350 (r16) composes the media screens into the admission
    // manifest — rows-only like the whole codec family; its text
    // columns ride q342's oracle verbatim and its media column is
    // pinned artifact ≡ inline + component-agreement in IngestSpec
    "q350_nightly_admission_media",
    "q331_image_dedup_atrest", "q332_image_phash_atrest",
    "q333_audio_dedup_atrest", "q334_video_dedup_atrest",
    "q28_minhash_dedup", "q29_simhash_dedup", "q33_ann_rp_lsh",
    "q34_ann_ivf", "q44_multimodal_features", "q45_video_frame_sample",
    "q56_multimodal_batched_decode", "q82_dup_clusters",
    "q98_cms_heavy_hitters", "q131_curation_neardup",
    "q137_audio_windows", "q147_image_dedup",
    "q148_quality_classifier", "q155_incremental_neardups",
    "q160_pq_codes", "q161_pq_adc_topk", "q176_semdedup",
    "q186_scene_changes", "q188_column_stats_approx",
    "q193_classifier_sampled", "q194_incremental_neardups_mat",
    "q195_audio_dedup", "q196_best_of_cluster_lsh",
    "q205_ivf_materialized", "q241_jump_reshard",
    "q264_image_phash_dedup", "q266_video_dedup",
    "q281_compression_ratio", "q302_ivfpq_topk", "q310_leakage_lsh",
    "q311_ivfpq_served")

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle keys with no registered query: ${orphans.toSeq.sorted}")
  }

  test("rows-only remainder == the declared design set (SURVEY §8)") {
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = actual -- declaredRowsOnly
    val stale = declaredRowsOnly -- actual
    assert(undeclared.isEmpty,
      s"queries missing an oracle but NOT declared rows-only: " +
        s"${undeclared.toSeq.sorted} — add the oracle or declare the " +
        "design decision here AND in SURVEY §8")
    assert(stale.isEmpty,
      s"declared rows-only but now carrying an oracle (stale list): " +
        s"${stale.toSeq.sorted}")
  }

  test("no oracle SQL line begins with a SINGLE '|' (stripMargin " +
      "mangling signature)") {
    // A line starting with `||` is a legal SQL concat continuation
    // (q315 has them — single-template oracles keep them intact).
    // The mangling signature is a line starting with ONE `|`: an
    // outer stripMargin treated the first pipe of an interpolated
    // `||` as its margin delimiter and ate it, leaving a bitwise-or
    // binder error. Caught live in q325's first slice CTE.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      sql.linesIterator.zipWithIndex.foreach { case (line, i) =>
        val t = line.trim
        assert(!(t.startsWith("|") && !t.startsWith("||")),
          s"$name oracle line ${i + 1} starts with a single '|' — an " +
            s"outer stripMargin has eaten into an interpolated '||' " +
            s"(keep SQL operators at line end in generated CTEs): $line")
      }
    }
  }

  test("registry and oracle keys all match the qN_name convention") {
    val bad = (SparkEntry.queries.keySet ++ SparkEntry.oracleSql.keySet)
      .filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: ${bad.toSeq.sorted}")
  }
}
