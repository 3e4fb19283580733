package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Probabilistic sketches for O(1)-memory aggregate summaries — the
  * complement to TextAnalysis.corpusCardinalitySketch (HLL++). A
  * count-min sketch answers frequency queries over a key space too
  * large to hold exactly: d hash rows × w counters, estimate = min
  * over rows, with the classic one-sided guarantee
  * `exact <= est <= exact + 2N/w` (w.h.p., Cormode & Muthukrishnan
  * 2005). Heavy hitters then fall out of scanning candidates against
  * the sketch.
  *
  * Scale notes: the sketch build is one groupBy over (depth, bucket)
  * — d·w counters regardless of input size, so the "sketch" side of
  * any later join always broadcasts. Nothing here is driver-side: the
  * sketch is a DataFrame, built and probed with joins, unlike
  * `DataFrame.stat.countMinSketch` which collects to the driver.
  */
object Sketches {

  /** Build a CMS as a (depth, bucket, cnt) DataFrame: each input row
    * increments one bucket per depth, hashed with xxhash64 under a
    * per-depth seed (the seed column participates in the hash, giving
    * d independent functions). */
  def cmsSketch(df: DataFrame, key: String, depth: Int, width: Int): DataFrame =
    df.select(col(key).as("k"),
      explode(array((0 until depth).map(lit): _*)).as("depth"))
      .select(col("depth"),
        pmod(xxhash64(col("depth"), col("k")), lit(width)).as("bucket"))
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate frequencies for `keys` (one column named `k`):
    * hash each key the same d ways, look up the counters, take the
    * min. The sketch side is d·w rows — broadcast it. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, depth: Int,
      width: Int): DataFrame =
    keys.select(col("k"),
      explode(array((0 until depth).map(lit): _*)).as("depth"))
      .select(col("k"), col("depth"),
        pmod(xxhash64(col("depth"), col("k")), lit(width)).as("bucket"))
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Join-size (inner-product) estimate from two sketches built with
    * the same (depth, width): per depth Σ_b cntA·cntB, min across
    * depths — the sketch-only answer to "how big would this equi-join
    * be" when neither side's per-key counts fit anywhere (classic
    * a·b estimate, Cormode & Muthukrishnan 2005 §4.2; one-sided:
    * exact ≤ est ≤ exact + 2·Na·Nb/w w.h.p.). Two d·w-row frames
    * join — nothing data-sized. [[ScalePatterns.joinSizeProfile]] is
    * the exact counterpart SketchesSpec bounds this against. */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("depth"), col("bucket"), col("cnt").as("ca"))
      // LEFT join + coalesce-to-0, like cmsEstimate: a depth whose
      // buckets never collide must contribute dot = 0 (an inner join
      // would DROP that depth, inflating the min — and returning an
      // empty frame when no depth collides at all)
      .join(b.select(col("depth"), col("bucket"), col("cnt").as("cb")),
        Seq("depth", "bucket"), "left")
      .groupBy(col("depth"))
      .agg(sum(col("ca") * coalesce(col("cb"), lit(0L))).as("dot"))
      .agg(min(col("dot")).as("est_join_rows"))

  val Depth = 4
  val Width = 512

  /** q98: top-20 heavy-hitter users by CMS-estimated event count.
    * Rows-only (the estimates depend on xxhash64 bucketing, which no
    * SQL oracle reproduces); SketchesSpec pins the CMS guarantees
    * against exact counts. */
  def cmsHeavyHitters(t: Tables): DataFrame = {
    val events = t.events
    val sketch = cmsSketch(events, "user_id", Depth, Width)
    val candidates = events.select(col("user_id").as("k")).distinct()
    cmsEstimate(sketch, candidates, Depth, Width)
      .orderBy(col("est").desc, col("k"))
      .limit(20)
      .select(col("k").as("user_id"), col("est"))
  }

  /** q100: approximate quantiles via percentile_approx (Greenwald-
    * Khanna sketch; mergeable, bounded memory — the 100 TB answer
    * when Describe.exactQuantiles' domain-sized counts pass is too
    * expensive). Rows-only: the sketch's picked values are
    * engine-specific; SketchesSpec bounds the rank error against the
    * exact quantile machinery. */
  def approxQuantiles(t: Tables): DataFrame =
    t.lineitem.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)),
          lit(10000)).as("qs"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        element_at(col("qs"), 1).as("p25"),
        element_at(col("qs"), 2).as("p50"),
        element_at(col("qs"), 3).as("p75"),
        element_at(col("qs"), 4).as("p90"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_cms_heavy_hitters" -> ((s, d) => cmsHeavyHitters(Tables(s, d))),
    "q100_approx_quantiles" -> ((s, d) => approxQuantiles(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map.empty
}
