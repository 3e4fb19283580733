package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY.md north-star).
  *
  * Images are REAL end-to-end: fixtures are genuine PNGs written with
  * the JDK's ImageIO, and decode / feature-pooling / resize run
  * `javax.imageio` over the bytes (see [[ImageCodec]]). Audio/video
  * remain deterministic hash-derived stand-ins ([[hashFeature]]) — the
  * JDK ships no general audio/video codec — behind the same column
  * shapes, so swapping in an ffmpeg-style library changes only the
  * per-batch kernel.
  *
  * Codec work is the one place a Scala UDF beats a Catalyst
  * expression: the kernel is an opaque library call on a local byte
  * array, with nothing for codegen to fuse. The UDFs stay inside
  * narrow projections, so the plans remain shuffle-free.
  *
  * At 100 TB: media bytes stay out of shuffles (decode/feature steps
  * are narrow map-side projections; only the small feature vectors and
  * metadata move), and batch size is governed by
  * `spark.sql.files.maxPartitionBytes` on the media table scan.
  * Corrupt media decode to NULL features (filterable), never task
  * failures — at corpus scale some bytes are always garbage.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  val featureDim = 16

  private val imageBytesUdf =
    udf((id: Long, w: Int, h: Int) => ImageCodec.encodeFixturePng(w, h, id))

  private val imageFeatureUdf =
    udf((b: Array[Byte]) =>
      ImageCodec.featureFromBytes(b, featureDim).map(_.toSeq))

  /** Build a deterministic media table from the documents corpus —
    * gives every downstream operator a real `binary` column to
    * exercise. Image rows carry REAL PNG bytes (tiny, 4..16 px a
    * side, pixels a pure function of doc_id — [[ImageCodec
    * .fixturePixel]]); audio/video rows reuse the text bytes as
    * opaque payloads. meta.width/height are the actual PNG dimensions
    * by construction (same columns feed the encoder). */
  def syntheticMedia(t: Tables): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val iw = (pmod(col("doc_id"), lit(13)) + 4).cast("int")
    val ih = (pmod(col("doc_id"), lit(11)) + 4).cast("int")
    t.documents.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      when(kind === "image", imageBytesUdf(col("doc_id"), iw, ih))
        .otherwise(encode(col("text"), "UTF-8")).as("bytes"),
      struct(
        when(kind === "image", iw)
          .otherwise((pmod(xxhash64(col("text")), lit(1024)) + 16)
            .cast("int")).as("width"),
        when(kind === "image", ih)
          .otherwise((pmod(xxhash64(col("text"), lit(1)), lit(768)) + 16)
            .cast("int")).as("height"),
        when(kind === "image", lit(null).cast("long"))
          .otherwise(pmod(xxhash64(col("text"), lit(2)), lit(60000)) + 1000)
          .as("duration_ms")).as("meta"))
  }

  /** Deterministic hash-derived feature for kinds the JDK cannot
    * decode (audio/video): "pixels" derived from byte content so
    * tests have stable values. Swap for a real codec kernel inside
    * the same column shape. Returns array<float> of length `dim`. */
  def hashFeature(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bytes, i), lit(256)) / 255.0).cast("float"))

  /** Feature extraction: decode -> pooled feature vector + content
    * hash. Images go through the real ImageIO decode (mean RGB +
    * luminance stripes, [[ImageCodec.pooledFeature]]); non-image
    * kinds through [[hashFeature]]. Narrow projection; media bytes
    * never shuffle. */
  def extractFeatures(media: DataFrame, dim: Int = featureDim): DataFrame = {
    require(dim == featureDim,
      s"image decode pools to featureDim=$featureDim (UDF is dim-fixed)")
    media.select(
      col("media_id"), col("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      length(col("bytes")).as("n_bytes"),
      sha2(col("bytes"), 256).as("content_sha256"),
      when(col("kind") === "image", imageFeatureUdf(col("bytes")))
        .otherwise(hashFeature(col("bytes"), dim)).as("feature"))
  }

  private def resizeUdf(maxSide: Int) =
    udf((b: Array[Byte]) => ImageCodec.resize(b, maxSide))

  /** Real resize, kind=image only: ImageIO decode -> scale longest
    * side down to `maxSide` -> re-encode PNG. Undecodable bytes yield
    * NULL dims/bytes. Narrow map-side projection. */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), resizeUdf(maxSide)(col("bytes")).as("r"))
      .select(col("media_id"),
        col("r._2").as("new_width"),
        col("r._3").as("new_height"),
        col("r._1").as("bytes"))

  /** Frame sampling for video: one row per sampled frame index —
    * the explode shape a real frame extractor plugs into. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms"),
          lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_sha",
        sha2(concat(col("media_id").cast("string"), lit(":"),
          col("frame_ts_ms").cast("string")), 256))

  /** Per-partition BATCHED decode — the Scala analog of a Python
    * `mapInPandas` decode UDF: rows stream through in groups of
    * `batchSize` so a real codec can amortize model/codec setup per
    * batch (exactly the shape a GPU feature extractor needs). Images
    * decode for real via ImageIO; other kinds use the hash stand-in.
    * Undecodable image bytes produce a NULL feature row. */
  def decodeBatched(media: DataFrame, dim: Int = featureDim,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // Per-batch codec/model init slot: a real extractor loads
          // its model ONCE here; ImageIO's readers are stateless
          // statics, so images need no per-batch setup.
          batch.map { case (id, kind, bytes) =>
            val feat: Array[Float] =
              if (kind == "image")
                ImageCodec.featureFromBytes(bytes, dim).orNull
              else
                Array.tabulate(dim) { i =>
                  // same stand-in as hashFeature: hash-derived "pixels"
                  val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
                    .hashUnsafeBytes(bytes,
                      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                      bytes.length, i)
                  (Math.floorMod(h, 256) / 255.0f)
                }
            (id, Option(feat))
          }
        }
      }.toDF("media_id", "feature")
  }

  /** Serialize an array<float> column to a canonical CSV string —
    * the external harness sorts result rows, so every registered
    * query's output columns must be scalar. */
  private def featureCsv(c: Column): Column =
    array_join(c.cast("array<string>"), ",")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_multimodal_features" -> ((s, d) =>
      extractFeatures(syntheticMedia(Tables(s, d)))
        .withColumn("feature", featureCsv(col("feature")))
        .orderBy("media_id")),
    "q45_video_frame_sample" -> ((s, d) =>
      sampleFrames(syntheticMedia(Tables(s, d)))
        .orderBy("media_id", "frame_ts_ms")),
    "q56_multimodal_batched_decode" -> ((s, d) =>
      decodeBatched(syntheticMedia(Tables(s, d)))
        .withColumn("feature", featureCsv(col("feature")))
        .orderBy("media_id"))
  )

  val oracleSql: Map[String, String] = Map()
}
