package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY.md north-star).
  *
  * The Spark-side architecture is the real deliverable here — schema,
  * partition-friendly batch shapes, and per-partition decode hooks —
  * while the actual codec work is STUBBED with a deterministic fake
  * (this container has no image/audio libraries). The stub boundary is
  * `decodeStub`: swap its body for an OpenCV/ffmpeg call inside the
  * same `transform`/`mapPartitions` shape and nothing else changes.
  *
  * At 100 TB: media bytes stay out of shuffles (decode/feature steps
  * are narrow map-side projections; only the small feature vectors and
  * metadata move), and batch size is governed by
  * `spark.sql.files.maxPartitionBytes` on the media table scan.
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

  /** Build a deterministic media table from the documents corpus
    * (text bytes stand in for media payloads) — gives every
    * downstream operator a real `binary` column to exercise. */
  def syntheticMedia(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(xxhash64(col("text")), lit(1024)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(768)) + 16).cast("int")
          .as("height"),
        (pmod(xxhash64(col("text"), lit(2)), lit(60000)) + 1000)
          .as("duration_ms")).as("meta"))

  /** ??? STUB: the real implementation decodes `bytes` with a codec
    * library inside this exact column shape. The deterministic fake
    * derives "pixels" from the byte content so tests have stable
    * values. Returns array<float> of length `dim`. */
  def decodeStub(bytes: org.apache.spark.sql.Column, dim: Int)
      : org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(bytes, i), lit(256)).cast("float") / 255.0f)

  /** Feature extraction: decode -> pooled feature vector + content
    * hash. Narrow projection; media bytes never shuffle. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      length(col("bytes")).as("n_bytes"),
      sha2(col("bytes"), 256).as("content_sha256"),
      decodeStub(col("bytes"), dim).as("feature"))

  /** "Resize": a pure metadata + re-decode transform, kind=image only. */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("meta.width"), col("meta.height"))
        .cast("double"),
      lit(1.0))
    media.filter(col("kind") === "image")
      .select(col("media_id"),
        (col("meta.width") * scale).cast("int").as("new_width"),
        (col("meta.height") * scale).cast("int").as("new_height"),
        col("bytes"))
  }

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
    * batch (exactly the shape a GPU feature extractor needs). The
    * decode itself is the same deterministic stub. */
  def decodeBatched(media: DataFrame, dim: Int = 16, batchSize: Int = 64)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // REAL IMPLEMENTATION: load codec/model ONCE per batch here.
          batch.map { case (id, bytes) =>
            val feat = Array.tabulate(dim) { i =>
              // same fake as decodeStub: hash-derived "pixels"
              val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
                .hashUnsafeBytes(bytes,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                  bytes.length, i)
              (Math.floorMod(h, 256) / 255.0f)
            }
            (id, feat)
          }
        }
      }.toDF("media_id", "feature")
    out
  }

  /** Serialize an array<float> column to a canonical CSV string —
    * the external harness sorts result rows, so every registered
    * query's output columns must be scalar. */
  private def featureCsv(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
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
