package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageCodec, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def t = Tables(spark, "/root/testdata/sf0.001")
  private val dim = Multimodal.featureDim

  test("known-color PNG decodes to the known feature vector") {
    // solid red: mean R=1, G=0, B=0; every luminance stripe = 0.299
    val red = ImageCodec.encodeSolidPng(8, 8, 255, 0, 0)
    val f = ImageCodec.featureFromBytes(red, dim).get
    assert(math.abs(f(0) - 1.0f) < 1e-6f)
    assert(f(1) == 0.0f && f(2) == 0.0f)
    (3 until dim).foreach(i =>
      assert(math.abs(f(i) - 0.299f) < 1e-6f, s"stripe $i: ${f(i)}"))
    // solid mid-gray: every slot = 128/255
    val gray = ImageCodec.encodeSolidPng(5, 7, 128, 128, 128)
    val g = ImageCodec.featureFromBytes(gray, dim).get
    g.foreach(v => assert(math.abs(v - 128f / 255f) < 1e-6f))
  }

  test("PNG fixture round-trips bit-exactly through ImageIO") {
    val bytes = ImageCodec.encodeFixturePng(9, 6, seed = 42L)
    val img = ImageCodec.decode(bytes).get
    assert(img.getWidth == 9 && img.getHeight == 6)
    for (y <- 0 until 6; x <- 0 until 9)
      assert((img.getRGB(x, y) & 0xffffff) == ImageCodec.fixturePixel(42L, x, y))
  }

  test("corrupt bytes decode to NULL feature, not a task failure") {
    assert(ImageCodec.featureFromBytes("not a png".getBytes, dim).isEmpty)
    val df = Seq((1L, "image", "garbage".getBytes),
        (2L, "image", ImageCodec.encodeSolidPng(4, 4, 0, 255, 0)))
      .toDF("media_id", "kind", "bytes")
      .withColumn("meta", struct(lit(4).as("width"), lit(4).as("height"),
        lit(null).cast("long").as("duration_ms")))
    val rows = Multimodal.extractFeatures(df)
      .select("media_id", "feature").orderBy("media_id").collect()
    assert(rows(0).isNullAt(1))
    val f = rows(1).getSeq[Float](1)
    assert(math.abs(f(1) - 1.0f) < 1e-6f && f(0) == 0.0f)
  }

  test("q44 image features derive from really-decoded pixels") {
    val media = Multimodal.syntheticMedia(t).filter(col("kind") === "image")
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "feature").as[(Long, Seq[Float])]
    val bytes = media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .collect().toMap
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f) =>
      val expect = ImageCodec.featureFromBytes(bytes(id), dim).get
      assert(f == expect.toSeq, s"media $id")
    }
    // and the fixture really is a PNG (magic bytes), not hash noise
    val magic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(bytes.values.forall(_.take(4).sameElements(magic)))
  }

  test("batched decode matches the column-shape decode for images") {
    val media = Multimodal.syntheticMedia(t)
      .filter(col("kind") === "image").limit(60)
    val a = Multimodal.decodeBatched(media, batchSize = 7)
      .filter(col("feature").isNotNull)
      .as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.extractFeatures(media)
      .select("media_id", "feature").as[(Long, Seq[Float])]
      .collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, f) => assert(f == b(id), s"media $id") }
  }

  test("resize really rescales: decoded dims and pixels match") {
    val bytes = ImageCodec.encodeFixturePng(12, 8, seed = 7L)
    val (out, nw, nh) = ImageCodec.resize(bytes, maxSide = 6).get
    assert(nw == 6 && nh == 4)
    val img = ImageCodec.decode(out).get
    assert(img.getWidth == 6 && img.getHeight == 4)
    // no upscaling
    val (_, w2, h2) = ImageCodec.resize(bytes, maxSide = 100).get
    assert(w2 == 12 && h2 == 8)
    // operator shape over the synthetic table
    val r = Multimodal.resizeImages(Multimodal.syntheticMedia(t), maxSide = 8)
    val rows = r.select("media_id", "new_width", "new_height", "bytes")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val img2 = ImageCodec.decode(row.getAs[Array[Byte]]("bytes")).get
      assert(img2.getWidth == row.getInt(1) && img2.getHeight == row.getInt(2))
      assert(math.max(img2.getWidth, img2.getHeight) <= 8)
    }
  }
}
