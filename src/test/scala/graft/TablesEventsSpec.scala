package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the round-7 loader break: `events.ts` has shipped as
  * parquet TIMESTAMP(NANOS) (Spark reads it as long under
  * `nanosAsLong`), as TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads
  * as TIMESTAMP_NTZ — the driver's current generator), and Spark's own
  * writer emits TIMESTAMP(MICROS, isAdjustedToUTC=true). `Tables.events`
  * must resolve all three to the same session-TZ TIMESTAMP instants.
  */
class TablesEventsSpec extends AnyFunSuite {
  private lazy val spark = SharedSession.spark

  // one micro-aligned instant, expressed in each physical encoding
  private val epochMicros = 1704067200123456L // 2024-01-01T00:00:00.123456Z

  private def tmpDir(): String =
    Files.createTempDirectory("events-fixture").toString

  /** Writes events.parquet with ts as int64 TIMESTAMP(NANOS,true) via
    * parquet-mr directly — Spark's writer cannot emit NANOS, but old
    * driver data did.
    */
  private def writeNanosFixture(dir: String): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/part-0.parquet"))
      .withConf(conf)
      .build()
    val f = new SimpleGroupFactory(schema)
    try {
      (0 until 3).foreach { i =>
        writer.write(
          f.newGroup()
            .append("event_id", i.toLong)
            .append("ts", (epochMicros + i) * 1000L) // nanos
            .append("user_id", 7L)
            .append("event_type", "click")
            .append("value", 1.5)
            .append("props", "{}"))
      }
    } finally writer.close()
  }

  /** Writes events.parquet through Spark with the given writer
    * timestamp encoding (TIMESTAMP_MICROS is adjusted-to-UTC).
    */
  private def writeSparkFixture(dir: String, ntz: Boolean): Unit = {
    import spark.implicits._
    val base = (0 until 3).map { i =>
      (i.toLong, new java.sql.Timestamp(epochMicros / 1000) , 7L, "click", 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(epochMicros) + col("event_id")))
    val df =
      if (ntz) base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      else base
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def checkInstants(dir: String): Unit = {
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType == TimestampType)
    val micros = ev.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    assert(micros == Seq(epochMicros, epochMicros + 1, epochMicros + 2))
  }

  test("nanos-long fixture: TIMESTAMP(NANOS) reads as long and is rebuilt to micros") {
    val dir = tmpDir()
    writeNanosFixture(dir)
    // sanity: the raw scan really resolves LongType under nanosAsLong
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType)
    checkInstants(dir)
  }

  test("micros-NTZ fixture (current driver data): cast to session-TZ timestamp") {
    val dir = tmpDir()
    writeSparkFixture(dir, ntz = true)
    checkInstants(dir)
  }

  test("micros-UTC fixture (Spark writer default): passes through unchanged") {
    val dir = tmpDir()
    writeSparkFixture(dir, ntz = false)
    checkInstants(dir)
  }

  test("real driver testdata at sf0.001 loads with a TIMESTAMP ts") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNotNull).limit(1).count() == 1)
  }
}
