package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("holdoutStream: latest snapshot per source == batch evalHoldout " +
      "over everything seen; later smaller hash displaces an early pick") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamingOps.DocKey
    val t = Tables(spark, "/root/testdata/sf0.001")
    val all = t.documents
      .select(col("doc_id"), col("source"),
        md5(concat(lit("eval:"), col("doc_id").cast("string")))
          .as("k_eval"))
      .as[DocKey].collect()
    val (first, second) = all.splitAt(all.length / 2)
    val mem = MemoryStream[DocKey]
    val q = StreamingOps.holdoutStream(mem.toDS(), k = 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("holdout_out").start()
    mem.addData(first.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(second.toIndexedSeq: _*)
    q.processAllAvailable()
    // memory sink in update mode appends each emitted snapshot; the
    // LAST row per source is the current state
    val snaps = spark.table("holdout_out")
      .withColumn("rn", monotonically_increasing_id())
      .collect()
    q.stop()
    val latest = snaps.groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.maxBy(_.getLong(2)).getSeq[Long](1).toSet }
    val batch = graft.operators.TextAnalysis
      .evalHoldoutPerSource(t.documents, k = 3)
      .collect().groupBy(_.getString(1))
      .map { case (s, rs) => s -> rs.map(_.getLong(0)).toSet }
    assert(latest == batch)
  }

  test("tumbling window streaming agg over MemoryStream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps
      .tumblingCounts(mem.toDF(), width = "1 hour", watermark = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1.0),
      Event(1, ts("2024-01-01 10:55:00"), 2.0),
      Event(2, ts("2024-01-01 11:05:00"), 3.0))
    q.processAllAvailable()
    val got = spark.table("tumbling_out")
      .select("window_start", "n").as[(Timestamp, Long)].collect().toMap
    q.stop()
    assert(got == Map(ts("2024-01-01 10:00:00") -> 2L,
      ts("2024-01-01 11:00:00") -> 1L))
  }

  test("stream-static enrichment joins the broadcast taxonomy per batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.enrichWithTaxonomy(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1.0, "purchase"),
      Event(2, ts("2024-01-01 10:06:00"), 2.0, "error"),
      Event(3, ts("2024-01-01 10:07:00"), 3.0, "unknown_type"))
    q.processAllAvailable()
    val got = spark.table("enrich_out")
      .select("user_id", "category").as[(Long, Option[String])]
      .collect().toMap
    q.stop()
    // left join: known types map to their category, unknown stays null
    assert(got == Map(1L -> Some("conversion"), 2L -> Some("reliability"),
      3L -> None))
  }

  test("watermark drops late data in append mode") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps
      .tumblingCounts(mem.toDF(), width = "1 hour", watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    mem.addData(Event(1, ts("2024-01-01 10:10:00"), 1.0))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window
    mem.addData(Event(1, ts("2024-01-01 13:00:00"), 1.0))
    q.processAllAvailable()
    // this event is >30min behind the watermark: must be dropped
    mem.addData(Event(1, ts("2024-01-01 10:20:00"), 99.0))
    mem.addData(Event(1, ts("2024-01-01 13:30:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts("2024-01-01 17:00:00"), 1.0))
    q.processAllAvailable()
    val got = spark.table("late_out")
      .select("window_start", "n").as[(Timestamp, Long)].collect().toMap
    q.stop()
    assert(got(ts("2024-01-01 10:00:00")) == 1L) // late row NOT counted
  }

  test("custom stateful sessionizer emits gap-separated sessions") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StreamingOps.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    mem.addData(
      Event(7, ts("2024-01-01 10:00:00"), 1.0),
      Event(7, ts("2024-01-01 10:10:00"), 1.0),
      // 40-minute gap -> new session; first session should be emitted
      Event(7, ts("2024-01-01 10:50:00"), 1.0))
    q.processAllAvailable()
    val got = spark.table("sessions_out")
      .as[StreamingOps.Session].collect()
    q.stop()
    assert(got.toSeq == Seq(StreamingOps.Session(7,
      ts("2024-01-01 10:00:00"), 2)))
  }

  test("stateful throttle passes only events >= minGap after the last PASSED one") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val throttled = StreamingOps.throttleStream(mem.toDS(),
      minGapMs = 5 * 60 * 1000)
    val q = throttled.writeStream.outputMode("append")
      .format("memory").queryName("throttle_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1.0), // pass (first)
      Event(1, ts("2024-01-01 10:03:00"), 1.0), // drop (< 5m after 10:00)
      // kept-based semantics: 10:06 is >= 5m after the last PASSED
      // event (10:00) even though it is < 5m after the dropped 10:03
      Event(1, ts("2024-01-01 10:06:00"), 1.0), // pass
      Event(2, ts("2024-01-01 10:01:00"), 1.0)) // pass (own key)
    q.processAllAvailable()
    // state persists across micro-batches
    mem.addData(
      Event(1, ts("2024-01-01 10:08:00"), 1.0), // drop (< 5m after 10:06)
      Event(1, ts("2024-01-01 10:11:00"), 1.0)) // pass
    q.processAllAvailable()
    val got = spark.table("throttle_out").as[Event].collect()
      .map(e => (e.user_id, e.ts)).sortBy(x => (x._1, x._2.getTime)).toSeq
    q.stop()
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:06:00")),
      (1L, ts("2024-01-01 10:11:00")),
      (2L, ts("2024-01-01 10:01:00"))))
  }

  test("batch session windows match the gaps-and-islands definition") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:29:59"), 1.0), // same session (gap < 30m)
      (1L, ts("2024-01-01 11:00:00"), 1.0), // 30:01 gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val got = StreamingOps.sessionWindows(events)
      .orderBy("user_id", "session_start")
      .select("user_id", "session_start", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 11:00:00"), 1L),
      (2L, ts("2024-01-01 10:00:00"), 1L)))
  }

  test("horizonDedupCard: hand keep-chain; shares first-kept and " +
      "min-gap invariants with dropDuplicatesWithinWatermark") {
    // key (1, click): 10:00 kept; 10:30 within 1h of it -> dropped;
    // 11:30 > 11:00 -> kept; 14:00 > 12:30 -> kept; 14:30 dropped
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 11:30:00")), (1L, ts("2024-01-01 14:00:00")),
      (1L, ts("2024-01-01 14:30:00")), (2L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
      .withColumn("event_type", lit("click"))
    val card = StreamingOps.horizonDedupCard(events).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    def us(s: String) = ts(s).getTime * 1000L
    assert(card.toSeq == Seq(
      (1L, 5L, 3L, us("2024-01-01 10:00:00"), us("2024-01-01 14:00:00")),
      (2L, 1L, 1L, us("2024-01-01 09:00:00"), us("2024-01-01 09:00:00"))))

    // streaming: feed the SAME key-1 events one micro-batch each in
    // event-time order; pin the shared invariants (the streaming
    // state may legally outlive the horizon, so kept SETS can differ)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.dedupStream(mem.toDF(), "1 hour",
      Seq("user_id", "event_type")).writeStream.outputMode("append")
      .format("memory").queryName("horizon_out").start()
    Seq("10:00:00", "10:30:00", "11:30:00", "14:00:00", "14:30:00")
      .foreach { t =>
        mem.addData(Event(1, ts(s"2024-01-01 $t"), 1.0))
        q.processAllAvailable()
      }
    val streamKept = spark.table("horizon_out")
      .select("ts").as[Timestamp].collect().map(_.getTime * 1000L).sorted
    q.stop()
    assert(streamKept.head == us("2024-01-01 10:00:00"))
    streamKept.sliding(2).foreach {
      case Array(a, b) => assert(b - a > 3600L * 1000000L)
      case _ =>
    }
    // and the batch chain's kept events satisfy the same min-gap by
    // construction: 10:00 -> 11:30 -> 14:00 are each > 1h apart
  }

  test("streaming dedup drops exact duplicates within the watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.dedupStream(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1.0),
      Event(1, ts("2024-01-01 10:00:00"), 1.0), // dup in same batch
      Event(2, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1.0)) // dup later
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 2)
  }

  test("stream-stream interval join pairs purchases with close errors") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.purchaseErrorStream(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1.0, "purchase"),
      Event(1, ts("2024-01-01 10:10:00"), 1.0, "error"),   // within 30m
      Event(1, ts("2024-01-01 11:30:00"), 1.0, "error"),   // too late
      Event(2, ts("2024-01-01 10:05:00"), 1.0, "error"))   // other user
    q.processAllAvailable()
    val got = spark.table("ssjoin_out")
      .select("user_id", "error_ts")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    q.stop()
    assert(got == Set((1L, ts("2024-01-01 10:10:00"))))
  }

  test("outer interval join: unmatched purchase emits null after watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.purchaseErrorStreamOuter(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_outer_out").start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1.0, "purchase"), // matched
      Event(1, ts("2024-01-01 10:10:00"), 1.0, "error"),
      Event(2, ts("2024-01-01 10:05:00"), 1.0, "purchase")) // no error
    q.processAllAvailable()
    val early = spark.table("ssjoin_outer_out")
      .filter(col("user_id") === 2).count()
    // the absence is not final yet — no null row may have emitted
    assert(early == 0, "outer row emitted before the watermark passed")
    // advance BOTH watermarks past 10:05 + 30m (+1h delay): the late
    // pair matches immediately, and finalizes user 2's non-match
    mem.addData(
      Event(9, ts("2024-01-01 14:00:00"), 1.0, "purchase"),
      Event(9, ts("2024-01-01 14:01:00"), 1.0, "error"))
    q.processAllAvailable()
    val got = spark.table("ssjoin_outer_out")
      .select("user_id", "purchase_ts", "error_ts")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    q.stop()
    assert(got.contains((1L, ts("2024-01-01 10:00:00"),
      Some(ts("2024-01-01 10:10:00")))))
    assert(got.contains((9L, ts("2024-01-01 14:00:00"),
      Some(ts("2024-01-01 14:01:00")))))
    assert(got.contains((2L, ts("2024-01-01 10:05:00"), None)),
      s"watermark-finalized outer row missing: $got")
  }

  test("foreachBatch idempotent sink: replayed batch leaves no duplicates") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_")
    val out = dir.resolve("data").toString
    val ckpt = dir.resolve("ckpt").toString
    val mem = MemoryStream[Event]
    val q = StreamingOps.idempotentParquetStream(mem.toDF(), out, ckpt)
      .start()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Event(2, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    q.stop()
    val readBack = spark.read.parquet(out)
    assert(readBack.count() == 2)
    // simulate checkpoint-recovery replay: batch 1 is delivered again
    // (possibly with identical content) — the overwrite keeps the sink
    // exactly-once
    val replay = Seq(Event(2, ts("2024-01-01 10:01:00"), 2.0)).toDF()
    StreamingOps.writeBatchIdempotent(replay, 1L, out)
    assert(spark.read.parquet(out).count() == 2)
    assert(spark.read.parquet(out).select(sum(col("value")))
      .head.getDouble(0) == 3.0)
  }

  test("stateless contamination sweep: append-mode stream equals batch") {
    implicit val sc = spark.sqlContext
    val evalDocs = Seq((100L, "e1 e2 e3 e4 e5 e6"))
      .toDF("doc_id", "text")
    val trainRows = Seq(
      (1L, "a b e1 e2 e3 e4 e5 c"), // shares "e1 e2 e3 e4 e5"
      (2L, "x y z w v u"),          // clean
      (3L, "e2 e3 e4 e5 e6 k"))     // shares "e2 e3 e4 e5 e6"
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.CorpusSignals.contaminationPerDoc(
      mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_out").start()
    // two micro-batches: the sweep is stateless, so batch boundaries
    // must not change any per-doc count
    mem.addData(trainRows(0), trainRows(1))
    q.processAllAvailable()
    mem.addData(trainRows(2))
    q.processAllAvailable()
    val streamed = spark.table("contam_out")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    val batch = graft.operators.CorpusSignals.contaminationPerDoc(
      trainRows.toDF("doc_id", "text"), evalDocs)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("shard manifest streams in complete mode and equals batch") {
    // continuous export accounting: the manifest's aggregates (count,
    // sums, bit_xor) are all partial-aggregatable, so the SAME plan
    // runs as a complete-mode stream with nShards rows of state —
    // and must converge to the batch manifest whatever the batching
    implicit val sc = spark.sqlContext
    val rows = (1L to 40L).map(i => (i, s"tok$i text $i", 10L + i))
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.operators.ScalePatterns.shardManifest(
      mem.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("manifest_out").start()
    mem.addData(rows.take(25): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(25): _*)
    q.processAllAvailable()
    val streamed = spark.table("manifest_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.ScalePatterns.shardManifest(
      rows.toDF("doc_id", "text", "n_chars")).collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stateless curation filters (gopher rules, blocklist) stream == batch") {
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (1L, "the quick brown foxes moved softly over damp grass while " +
        "small birds called from leafy trees before early light faded away"),
      (2L, "the cat sat"),
      (3L, "spark dup " + (1 to 20).map(i => s"word$i").mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val gq = graft.operators.TextAnalysis.gopherRules(
      mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "keep", "drop_reasons")
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_out").start()
    val bq = graft.operators.TextAnalysis.blocklistFilter(
      mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("block_out").start()
    mem.addData(rows(0), rows(1))
    gq.processAllAvailable(); bq.processAllAvailable()
    mem.addData(rows(2))
    gq.processAllAvailable(); bq.processAllAvailable()
    val gStream = spark.table("gopher_out")
      .as[(Long, Boolean, String)].collect().toSet
    val bStream = spark.table("block_out")
      .as[(Long, String, Boolean)].collect().toSet
    gq.stop(); bq.stop()
    val docs = rows.toDF("doc_id", "text")
    assert(gStream == graft.operators.TextAnalysis.gopherRules(docs)
      .select("doc_id", "keep", "drop_reasons")
      .as[(Long, Boolean, String)].collect().toSet)
    assert(bStream == graft.operators.TextAnalysis.blocklistFilter(docs)
      .as[(Long, String, Boolean)].collect().toSet)
    // sanity: doc 1 keeps, doc 3 matched the blocklist
    assert(gStream.exists(r => r._1 == 1L && r._2))
    assert(bStream.contains((3L, "spark,dup", true)))
  }

  test("Luhn PAN screen (q304) streams == batch: per-source rollup " +
      "in complete mode, late rows revise the card") {
    implicit val sc = spark.sqlContext
    val rows = Seq(
      // a VALID test PAN (passes Luhn) and a near-miss (fails) — the
      // DataHygieneSpec plants; here they pin the streamed rollup
      (1L, "pay 4111111111111111 now", "web"),
      (2L, "ref 4111111111111112 order", "web"),
      (3L, "clean text with no digit runs at all", "mail"))
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.operators.DataHygiene.luhnScreen(
        mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("luhn_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    // late rows REVISE the per-source card (complete mode re-emits)
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("luhn_out").collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.DataHygiene.luhnScreen(
        rows.toDF("doc_id", "text", "source"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // and the checksum semantics survived the stream: web flags the
    // valid PAN, counts the near-miss only as a reject
    val web = streamed.find(_.head == "web").get
    assert(web.toString.nonEmpty && batch.exists(_.head == "mail"))
  }

  test("perceptron serve (q324) streams == batch: stateless row-local " +
      "scoring in append mode") {
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (1L, "good solid prose good solid prose", "hq"),
      (2L, "junk spam noise junk spam noise", "lq"),
      (3L, "good junk mixed signal text here", "hq"))
    val batchDocs = rows.toDF("doc_id", "text", "source")
    val w = graft.operators.Quality.trainPerceptronExact(batchDocs,
      col("source") === "hq", dim = 8, rounds = 5)
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.operators.Quality.perceptronServe(
        mem.toDF().toDF("doc_id", "text", "source"),
        col("source") === "hq", w, dim = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("perceptron_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("perceptron_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.Quality.perceptronServe(batchDocs,
      col("source") === "hq", w, dim = 8)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streamed scores diverged from batch")
    assert(streamed.size == 3)
  }

  test("intra-doc line dedup streams unchanged (pure projection)") {
    implicit val sc = spark.sqlContext
    val l1 = "a b c d e f g h"
    val l2 = "p q r s t u v w"
    val rows = Seq((1L, s"$l1 $l2 $l1"), (2L, l1), (3L, "x y"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.CorpusSignals.intraDocLineDedup(
      mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("intradoc_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("intradoc_out")
      .as[(Long, Long, Long, String)].collect().toSet
    q.stop()
    val batch = graft.operators.CorpusSignals.intraDocLineDedup(
      rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 3L, 2L, s"$l1 $l2")))
  }

  test("token diversity streams unchanged (pure projection)") {
    implicit val sc = spark.sqlContext
    val rows = Seq((1L, "x x x x"), (2L, "a b c d"), (3L, "a a b b"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.tokenDiversity(
      mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("tokdiv_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("tokdiv_out")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    q.stop()
    val batch = graft.operators.TextAnalysis.tokenDiversity(
      rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 4L, 1L, 16L, 1.0, 1.0)))
  }

  test("compression-ratio screen streams unchanged (pure projection)") {
    implicit val sc = spark.sqlContext
    val rows = Seq((1L, "spam spam " * 200, "en", "s0", 2000L),
      (2L, "the quick brown fox jumps over the lazy dog and then " +
        "wanders through a long winding meadow full of tall grass " +
        "while birds circle overhead in the late afternoon light",
        "en", "s0", 160L))
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = graft.operators.DataHygiene.compressionRatio(
      mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
      .writeStream.outputMode("append")
      .format("memory").queryName("zratio_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1))
    q.processAllAvailable()
    val streamed = spark.table("zratio_out")
      .as[(Long, String, Long, Long, Double, Boolean)].collect().toSet
    q.stop()
    val batch = graft.operators.DataHygiene.compressionRatio(
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .as[(Long, String, Long, Long, Double, Boolean)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists(r => r._1 == 1L && !r._6)) // spam gated
    assert(streamed.exists(r => r._1 == 2L && r._6))
  }

  test("code-shape gate streams unchanged (pure projection)") {
    // q244's daily-cadence generalization: the per-doc line-stats
    // gate is a zero-shuffle projection, so the SAME plan runs
    // append-mode over a stream — batch == union of micro-batches
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (0L, ("w " * 30).trim, "en", "s0"), // mod 11 AND 13: both plants
      (3L, ("word " * 24).trim, "en", "s0"),
      (11L, ("x " * 16).trim, "en", "s1")) // separator plant only
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.DataHygiene.codeShapeGate(
      mem.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.outputMode("append")
      .format("memory").queryName("codeshape_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("codeshape_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.DataHygiene.codeShapeGate(
      rows.toDF("doc_id", "text", "lang", "source"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 3)
    // the planted 120-char separator must trip the gate either way
    assert(spark.table("codeshape_out")
      .filter(col("doc_id") === 0L && !col("keep")).count() == 1)
  }

  test("paragraph gate streams unchanged (pure projection)") {
    implicit val sc = spark.sqlContext
    def words(n: Int) = (1 to n).map(i => s"x$i").mkString(" ")
    val rows = Seq((0L, words(10), "en", "s"), (1L, words(9), "en", "s"),
      (2L, words(40), "en", "s"))
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.DataHygiene.paragraphGate(
      mem.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.outputMode("append")
      .format("memory").queryName("paragate_out").start()
    mem.addData(rows(0), rows(1))
    q.processAllAvailable()
    mem.addData(rows(2))
    q.processAllAvailable()
    val streamed = spark.table("paragate_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.DataHygiene.paragraphGate(
      rows.toDF("doc_id", "text", "lang", "source"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 3)
  }

  test("homoglyph screen streams in complete mode and equals batch") {
    // q297's rollup is a partial-aggregatable source-keyed groupBy
    // (|sources| rows of state), so the identical plan runs as a
    // complete-mode stream — the daily screen over an arriving crawl
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (37L, "quarterly report", "en", "s1"), // mod-37 plant fires
      (1L, "hello wоrld", "en", "s1"),
      (2L, "hello world", "en", "s2"),
      (5L, "привет мир", "en", "s2")) // pure Cyrillic: never flagged
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.DataHygiene.homoglyphScreen(
      mem.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("homoglyph_out").start()
    mem.addData(rows(0), rows(1))
    q.processAllAvailable()
    mem.addData(rows(2), rows(3))
    q.processAllAvailable()
    val streamed = spark.table("homoglyph_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.DataHygiene.homoglyphScreen(
      rows.toDF("doc_id", "text", "lang", "source"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 2)
  }

  test("luhn screen streams in complete mode and equals batch") {
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (23L, "quarterly report", "en", "s1"), // mod-23 valid-PAN plant
      (1L, "pay 371449635398431 now", "en", "s1"), // manual valid AmEx
      (2L, "ref 4111111111111112 ok", "en", "s2")) // checksum near-miss
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.DataHygiene.luhnScreen(
      mem.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("luhn_out").start()
    mem.addData(rows(0), rows(1))
    q.processAllAvailable()
    mem.addData(rows(2))
    q.processAllAvailable()
    val streamed = spark.table("luhn_out").collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.DataHygiene.luhnScreen(
      rows.toDF("doc_id", "text", "lang", "source"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 2)
  }

  test("row-local fluency scoring streams unchanged (broadcast model)") {
    implicit val sc = spark.sqlContext
    val model = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val rows = Seq((1L, "a b"), (2L, "z q"), (3L, "one"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.fluencyScoreLocal(
      model, mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("fluency_out").start()
    mem.addData(rows(0))
    q.processAllAvailable()
    mem.addData(rows(1), rows(2))
    q.processAllAvailable()
    val streamed = spark.table("fluency_out")
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = graft.operators.TextAnalysis.fluencyScoreLocal(
      model, rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 3)
  }

  test("cross-corpus screen runs as a stateless stream-static anti join") {
    implicit val sc = spark.sqlContext
    val base = Seq((0L, "a b c", "en", "base"), (2L, "d e f", "en", "base"))
      .toDF("doc_id", "text", "lang", "source")
    val candRows = Seq(
      (10L, "c b a a", "en", "crawl"), // token set {a,b,c}: already in base
      (11L, "x y z", "en", "crawl"),   // new
      (12L, "f e d", "en", "crawl"))   // token set {d,e,f}: already in base
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.Dedup.crossCorpusNewAgainst(
      mem.toDF().toDF("doc_id", "text", "lang", "source"), base)
      .writeStream.outputMode("append")
      .format("memory").queryName("xcorpus_out").start()
    mem.addData(candRows(0), candRows(1))
    q.processAllAvailable()
    mem.addData(candRows(2))
    q.processAllAvailable()
    val streamed = spark.table("xcorpus_out")
      .select("doc_id").as[Long].collect().toSet
    q.stop()
    val batch = graft.operators.Dedup.crossCorpusNewAgainst(
      candRows.toDF("doc_id", "text", "lang", "source"), base)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed == Set(11L))
  }

  test("bloom-screened cross-corpus screen: stream == batch == plain") {
    // the bloom sketch is built eagerly from the STATIC base, so the
    // screened form stays a stateless append-mode stream: a literal
    // scan predicate + a stream-static anti join + a union of two
    // streaming branches — no watermark, no state store.
    implicit val sc = spark.sqlContext
    val base = Seq((0L, "a b c", "en", "base"), (2L, "d e f", "en", "base"))
      .toDF("doc_id", "text", "lang", "source")
    val candRows = Seq(
      (10L, "c b a a", "en", "crawl"), // dup of base 0
      (11L, "x y z", "en", "crawl"),   // new
      (12L, "f e d", "en", "crawl"))   // dup of base 2
    val mem = MemoryStream[(Long, String, String, String)]
    val q = graft.operators.Dedup.crossCorpusNewBloomScreened(
      mem.toDF().toDF("doc_id", "text", "lang", "source"), base)
      .writeStream.outputMode("append")
      .format("memory").queryName("xcorpus_bloom_out").start()
    mem.addData(candRows(0), candRows(1))
    q.processAllAvailable()
    mem.addData(candRows(2))
    q.processAllAvailable()
    val streamed = spark.table("xcorpus_bloom_out")
      .select("doc_id").as[Long].collect().toSet
    q.stop()
    val batch = graft.operators.Dedup.crossCorpusNewBloomScreened(
      candRows.toDF("doc_id", "text", "lang", "source"), base)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed == Set(11L))
  }

  test("ANN serving stream (exact index): micro-batched query vectors " +
      "served from the at-rest artifact equal the inline batch tier") {
    implicit val sc = spark.sqlContext
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val key = s"ivfxstream_${System.nanoTime()}"
    val qvecs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_annout").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_annckpt").toString
    val q = graft.operators.Similarity.ivfExactServedStream(spark,
      mem.toDF().toDF("query_id", "qv"), emb, key, outDir, ckpt)
      .start()
    // two micro-batches: the artifact is static, each batch stateless
    mem.addData(qvecs.take(5).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(qvecs.drop(5).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("query_id", "rank", "neighbor_id", "d2")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // q313's inline pipeline over the same query slice: the stream
    // must answer exactly what the batch tier answers, bit for bit
    val batch = graft.operators.Similarity.ivfTopKExact(emb)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("incremental SemDeDup stream (q327's transform): micro-batched " +
      "crawl vectors reproduce the batch verdicts against the static " +
      "index") {
    implicit val sc = spark.sqlContext
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val key = s"incdedupstream_${System.nanoTime()}"
    val base = emb.filter(col("vec_id") % 10 =!= 3)
    val incVecs = emb.filter(col("vec_id") % 10 === 3)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(incVecs.length > 5)
    val mem = MemoryStream[(Long, Seq[Float])]
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_incout").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_incckpt").toString
    val q = graft.operators.Similarity.semDedupIncrementalStream(spark,
      mem.toDF().toDF("vec_id", "embedding"), base, key, outDir, ckpt)
      .start()
    mem.addData(incVecs.take(5).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(incVecs.drop(5).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("vec_id", "cell", "dup_of", "keep")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    // the batch tier over the same slice and the same key (memoized
    // artifact): verdicts must match row for row
    val batch = graft.operators.Similarity.semDedupIncremental(spark,
      emb, key).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("nightly-admission stream: micro-batched crawl records union " +
      "to the q341 manifest exactly (all three screens served from " +
      "the static durable artifacts)") {
    implicit val sc = spark.sqlContext
    val t = Tables(spark, "/root/testdata/sf0.001")
    val docs = t.documents
    val emb = t.embeddings
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(p).resolve("d").toString
    val (nearDir, semDir, screenDir) =
      (tmp("graft_adm_n"), tmp("graft_adm_s"), tmp("graft_adm_e"))
    // the crawl records: tonight's slice with its embedding sidecar
    val records = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("embedding"))
      .as[(Long, String, String, String, Seq[Float])]
      .collect().sortBy(_._1)
    assert(records.length > 10)
    val baseDocs = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
    val baseEmb = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 3)
    val mem = MemoryStream[(Long, String, String, String, Seq[Float])]
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_admout").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_admckpt").toString
    val q = graft.operators.Ingest.nightlyAdmissionStream(spark,
      mem.toDF().toDF("doc_id", "text", "lang", "source", "embedding"),
      baseDocs, baseEmb, nearDir, semDir, screenDir, outDir, ckpt)
      .start()
    mem.addData(records.take(7).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(records.drop(7).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "exact_dup", "near_dup_of", "sem_dup_of",
        "admit")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    // the registered q341 manifest over the same artifacts' HOMES —
    // fresh dirs here, but identical inputs: verdicts must match row
    // for row
    val batch = graft.operators.Ingest.nightlyAdmissionAtRest(spark,
      docs, emb, nearDir, semDir, screenDir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("media-admission stream: micro-batched media records union to " +
      "the whole-batch screen against the static durable fingerprint " +
      "artifact (per-doc independence made an engine fact)") {
    import graft.multimodal.Multimodal
    implicit val sc = spark.sqlContext
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(p).resolve("d").toString
    val mediaDir = tmp("graft_madm")
    // the q350 artifact shape: day-0 base + day-1 delta at rest
    val md = Multimodal.mediaFingerprintArtifact(spark,
      Multimodal.syntheticMediaFrom(
        docs.filter(!pmod(col("doc_id"), lit(10L)).isin(3L, 4L))),
      mediaDir)
    Multimodal.appendToMediaFingerprintArtifact(spark,
      Multimodal.syntheticMediaFrom(
        docs.filter(pmod(col("doc_id"), lit(10L)) === 4)), md, "m4")
    // tonight's records: the natural increment plus planted per-kind
    // duplicates of base items (guaranteed hits)
    val baseIds = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val plantSrc = Seq(0L, 1L, 2L).map(k =>
      baseIds.find(_ % 3 == k).get)
    val incMedia = Multimodal.syntheticMediaFrom(
      docs.filter(pmod(col("doc_id"), lit(10L)) === 3))
    val planted = Multimodal.syntheticMediaFrom(
      docs.filter(col("doc_id").isin(plantSrc.map(Long.box): _*)))
      .withColumn("media_id", col("media_id") + lit(1000000L))
    val records = incMedia.unionByName(planted)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])].collect().sortBy(_._1)
    assert(records.length > 10)
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_madmout").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_madmckpt").toString
    val q = Multimodal.mediaAdmissionStream(spark,
      mem.toDF().toDF("media_id", "kind", "bytes"), md, outDir, ckpt)
      .start()
    mem.addData(records.take(9).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(records.drop(9).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("media_id", "media_dup_of")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Multimodal.mediaAdmissionScreen(spark,
      incMedia.unionByName(planted), md)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // all three planted kinds surfaced through the stream
    plantSrc.foreach { b =>
      assert(streamed.contains(b + 1000000L),
        s"planted duplicate of base $b missed by the stream")
    }
  }

  test("ANN serving stream (IVF-PQ artifact): micro-batched queries " +
      "reproduce q311's batch ranking") {
    implicit val sc = spark.sqlContext
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val key = s"ivfpqstream_${System.nanoTime()}"
    val qvecs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_pqout").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_pqckpt").toString
    val q = graft.operators.Similarity.ivfPqServedStream(spark,
      mem.toDF().toDF("query_id", "qv"), emb, key, outDir, ckpt)
      .start()
    mem.addData(qvecs.take(3).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(qvecs.drop(3).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("query_id", "rank", "neighbor_id", "d2", "adist")
      .as[(Long, Int, Long, Double, Double)].collect()
      .sortBy(r => (r._1, r._2))
    val batch = graft.operators.Similarity
      .ivfPqTopKServed(spark, emb, key)
      .as[(Long, Int, Long, Double, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("file-source stream with checkpoint: AvailableNow equals batch") {
    // events.parquet stores ts as TIMESTAMP(MICROS) without UTC
    // adjustment; declare it NTZ and cast to the session-TZ
    // timestamp, exactly like Tables.events does for batch
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sout").toString
    // the file stream source requires a DIRECTORY of files
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(srcDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = StreamingOps.tumblingCounts(stream)
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; compare against
    // the batch plan restricted to those same windows
    val streamed = spark.read.parquet(outDir)
    val batch = StreamingOps.tumblingCounts(
      Tables(spark, "/root/testdata/sf0.001").events)
    val maxClosed = streamed.agg(max("window_start")).head.getTimestamp(0)
    val expected = batch.filter(col("window_start") <= maxClosed)
    assert(streamed.count() > 0)
    assert(streamed.except(expected).isEmpty &&
      expected.except(streamed).isEmpty)
  }

  test("replaying a failed batch (same batchId) leaves the admission " +
      "manifest identical — effectively-once delivery over the " +
      "idempotent per-batch parquet sink") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val docs = t.documents
    val emb = t.embeddings
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(p).resolve("d").toString
    val (nearDir, semDir, screenDir) =
      (tmp("graft_rp_n"), tmp("graft_rp_s"), tmp("graft_rp_e"))
    val manifest = java.nio.file.Files
      .createTempDirectory("graft_rp_out").toString
    val records = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("embedding"))
    val baseDocs = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
    val baseEmb = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 3)
    def admit() = graft.operators.Ingest.admitBatch(spark, records,
      baseDocs, baseEmb, nearDir, semDir, screenDir)
    StreamingOps.writeBatchIdempotent(admit(), 7L, manifest)
    def snapshot() = {
      val rows = spark.read.parquet(manifest)
        .collect().map(_.toSeq).sortBy(_.toString)
      val dirs = new java.io.File(manifest).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted.toSeq
      (rows.toSeq, dirs)
    }
    val (rows1, dirs1) = snapshot()
    assert(dirs1 == Seq("batch_id=7"))
    // the recovery path: Spark re-runs the SAME batch id after a
    // failure — the overwrite must land the identical manifest, not
    // a duplicate
    StreamingOps.writeBatchIdempotent(admit(), 7L, manifest)
    val (rows2, dirs2) = snapshot()
    assert(rows2 == rows1, "replayed batch changed the manifest")
    assert(dirs2 == dirs1, "replayed batch added a batch directory")
    assert(rows1.nonEmpty)
  }

  test("nightly drain (Trigger.AvailableNow): one run admits the " +
      "night's backlog and TERMINATES (catchup=False semantics); the " +
      "drained manifest equals the q341 batch manifest; a re-drain " +
      "on the same checkpoint writes nothing new") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val docs = t.documents
    val emb = t.embeddings
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(p).resolve("d").toString
    val (nearDir, semDir, screenDir) =
      (tmp("graft_dr_n"), tmp("graft_dr_s"), tmp("graft_dr_e"))
    val crawlDir = java.nio.file.Files
      .createTempDirectory("graft_dr_crawl").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_dr_out").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dr_ckpt").toString
    // tonight's backlog, at rest as parquet crawl records
    docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("embedding"))
      .write.mode("overwrite").parquet(crawlDir)
    val schema = spark.read.parquet(crawlDir).schema
    val baseDocs = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
    val baseEmb = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 3)
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(crawlDir)
      val q = graft.operators.Ingest.nightlyAdmissionDrain(spark,
        stream, baseDocs, baseEmb, nearDir, semDir, screenDir, outDir,
        ckpt).start()
      assert(q.awaitTermination(180000),
        "AvailableNow drain did not terminate")
    }
    drain()
    val drained = spark.read.parquet(outDir)
      .select("doc_id", "exact_dup", "near_dup_of", "sem_dup_of",
        "admit")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batch = graft.operators.Ingest.nightlyAdmissionAtRest(spark,
      docs, emb, nearDir, semDir, screenDir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(drained.toSeq == batch.toSeq)
    assert(drained.nonEmpty)
    // catchup=False: a second nightly run over the SAME checkpoint
    // sees no new records and leaves the manifest untouched
    def listing() = new java.io.File(outDir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    val before = listing()
    drain()
    assert(listing() == before, "re-drain wrote new batch dirs")
    val after = spark.read.parquet(outDir)
      .select("doc_id", "exact_dup", "near_dup_of", "sem_dup_of",
        "admit")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(after.toSeq == drained.toSeq)
  }
}
