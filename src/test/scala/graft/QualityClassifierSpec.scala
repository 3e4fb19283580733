package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, ScalePatterns}

/** In-engine logistic-regression quality classifier: separable
  * planted data is learned to near-certainty, training actually moves
  * the loss, and the real-corpus scoring query stays total-ordered.
  * Plus the q149 global row-id plan guarantee (no data-sized global
  * window). */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def planted = {
    val pos = (0L until 20L).map(i => (i, "good solid prose " * 5 + i))
    val neg = (20L until 40L).map(i => (i, "junk spam noise " * 5 + i))
    (pos ++ neg).map { case (id, txt) => (id, txt.trim, "en",
      if (id < 20) "hq" else "lq")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("separable planted corpus is classified to near-certainty") {
    val scores = Quality.qualityClassifierScores(planted,
      col("source") === "hq", dim = 16, rounds = 60, lr = 4.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (0L until 20L).foreach(i =>
      assert(scores(i) > 0.8, s"positive doc $i scored ${scores(i)}"))
    (20L until 40L).foreach(i =>
      assert(scores(i) < 0.2, s"negative doc $i scored ${scores(i)}"))
  }

  test("sampled training still separates; every doc still scored") {
    // the 100 TB knob: train on a hash-slice, score the full corpus.
    // The planted classes are redundant (every pos doc repeats the
    // same tokens), so a half-corpus slice carries the same signal.
    val scores = Quality.qualityClassifierScores(planted,
      col("source") === "hq", dim = 16, rounds = 60, lr = 4.0,
      sampleFraction = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 40, "scoring must cover held-out docs too")
    (0L until 20L).foreach(i =>
      assert(scores(i) > 0.8, s"positive doc $i scored ${scores(i)}"))
    (20L until 40L).foreach(i =>
      assert(scores(i) < 0.2, s"negative doc $i scored ${scores(i)}"))
  }

  test("q193 fraction (0.25): sampled model separates, full coverage") {
    // pins the registered q193_classifier_sampled configuration: a
    // quarter hash-slice must still carry the planted signal, and
    // every doc — sampled or not — must come back scored
    val scores = Quality.qualityClassifierScores(planted,
      col("source") === "hq", dim = 16, rounds = 60, lr = 4.0,
      sampleFraction = 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 40, "scoring must cover held-out docs too")
    (0L until 20L).foreach(i =>
      assert(scores(i) > 0.8, s"positive doc $i scored ${scores(i)}"))
    (20L until 40L).foreach(i =>
      assert(scores(i) < 0.2, s"negative doc $i scored ${scores(i)}"))
  }

  test("empty training slice yields the zero model, scores still total") {
    // sampleFraction small enough that the xxhash64 slice selects no
    // docs: gdRounds must return the zero-init weights (every score
    // exactly 0.5) instead of dividing by zero
    val scores = Quality.qualityClassifierScores(planted,
      col("source") === "hq", dim = 16, rounds = 3, lr = 1.0,
      sampleFraction = 1e-9)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 40)
    scores.values.foreach(p => assert(p == 0.5, s"expected 0.5, got $p"))
  }

  test("sampled training reads a strict, deterministic subset") {
    val full = Quality.trainQualityClassifier(planted,
      col("source") === "hq", dim = 16, rounds = 3, lr = 1.0)
    val half1 = Quality.trainQualityClassifier(planted,
      col("source") === "hq", dim = 16, rounds = 3, lr = 1.0,
      sampleFraction = 0.5)
    val half2 = Quality.trainQualityClassifier(planted,
      col("source") === "hq", dim = 16, rounds = 3, lr = 1.0,
      sampleFraction = 0.5)
    assert(half1.toSeq == half2.toSeq,
      "hash-sampled training must be run-to-run deterministic")
    assert(full.toSeq != half1.toSeq,
      "the slice must actually differ from the full corpus")
  }

  test("training moves the weights away from zero-init") {
    val w = Quality.trainQualityClassifier(planted,
      col("source") === "hq", dim = 16, rounds = 5, lr = 1.0)
    assert(w.length == 17)
    assert(w.exists(v => math.abs(v) > 1e-3), w.mkString(","))
  }

  test("scores are probabilities and every doc gets one") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val s = Quality.qualityClassifierScores(docs,
      col("source") === "src0", rounds = 3).collect()
    assert(s.length == docs.count())
    s.foreach { r =>
      val p = r.getDouble(2)
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("column stats: nulls, ndv, and min/max on a known frame") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "a"), (4L, null)).toDF("k", "s")
    val got = Quality.columnStats(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("k") == ((4L, 1L, 3L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("global row ids stay correct on sparse, gappy id spaces") {
    // the shard function floor(id/w) is monotone in id for ANY
    // non-negative ids, so local-rank + offset must equal the global
    // rank even when ids cluster into few shards with huge gaps
    val ids = Seq(0L, 1L, 2L, 7L, 1000000L, 1000001L, 999999999L)
    val docs = ids.map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = ScalePatterns.globalRowIds(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ids.sorted.zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap)
  }

  test("global row ids: bit-equal to the global window, but sharded") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val got = ScalePatterns.globalRowIds(docs)
    val naive = docs.select(col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("doc_id"))).cast("long").as("row_id"))
    assert(got.collect().toSeq == naive.orderBy(col("doc_id")).collect().toSeq)
    // the data-sized window runs partitioned by shard, not globally
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("shard_id"), plan)
  }
}
