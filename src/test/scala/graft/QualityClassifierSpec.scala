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

  // ---- q323: the oracle-exact integer batch perceptron ----

  test("exact perceptron: training replays an independent driver walk " +
      "on a tiny corpus (every weight bit-equal)") {
    val texts = Seq("aa aa bb", "bb cc", "aa cc cc", "bb bb")
    val docs = texts.zipWithIndex.map { case (txt, i) =>
      (i.toLong, txt, "en", if (i % 2 == 0) "hq" else "lq")
    }.toDF("doc_id", "text", "lang", "source")
    val dim = 8; val rounds = 3
    // independent replay sharing NO code with the operator: java MD5
    // for the bucket, plain Long arrays for the batch rule
    def bucket(w: String): Int = (java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(("qb:" + w).getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16) % dim).toInt + 1
    val feats = texts.map { txt =>
      val x = new Array[Long](dim + 1); x(0) = 1L
      txt.split(" ").foreach(w => x(bucket(w)) += 1L)
      x
    }
    val ys = Array(1L, -1L, 1L, -1L)
    var w = new Array[Long](dim + 1)
    (1 to rounds).foreach { _ =>
      val upd = new Array[Long](dim + 1)
      feats.indices.foreach { i =>
        val m = (0 to dim).map(j => w(j) * feats(i)(j)).sum
        if (ys(i) * m <= 0L)
          (0 to dim).foreach(j => upd(j) += ys(i) * feats(i)(j))
      }
      w = w.indices.map(j => w(j) + upd(j)).toArray
    }
    val got = Quality.trainPerceptronExact(docs,
      col("source") === "hq", dim = dim, rounds = rounds)
    assert(got.toSeq == w.toSeq,
      s"got ${got.toSeq} vs replay ${w.toSeq}")
  }

  test("exact perceptron separates the planted corpus; decisions and " +
      "margins are integers") {
    val scored = Quality.perceptronExactScores(planted,
      col("source") === "hq", dim = 16, rounds = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(scored.size == 40)
    (0L until 20L).foreach { i =>
      val (y, m, p) = scored(i)
      assert(y == 1 && m > 0L && p == 1, s"pos doc $i: y=$y m=$m p=$p")
    }
    (20L until 40L).foreach { i =>
      val (y, m, p) = scored(i)
      assert(y == 0 && m <= 0L && p == 0, s"neg doc $i: y=$y m=$m p=$p")
    }
  }

  test("exact perceptron: partitioning-invariant (integer updates are " +
      "order-independent) and convergence is a fixed point") {
    val a = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 10)
    val b = Quality.trainPerceptronExact(planted.repartition(7),
      col("source") === "hq", dim = 16, rounds = 10)
    assert(a.toSeq == b.toSeq, "partitioning changed the model")
    // once the misclassified set empties, extra rounds are no-ops —
    // the property that makes the early return ≡ the unrolled oracle
    val c = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 25)
    assert(a.toSeq == c.toSeq, "converged model must be a fixed point")
  }

  test("sampled exact perceptron (q325 knob): quarter-slice training " +
      "still separates, every doc scored, slice is deterministic " +
      "and strict") {
    val scored = Quality.perceptronExactScores(planted,
      col("source") === "hq", dim = 16, rounds = 10,
      sampleFraction = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    // full coverage: held-out docs are scored too (the q193 contract)
    assert(scored.size == 40)
    // the planted classes are redundant, so the half-slice model
    // still separates them
    (0L until 20L).foreach(i =>
      assert(scored(i)._2 == 1, s"pos doc $i pred ${scored(i)}"))
    (20L until 40L).foreach(i =>
      assert(scored(i)._2 == 0, s"neg doc $i pred ${scored(i)}"))
    // deterministic: same slice, same model, run to run
    val w1 = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 3,
      sampleFraction = 0.5)
    val w2 = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 3,
      sampleFraction = 0.5)
    assert(w1.toSeq == w2.toSeq)
    // strict: the slice must actually drop docs (unique number
    // tokens make the full and sliced models differ)
    val full = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 3)
    assert(full.toSeq != w1.toSeq,
      "the half-slice model must differ from the full model")
    // an empty slice trains the zero model: every margin exactly 0
    val zeros = Quality.perceptronExactScores(planted,
      col("source") === "hq", dim = 16, rounds = 3,
      sampleFraction = 1e-9).collect()
    assert(zeros.length == 40)
    zeros.foreach(r => assert(r.getLong(2) == 0L && r.getInt(3) == 0))
  }

  test("perceptron serve: bit-identical to the fused tier, and the " +
      "serving scan plans with ZERO Exchange") {
    val w = Quality.trainPerceptronExact(planted,
      col("source") === "hq", dim = 16, rounds = 10)
    val served = Quality.perceptronServe(planted,
      col("source") === "hq", w)
    // the row-local token fold must contract to exactly the
    // bucket-count margins the fused tier computes
    val a = served.collect().map(_.toSeq).toSet
    val b = Quality.perceptronExactScores(planted,
      col("source") === "hq", dim = 16, rounds = 10)
      .collect().map(_.toSeq).toSet
    assert(a == b, "serve != fused scores")
    // zero-shuffle serving: a pure projection, no Exchange anywhere
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving scan shuffled:\n$plan")
  }

  test("perceptron serve: a NULL-text doc is dropped by BOTH tiers " +
      "(serve ≡ fused holds on corpora containing one)") {
    // the fused tier loses a NULL-text doc at explode(split(NULL));
    // the serve scan must mirror that drop, not emit a NULL-margin row
    val withNullDoc = planted.unionByName(
      Seq((99L, Option.empty[String], "en", "lq"))
        .toDF("doc_id", "text", "lang", "source"))
    val w = Quality.trainPerceptronExact(withNullDoc,
      col("source") === "hq", dim = 16, rounds = 10)
    val served = Quality.perceptronServe(withNullDoc,
      col("source") === "hq", w).collect().map(_.toSeq).toSet
    val fused = Quality.perceptronExactScores(withNullDoc,
      col("source") === "hq", dim = 16, rounds = 10)
      .collect().map(_.toSeq).toSet
    assert(served == fused, "serve != fused on a null-text corpus")
    assert(!served.exists(_.head == 99L), "null-text doc must be dropped")
    assert(served.size == 40)
  }

  test("exact perceptron: empty corpus yields the zero model and an " +
      "empty scores frame") {
    val empty = planted.limit(0)
    val w = Quality.trainPerceptronExact(empty, col("source") === "hq")
    assert(w.forall(_ == 0L))
    assert(Quality.perceptronExactScores(empty,
      col("source") === "hq").count() == 0L)
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
