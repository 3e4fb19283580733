package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Bigram-LM fluency scoring: hand-computed probabilities on a tiny
  * corpus, plus the monotonicity the filter exists for (repetitive =
  * predictable text scores above unique-word text). */
class TextFluencySpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  test("hand-computed add-one bigram probabilities") {
    // unigrams: a=3 b=2, V=2; bigrams: (a,b)=1 (b,a)=2
    // doc1 "a b a": P(b|a)=(1+1)/(3+2)=0.4, P(a|b)=(2+1)/(2+2)=0.75
    // doc2 "b a":   P(a|b)=0.75
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 2L && math.abs(got(1L)._2 - 0.575) < 1e-15)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - 0.75) < 1e-15)
  }

  test("Kneser-Ney: hand-computed probabilities; the continuation " +
      "backoff demotes a collocation-bound word where add-one " +
      "overrates it; unseen conditioning words back off to Pc") {
    // model: "san francisco" x8 — francisco frequent (8) but ALWAYS
    // after san (N1+(.francisco)=1); york (6) follows 3 distinct
    // predecessors (N1+(.york)=3). "the" appears with other bigrams.
    val model = ((1L to 8L).map(i => (i, "san francisco")) ++ Seq(
      (21L, "old york"), (22L, "old york"),
      (23L, "new york"), (24L, "new york"),
      (25L, "big york"), (26L, "big york"),
      (27L, "the cat"), (28L, "the dog"))).toDF("doc_id", "text")
    // score novel contexts: "the francisco" vs "the york" — neither
    // bigram exists in the model, so both are pure backoff
    val probe = Seq((101L, "the francisco"), (102L, "the york"))
      .toDF("doc_id", "text")
    val kn = TextAnalysis.kneserNeyFluencyOn(model, probe).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn(102L) > kn(101L),
      s"KN should demote collocation-bound francisco: $kn")
    // add-one instead RANKS THEM BACKWARDS (francisco count 8 > york
    // count 6 and both bigrams unseen -> same 1/(c1+V) shape)
    val addOne = TextAnalysis.bigramFluencyOn(model, probe).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(addOne(101L) == addOne(102L),
      s"add-one can't separate the novel contexts: $addOne")
    // hand check 102: c("the")=2, D=0.75, N1+(the.)=2 (cat, dog),
    // B=6 distinct bigram types, V=9 types:
    // prob = 0 + 0.75*2/2 * (3+1)/(6+9) = 0.75 * 4/15
    assert(math.abs(kn(102L) - 0.75 * 4.0 / 15.0) < 1e-15)
    // unseen conditioning word: pure continuation floor
    val unseen = TextAnalysis.kneserNeyFluencyOn(model,
      Seq((201L, "zzz york")).toDF("doc_id", "text")).collect()
    assert(math.abs(unseen.head.getDouble(2) - 4.0 / 15.0) < 1e-15)
    // self-trained corpus: every doc scores, seen bigrams score high
    val self = TextAnalysis.kneserNeyFluency(model).collect()
    assert(self.length == 16 && self.forall(!_.isNullAt(2)))
  }

  test("single-token documents get n_bigrams = 0 and a NULL score") {
    val docs = Seq((1L, "lonely"), (2L, "two words")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramFluency(docs).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == 0L && r1.isNullAt(2))
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) == 1L)
  }

  test("repetitive text outscores unique-word text in the same corpus") {
    val docs = Seq(
      (1L, "c c c c c c"),       // one bigram repeated 5x
      (2L, "u v w x y z")        // every bigram unique
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L))
  }

  test("held-out scoring: unseen bigrams and words get the add-one floors") {
    // model: "a b a" -> unigrams a=2 b=1 (V=2); bigram counts
    // (a,b)=1, (b,a)=1
    val model = Seq((0L, "a b a")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"),   // seen bigram:        (1+1)/(2+2) = 0.5
      (2L, "a a"),   // unseen bigram, seen w1: (0+1)/(2+2) = 0.25
      (3L, "z a")    // unseen w1:          (0+1)/(0+2) = 0.5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluencyOn(model, score).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.25, 3L -> 0.5))
  }

  test("bigramFluencyOn(docs, docs) is exactly bigramFluency") {
    val docs = Seq((1L, "a b a c"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.bigramFluencyOn(docs, docs).collect().toSeq ==
      TextAnalysis.bigramFluency(docs).collect().toSeq)
  }

  test("row-local scorer is bit-identical to the join form at sf0.001") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val model = docs.filter(col("source") === "src0")
    val rest = docs.filter(col("source") =!= "src0")
    val joins = TextAnalysis.bigramFluencyOn(model, rest)
      .collect().map(_.toSeq).toSeq
    val local = TextAnalysis.fluencyScoreLocal(model, rest)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(local == joins && local.nonEmpty)
  }

  test("calibratedFluency: median doc scores 0, signs split, " +
      "constant source yields NULL") {
    // srcA: three docs with distinct fluency scores -> the median doc
    // gets robust_z = 0.0, the others split by sign.
    // srcB: identical docs -> identical scores -> MAD 0 -> NULL z.
    val docs = Seq(
      (1L, "a b a b a", "srcA"), (2L, "a b c d e", "srcA"),
      (3L, "e d c b a", "srcA"),
      (4L, "x y x y", "srcB"), (5L, "x y x y", "srcB"),
      (6L, "x y x y", "srcB")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.calibratedFluency(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), if (r.isNullAt(5)) None
          else Some(r.getDouble(5))))).toMap
    assert(got.size == 6)
    val aZ = Seq(1L, 2L, 3L).map(got(_)._3.get)
    assert(aZ.count(_ == 0.0) == 1)
    assert(aZ.count(_ > 0) == 1 && aZ.count(_ < 0) == 1)
    assert(Seq(4L, 5L, 6L).forall(got(_)._3.isEmpty))
  }

  test("calibratedFluency re-centers every source at sf0.001") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
    val cal = TextAnalysis.calibratedFluency(docs).collect()
    assert(cal.nonEmpty)
    // per source: at least one doc at/below and one at/above median
    val bySrc = cal.groupBy(_.getString(1))
    assert(bySrc.size > 1)
    bySrc.foreach { case (src, rows) =>
      val zs = rows.filter(!_.isNullAt(5)).map(_.getDouble(5))
      assert(zs.exists(_ <= 0) && zs.exists(_ >= 0), src)
    }
  }
}
