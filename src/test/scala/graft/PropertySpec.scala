package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Exact, Scalars, TextFunctions}

/** Property-based invariants (SURVEY.md §5.3), driven by seeded
  * ScalaCheck generators (the scalatest-scalacheck bridge is not on
  * the offline classpath, so sampling is explicit and deterministic).
  * Generators are kept small: each property round-trips through real
  * Spark plans. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  /** 10 deterministic samples per property. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 10).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit)
      : Unit =
    (0 until 10).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default, Seed(42L + i)),
        g2.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private val word = Gen.oneOf("key", "agg", "row", "scan", "a", "the",
    "table", "spark", "fast", "slow")
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  test("explode row count equals the sum of array lengths") {
    forAll(Gen.listOfN(6, Gen.listOf(word))) { arrays =>
      val df = arrays.map(a => Tuple1(a)).toDF("xs")
      val exploded = df.select(explode(col("xs"))).count()
      assert(exploded == arrays.map(_.size).sum)
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self") {
    forAll(doc, doc) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val Array(jab, jba, jaa) = df.select(
        TextFunctions.jaccardSorted(
          TextFunctions.sortedShingles(col("a"), 2),
          TextFunctions.sortedShingles(col("b"), 2)),
        TextFunctions.jaccardSorted(
          TextFunctions.sortedShingles(col("b"), 2),
          TextFunctions.sortedShingles(col("a"), 2)),
        TextFunctions.jaccardSorted(
          TextFunctions.sortedShingles(col("a"), 2),
          TextFunctions.sortedShingles(col("a"), 2)))
        .head.toSeq.map(_.asInstanceOf[Double]).toArray
      assert(jab == jba)
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jaa == 1.0)
    }
  }

  test("capitalize matches the python str.capitalize model") {
    def model(s: String): String =
      if (s.isEmpty) s
      else s.head.toUpper.toString + s.tail.toLowerCase
    forAll(Gen.alphaNumStr.map(_.take(20))) { s =>
      val got = Seq(Tuple1(s)).toDF("c")
        .select(Scalars.capitalize(col("c"))).head.getString(0)
      assert(Option(got).getOrElse("") == model(s))
    }
  }

  test("exact decimal sums are invariant under repartitioning") {
    val cents = Gen.chooseNum(-999999L, 999999L)
    forAll(Gen.nonEmptyListOf(cents)) { xs =>
      val vals = xs.map(_ / 100.0)
      def total(parts: Int): Double =
        vals.toDF("x").repartition(parts)
          .agg(Exact.sumD2(col("x"))).head.getDouble(0)
      assert(total(1) == total(5))
    }
  }

  test("ordered-fold operators are invariant under input partitioning") {
    // the library's determinism claim, tested head-on: operators whose
    // results could drift with parallelism (ordered folds, distributed
    // ranks, driver-collected models) must produce BIT-identical rows
    // regardless of how the input was partitioned
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val ev = t.events
    assert(rows(graft.operators.Behavioral.ewma(ev.repartition(3))) ==
      rows(graft.operators.Behavioral.ewma(ev.repartition(11))))
    val docs = t.documents
    assert(rows(graft.operators.CorpusSignals.epochMixture(
        docs.repartition(3))) ==
      rows(graft.operators.CorpusSignals.epochMixture(
        docs.repartition(11))))
    assert(rows(graft.operators.ScalePatterns.quantileNormalize(
        t.lineitem.repartition(3), "l_quantity")) ==
      rows(graft.operators.ScalePatterns.quantileNormalize(
        t.lineitem.repartition(11), "l_quantity")))
    assert(rows(graft.operators.CorpusSignals.importanceWeights(
        docs.repartition(3))) ==
      rows(graft.operators.CorpusSignals.importanceWeights(
        docs.repartition(11))))
    // curriculum packing: the quality-range sharding must reproduce the
    // global (quality DESC, doc_id) running sum whatever the layout
    assert(rows(graft.operators.TextAnalysis.curriculumBatches(
        docs.repartition(3))) ==
      rows(graft.operators.TextAnalysis.curriculumBatches(
        docs.repartition(11))))
    // span decontamination: collect_set order varies with layout, so
    // the filter-lambda rewrite must not (sets are membership-only)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    assert(rows(graft.operators.Dedup.spanDecontaminate(
        docs.filter(col("doc_id") % 10 =!= 0).repartition(3), bench)) ==
      rows(graft.operators.Dedup.spanDecontaminate(
        docs.filter(col("doc_id") % 10 =!= 0).repartition(11), bench)))
    // posting-list cosine: integer tf/df/dot/norm aggregates commute,
    // so the pair set and every reported double must be layout-free
    assert(rows(graft.operators.TextAnalysis.sparseCosinePairs(
        docs.repartition(3))) ==
      rows(graft.operators.TextAnalysis.sparseCosinePairs(
        docs.repartition(11))))
    // two-pass heavy hitters: the sketch counters are integer sums and
    // the screen is a superset whatever the layout
    assert(rows(graft.operators.Sketches.exactHeavyTokens(
        docs.repartition(3))) ==
      rows(graft.operators.Sketches.exactHeavyTokens(
        docs.repartition(11))))
    // fluency bands: scoring fold + distributed-rank CDF + float cuts
    assert(rows(graft.operators.ScalePatterns.fluencyBands(
        docs.repartition(3))) ==
      rows(graft.operators.ScalePatterns.fluencyBands(
        docs.repartition(11))))
  }

  test("dedup by fingerprint is idempotent") {
    forAll(Gen.listOfN(10, doc)) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.groupBy(TextFunctions.contentFingerprint(col("text"))
        .as("fp")).agg(min("doc_id").as("doc_id"))
      val twice = once.groupBy("fp").agg(min("doc_id").as("doc_id"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }
}
