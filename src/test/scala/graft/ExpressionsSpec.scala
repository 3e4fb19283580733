package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.functions.VectorFunctions

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  test("DotProductExpr is bit-identical to the higher-order fold") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < 5 && col("j") < 20)
    val diff = pairs.select(
        VectorFunctions.dot(col("a"), col("b")).as("fast"),
        VectorFunctions.dotFold(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")) // bitwise-exact equality
    assert(diff.isEmpty)
  }

  test("JumpHashExpr: codegen == reference impl; n->n+1 moves ~1/(n+1) " +
      "of keys strictly into the NEW shard; shards balanced") {
    import graft.plans.{FastOps, JumpHashExpr}
    val n = 100000
    val rows = spark.range(n)
      .select((col("id") * 2654435761L + 123456789L).as("k"))
      .select(col("k"),
        FastOps.jumpShard(col("k"), 16).as("s16"),
        FastOps.jumpShard(col("k"), 17).as("s17"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == JumpHashExpr.jump(r.getLong(0), 16))
      assert(r.getInt(2) == JumpHashExpr.jump(r.getLong(0), 17))
    }
    val moved = rows.filter(r => r.getInt(1) != r.getInt(2))
    assert(moved.forall(_.getInt(2) == 16), "a moved key skipped shard 16")
    // binomial p = 1/17: 5 sigma over 1e5 trials is ~0.0037
    val frac = moved.length.toDouble / n
    assert(math.abs(frac - 1.0 / 17) < 0.005, s"moved frac $frac")
    val byShard = rows.groupBy(_.getInt(1)).map(_._2.length)
    assert(byShard.size == 16 &&
      byShard.min > n / 16 * 0.9 && byShard.max < n / 16 * 1.1,
      s"imbalanced: min=${byShard.min} max=${byShard.max}")
    // n = 1 sends every key to shard 0
    assert(Seq(0L, -1L, Long.MaxValue, Long.MinValue)
      .forall(JumpHashExpr.jump(_, 1) == 0))
  }

  test("DotProductExpr handles mixed float/double arrays") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(0.5, 0.25, 2.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b")))
      .head.getDouble(0) == 1 * 0.5 + 2 * 0.25 + 3 * 2.0)
  }

  test("sortedIntersectSize equals size(array_intersect) on sorted sets") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"),
        array_sort(TextFunctions.shingles(col("text"), 3)).as("sh"))
    val pairs = docs.select(col("doc_id").as("i"), col("sh").as("a"))
      .crossJoin(docs.select(col("doc_id").as("j"), col("sh").as("b")))
      .filter(col("i") < 10 && col("j") < 30)
    val diff = pairs.select(
        graft.plans.FastOps.sortedIntersectSize(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("slow"),
        TextFunctions.jaccardSorted(col("a"), col("b")).as("jfast"),
        TextFunctions.jaccard(col("a"), col("b")).as("jslow"))
      .filter(col("fast") =!= col("slow") || col("jfast") =!= col("jslow"))
    assert(diff.isEmpty)
  }

  test("withinOneEdit equals levenshtein<=1 across edit shapes") {
    val cases = Seq(
      ("abc", "abc"), ("abc", "abd"), ("abc", "xbc"), ("abc", "axc"),
      ("abc", "ab"), ("abc", "abcd"), ("abc", "bc"), ("abc", "aXY"),
      ("abc", "abcde"), ("", ""), ("", "a"), ("", "ab"), ("a", "b"),
      ("Customer#000000001", "Customer#000000002"),
      ("Customer#000000001", "Customer#000000001"),
      ("Customer#000000012", "Customer#000000021"),
      // non-ASCII goes through the exact-DP fallback: a single CHAR
      // substitution that changes the byte length must still match
      ("café", "cafe"), ("café", "café"),
      ("café", "cafX"), ("你好", "你世"))
    val df = cases.toDF("a", "b")
    val bad = df.select(col("a"), col("b"),
        graft.plans.FastOps.withinOneEdit(col("a"), col("b")).as("fast"),
        (levenshtein(col("a"), col("b")) <= 1).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dot(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("RewriteDotProductRule rewrites the naive fold into DotProductExpr") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val naive = emb.select(
      VectorFunctions.dotFold(col("embedding"), col("embedding")).as("d"))
    val rewritten =
      graft.plans.RewriteDotProductRule(naive.queryExecution.analyzed)
    val found = rewritten.expressions.flatMap(_.collect {
      case e: graft.plans.DotProductExpr => e
    })
    assert(found.nonEmpty, s"no DotProductExpr in:\n$rewritten")
    // and the rewritten plan computes the same values
    val viaRule =
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark, rewritten)
    val a = viaRule.orderBy("d").collect().map(_.getDouble(0)).toSeq
    val b = naive.orderBy("d").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("NormalizeTextExpr canonicalizes forms, case, and whitespace") {
    val df = Seq(
      "Café",        // decomposed e + combining acute
      "CafÉ",         // composed É (uppercase)
      "  A \t  Bº  ", // whitespace runs + masculine ordinal
      "ﬁne"           // ﬁ ligature survives NFC (not NFKC)
    ).toDF("s")
    val got = df.select(
      graft.plans.FastOps.normalizeText(col("s")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("café", "café", "a bº", "ﬁne"))
    // interpreted eval agrees with the codegen path
    assert(graft.plans.NormalizeTextExpr.normalize("Café") ==
      "café")
  }
}
