package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusSignals

/** The fused one-pass BigramStatsExpr must reproduce the exploded
  * groupBy formulation bit-for-bit, and the repetition-signals plan
  * must stay narrow (the whole point of fusing it). */
class CorpusSignalsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSession.spark

  private def docs = Tables(spark, "/root/testdata/sf0.001").documents

  test("zipfProfile: a hand corpus reads exact freqs at doubling " +
      "ranks with decay 0.5; real-corpus freq is non-increasing in " +
      "rank and decay replays") {
    import spark.implicits._
    // s1 freqs sorted: 8,4,4,2,1,1,1,1 -> rank1=8 r2=4 r4=2 r8=1
    val d = Seq(
      (1L, "a a a a a a a a b b b b c c c c d d e f g h", "s1"),
      (2L, "x x y", "s2"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis.zipfProfile(d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap
    assert(got(("s1", 1L)) == ((8L, -1.0)))
    assert(got(("s1", 2L)) == ((4L, 0.5)))
    assert(got(("s1", 4L)) == ((2L, 0.5)))
    assert(got(("s1", 8L)) == ((1L, 0.5)))
    assert(!got.contains(("s1", 16L))) // vocab is 8
    assert(got(("s2", 1L)) == ((2L, -1.0)))
    assert(got(("s2", 2L)) == ((1L, 0.5)))
    assert(!got.contains(("s2", 4L)))

    // real corpus: monotone non-increasing freq per source; decay is
    // the card's own freq(r)/freq(r/2) division, null only at rank 1
    val real = graft.operators.TextAnalysis.zipfProfile(docs).collect()
    real.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      byRank.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0).getLong(2) >= w(1).getLong(2))
      }
      val freqAt = byRank.map(r => r.getLong(1) -> r.getLong(2)).toMap
      byRank.foreach { r =>
        if (r.getLong(1) == 1L) assert(r.isNullAt(3))
        else assert(r.getDouble(3) ==
          r.getLong(2).toDouble / freqAt(r.getLong(1) / 2).toDouble)
      }
    }
  }

  test("essCard: identical docs give ess_frac ~ 1; one dominating " +
      "weight collapses it toward 1/n; card agrees with a driver " +
      "recomputation on the real corpus") {
    import spark.implicits._
    // src0 = target distribution; srcA docs identical (flat weights);
    // srcB has one doc stuffed with target-distinctive tokens
    val hand = (Seq(
      (0L, Seq.fill(30)("target").mkString(" "), "en", "src0", 0L),
      (10L, "plain words here", "en", "srcA", 0L),
      (11L, "plain words here", "en", "srcA", 0L),
      (12L, "plain words here", "en", "srcA", 0L),
      (20L, "target target target", "en", "srcB", 0L)) ++
      (21L to 29L).map(i => (i, "plain words here", "en", "srcB", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusSignals.essCard(hand).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5)))).toMap
    assert(math.abs(got("srcA")._3 - 1.0) < 1e-12)
    assert(got("srcB")._3 < 0.5,
      s"dominated source should collapse: ${got("srcB")}")
    assert(got("srcB")._2 > 1.0) // but more than one effective doc

    // real corpus: ESS in (0, n], frac in (0, 1]; driver recompute
    val w = CorpusSignals.importanceWeights(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("doc_id"), col("mean_ratio"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val real = CorpusSignals.essCard(docs).collect()
    real.foreach { r =>
      val (src, n, ess, frac) =
        (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5))
      val ws = w.filter(_._1 == src).sortBy(_._2).map(_._3)
      assert(ws.length == n)
      val s1 = ws.sum; val s2 = ws.map(x => x * x).sum
      assert(math.abs(ess - s1 * s1 / s2) < 1e-9 * ess)
      assert(frac > 0.0 && frac <= 1.0 + 1e-12)
    }
  }

  test("collocationCard: a planted collocation out-scores a pair of " +
      "independently-frequent words; the frequency floor holds") {
    import spark.implicits._
    // "new york" always adjacent (true collocation); "the" and "dog"
    // both frequent but adjacent only sometimes (chance co-occurrence)
    val hand = (0L until 12L).map { i =>
      (i, s"new york the cat dog the bird f$i dog the", "en", "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusSignals.collocationCard(hand, minCount = 5, k = 50)
      .collect()
    val score = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // counts: per doc "new york" 1x, "dog the" 2x; both pass minCount
    val ny = score(("new", "york")); val dt = score(("dog", "the"))
    // c12=12,c1=c2=12 for new/york vs c12=24,c1=24(dog),c2=36(the):
    // PMI ratio favors the exclusive pair
    assert(ny > dt, s"planted collocation $ny <= chance pair $dt")
    // hapax-ish pairs (every "f$i dog" appears once) are floored out
    assert(!score.keySet.exists(_._1.startsWith("f")))
    // exact evidence columns on the planted pair
    val nyRow = rows.find(r =>
      r.getString(0) == "new" && r.getString(1) == "york").get
    assert(nyRow.getLong(2) == 12L && nyRow.getLong(3) == 12L &&
      nyRow.getLong(4) == 12L)

    // real corpus: bounded, ordered, evidence consistent
    val real = CorpusSignals.collocationCard(docs).collect()
    assert(real.length <= 100)
    assert(real.forall(_.getLong(2) >= 5L))
    val ratios = real.map(_.getDouble(5))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
  }

  test("typeGrowthCard: hand-corpus cumulative counts are exact; the " +
      "real-corpus curve is monotone, ends at the full-corpus totals, " +
      "and fits a Heaps exponent in (0, 1)") {
    import spark.implicits._
    // doc_ids 0..9, text with controlled vocabulary growth: doc i
    // introduces one new type ("t<i>") plus repeats "x x"
    val hand = (0L to 9L)
      .map(i => (i, s"t$i x x", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = CorpusSignals.typeGrowthCard(hand).collect()
    assert(card.length == 10)
    // bounds are doc_id deciles of max_id=9: bound(c) = c*9 div 10
    // = 0,1,2,3,4,5,6,7,8,9 → checkpoint c covers docs 0..c-1... no:
    // covers doc_id <= bound(c); tokens 3/doc, types = docs + "x"
    card.foreach { r =>
      val c = r.getLong(0); val bound = r.getLong(1)
      assert(bound == c * 9 / 10)
      assert(r.getLong(2) == (bound + 1) * 3, s"tokens at c=$c")
      assert(r.getLong(3) == (bound + 1) + 1, s"types at c=$c")
    }

    // real corpus: monotone growth, final row = whole-corpus truth
    val real = CorpusSignals.typeGrowthCard(docs).collect()
    assert(real.length == 10)
    val toks = real.map(_.getLong(2)); val typs = real.map(_.getLong(3))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
    assert(typs.zip(typs.tail).forall { case (a, b) => a <= b })
    val totalToks = docs
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val totalTypes = docs
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(toks.last == totalToks && typs.last == totalTypes)
    // Heaps fit V = K n^beta: least squares on (ln n, ln V)
    def heapsBeta(tk: Array[Long], ty: Array[Long]): Double = {
      val xs = tk.map(t => math.log(t.toDouble))
      val ys = ty.map(t => math.log(t.toDouble))
      val n = xs.length; val mx = xs.sum / n; val my = ys.sum / n
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
    }
    // hand corpus genuinely grows one type per doc → beta strictly
    // inside (0, 1)
    val hb = heapsBeta(card.map(_.getLong(2)), card.map(_.getLong(3)))
    assert(hb > 0.0 && hb < 1.0, s"hand-corpus Heaps beta $hb")
    // the tiny synthetic corpus saturates its shared vocabulary early
    // (beta == 0 exactly when all types land in the first decile) —
    // sublinear is the invariant
    val rb = heapsBeta(toks, typs)
    assert(rb >= 0.0 && rb < 1.0, s"real-corpus Heaps beta $rb")
  }

  test("viterbiFertility: hand-corpus DP, and agreement with an " +
      "independent Scala shortest-path DP over the sf0.001 word types") {
    import spark.implicits._
    // "abab","cd","ab" are all whole-word vocab entries (every 2..4
    // gram fits under topK) -> each word segments into ONE piece
    val hand = Seq((0L, "abab abab cd", "en", "s1"),
      (1L, "cd cd ab", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val h = CorpusSignals.viterbiFertility(hand).collect()
    assert(h.length == 1)
    assert(h.head.getLong(1) == 6 && h.head.getLong(2) == 16 &&
      h.head.getLong(3) == 6) // n_words, n_chars, opt_pieces
    assert(h.head.getDouble(4) == 1.0 && h.head.getDouble(5) == 16.0 / 6)

    // independent reference on the real corpus: same vocab rule, same
    // DP, written as driver-side Scala over the collected word types
    val occ = docs.select(col("source"),
      explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cnt = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val gramCnt = collection.mutable.Map.empty[String, Long]
    cnt.foreach { case (w, c) =>
      for (l <- 1 to 4; i <- 0 to w.length - l)
        gramCnt.updateWith(w.substring(i, i + l))(
          v => Some(v.getOrElse(0L) + c))
    }
    val vocab = gramCnt.keysIterator.filter(_.length == 1).toSet ++
      gramCnt.toSeq.filter(_._1.length >= 2)
        .sortBy { case (g, c) => (-c, g) }.take(64).map(_._1)
    def dp(w: String): Long = {
      val m = Array.fill(w.length + 1)(Int.MaxValue / 2); m(0) = 0
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i)
        if (vocab(w.substring(j, i))) m(i) = math.min(m(i), m(j) + 1)
      m(w.length).toLong
    }
    val expect = occ.groupBy(_._1).view.mapValues { ws =>
      val words = ws.map(_._2)
      (words.length.toLong, words.map(_.length.toLong).sum,
        words.map(dp).sum)
    }.toMap
    val got = CorpusSignals.viterbiFertility(docs).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == e,
        s"source ${r.getString(0)} mismatch")
    }
  }

  test("vocabUtilization: hand greedy segmentation, dead pieces at 0, " +
      "char mass conserved; real-corpus greedy == a Scala reference") {
    import spark.implicits._
    // vocab = chars {a,b,c,d} + all 2..4-grams (under topK):
    // greedy("abab") = ["abab"], greedy("cd") = ["cd"] — whole words
    // win by longest-match; the 1-gram pieces are DEAD (uses 0)
    val hand = Seq((0L, "abab cd", "en", "s1"),
      (1L, "cd cd", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val h = CorpusSignals.vocabUtilization(hand).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(h("abab") == ((4L, 1L, 0.25)))
    assert(h("cd") == ((2L, 3L, 0.75)))
    assert(h("a") == ((1L, 0L, 0.0))) // dead char piece
    assert(h("ab")._2 == 0L) // shadowed by the longer match
    // char-mass conservation on the REAL corpus: every corpus char
    // lands in exactly one greedy piece
    val got = CorpusSignals.vocabUtilization(docs).collect()
    val pieceChars = got.map(r => r.getLong(2) * r.getLong(1)).sum
    val corpusChars = docs.select(explode(split(col("text"), " "))
      .as("w")).agg(sum(length(col("w")))).head.getLong(0)
    assert(pieceChars == corpusChars)
    // shares sum to 1 up to float association
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    // independent Scala greedy over the collected word types
    val occ = docs.select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0))
    val cnt = occ.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gramCnt = collection.mutable.Map.empty[String, Long]
    cnt.foreach { case (w, c) =>
      for (l <- 1 to 4; i <- 0 to w.length - l)
        gramCnt.updateWith(w.substring(i, i + l))(
          v => Some(v.getOrElse(0L) + c))
    }
    val vocab = gramCnt.keysIterator.filter(_.length == 1).toSet ++
      gramCnt.toSeq.filter(_._1.length >= 2)
        .sortBy { case (g, c) => (-c, g) }.take(64).map(_._1)
    def greedy(w: String): Seq[String] = {
      var p = 0; val out = collection.mutable.Buffer.empty[String]
      while (p < w.length) {
        val l = (math.min(4, w.length - p) to 1 by -1)
          .find(l => vocab(w.substring(p, p + l))).get
        out += w.substring(p, p + l); p += l
      }
      out.toSeq
    }
    val expect = collection.mutable.Map.empty[String, Long]
    cnt.foreach { case (w, c) =>
      greedy(w).foreach(pc =>
        expect.updateWith(pc)(v => Some(v.getOrElse(0L) + c)))
    }
    got.foreach { r =>
      assert(r.getLong(2) == expect.getOrElse(r.getString(0), 0L),
        s"piece ${r.getString(0)}")
    }
  }

  test("lengthDriftKs: hand CDFs read the exact D, identical " +
      "snapshots read 0, disjoint supports read 1") {
    import spark.implicits._
    def frame(ls: Seq[Long]) = ls.zipWithIndex
      .map { case (n, i) => (i.toLong, "s", n) }
      .toDF("doc_id", "source", "n_chars")
    val old4 = frame(Seq(10L, 20L, 30L, 40L))
    // new CDF jumps to .75 at 20 vs old .5 -> D = 0.25 exactly
    val r = CorpusSignals.lengthDriftKs(old4,
      frame(Seq(10L, 20L, 20L, 40L))).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((4L, 4L, 0.25)))
    assert(CorpusSignals.lengthDriftKs(old4, old4)
      .collect()(0).getDouble(3) == 0.0)
    assert(CorpusSignals.lengthDriftKs(old4,
      frame(Seq(100L, 200L))).collect()(0).getDouble(3) == 1.0)
  }

  test("windowedPmiCard: hand corpus ratios exact, distance-2 pairs " +
      "counted, adjacent-pair keys are a subset of q268's at the " +
      "same floor") {
    import spark.implicits._
    // five copies of "a b c" (pairs ab/ac/bc each x5 — ac is the
    // DISTANCE-2 pair q268 cannot see) + five of "x y"
    val hand = ((1 to 5).map(i => (i.toLong, "a b c")) ++
      (6 to 10).map(i => (i.toLong, "x y")))
      .toDF("doc_id", "text")
    val got = CorpusSignals.windowedPmiCard(hand).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    // tot_toks = 25, tot_slots = 20; every pair: c12=5, c1=c2=5 ->
    // ratio = 5*25*25 / (20*5*5) = 6.25 exactly
    assert(got.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")))
    got.values.foreach { case (c12, ratio) =>
      assert(c12 == 5L && ratio == 6.25)
    }
    // real corpus: every q268 adjacent pair at the count floor also
    // appears in the windowed pair space (canonicalized keys)
    val adj = CorpusSignals.collocationCard(docs, k = 1000).collect()
      .map(r => if (r.getString(0) <= r.getString(1))
        (r.getString(0), r.getString(1))
      else (r.getString(1), r.getString(0))).toSet
    val win = CorpusSignals.windowedPmiCard(docs, k = 100000).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(adj.subsetOf(win))
  }

  test("memorizationSpectrum: planted exposure levels land exactly; " +
      "T=2 mass equals the q135 per-doc coverage rolled up per source") {
    import spark.implicits._
    // s1: three docs share the verbatim 5-gram "a b c d e" (exposure
    // 3 -> counted at T=2, not at T=5/T=10); unique tails are
    // uncovered. s2: one doc, no repeated grams anywhere.
    val hand = Seq(
      (1L, "a b c d e u1 u2 u3 u4 u5", "en", "s1"),
      (2L, "a b c d e v1 v2 v3 v4 v5", "en", "s1"),
      (3L, "a b c d e w1 w2 w3 w4 w5", "en", "s1"),
      (4L, "z1 z2 z3 z4 z5 z6", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusSignals.memorizationSpectrum(hand).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // each s1 doc: positions 1..5 covered (the shared gram; grams
    // crossing into the unique tail have df 1) -> 15 of 30 tokens
    assert(got(("s1", 2L)) == ((30L, 15L, 0.5)))
    assert(got(("s1", 5L)) == ((30L, 0L, 0.0)))
    assert(got(("s1", 10L)) == ((30L, 0L, 0.0)))
    assert(got(("s2", 2L)) == ((6L, 0L, 0.0)))
    // real corpus: T=2 covered mass == q135's per-doc n_covered
    // rolled up by source (same gram set, same >= 2 cut)
    val perDoc = CorpusSignals.dupSpanCoverage(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = perDoc.toSeq.groupBy { case (id, _) => srcOf(id) }
      .view.mapValues(_.map(_._2).sum).toMap
    CorpusSignals.memorizationSpectrum(docs).collect()
      .filter(_.getLong(1) == 2L).foreach { r =>
        assert(r.getLong(3) == expect(r.getString(0)), r.toString)
      }
  }

  test("retrievalTriplets: positive is the best non-self BM25 hit, " +
      "negatives are the 6..8 band, margins are non-negative") {
    val trip = CorpusSignals.retrievalTriplets(docs).collect()
    assert(trip.nonEmpty)
    // independent reference: the q165 ranking with self filtered out
    val ref = CorpusSignals.bm25TopK(docs, k = 12).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.filter { case (q, d, _) => d != q })
      .toMap
    trip.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val expect = ref(qid) // already rank-ordered, self excluded
      val (posId, posScore) = (rows.head.getLong(1), rows.head.getDouble(2))
      assert(posId == expect.head._2 && posScore == expect.head._3,
        s"query $qid positive mismatch")
      assert(posId != qid)
      rows.foreach { r =>
        val (negRank, negId, negScore, margin) =
          (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
        assert(negRank >= 6 && negRank < 9)
        assert(negId != qid && negId != posId)
        // band index negRank-1 of the self-excluded reference ranking
        assert(negId == expect(negRank.toInt - 1)._2)
        assert(negScore <= posScore && margin == posScore - negScore)
      }
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(6L, 7L, 8L))
    }
  }

  test("releasePacking == the step-by-step stage composition; packed " +
      "token mass equals the kept docs' capped counts") {
    import graft.operators.{CorpusSignals, TextAnalysis}
    val composed = CorpusSignals.releasePacking(docs).collect()
    // the same three stages run separately, with intermediates forced
    val clean = CorpusSignals.curatedDocs(docs).localCheckpoint()
    val kept = TextAnalysis.sourceQuota(clean, 600L)
      .select(col("doc_id")).localCheckpoint()
    val stepwise = TextAnalysis.lengthBucketPacking(
      clean.join(kept, Seq("doc_id"), "left_semi")).collect()
    assert(composed.map(_.toSeq).toSeq == stepwise.map(_.toSeq).toSeq)
    // conservation: packed mass == Σ min(n_tokens, 512) over kept docs
    val massIndependent = clean.join(kept, Seq("doc_id"), "left_semi")
      .select(least(size(split(col("text"), " ")), lit(512)).cast("long")
        .as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(composed.map(_.getLong(4)).sum == massIndependent)
  }

  test("releasePacking from a MATERIALIZED clean corpus: quota+packing " +
      "over the lake artifact == the composed plan") {
    import graft.operators.{CorpusSignals, TextAnalysis}
    val dir = java.nio.file.Files
      .createTempDirectory("clean_corpus").toString
    CorpusSignals.curatedDocs(docs).write.mode("overwrite").parquet(dir)
    val cleanFromLake = spark.read.parquet(dir)
    val kept = TextAnalysis.sourceQuota(cleanFromLake, 600L)
      .select(col("doc_id"))
    val fromLake = TextAnalysis.lengthBucketPacking(
      cleanFromLake.join(kept, Seq("doc_id"), "left_semi"))
      .collect()
    val composed = CorpusSignals.releasePacking(docs).collect()
    assert(fromLake.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq)
  }

  test("BPE merge table round-trips through the lake: encode-from-loaded " +
      "== encode-from-trained") {
    import graft.operators.CorpusSignals
    val dir = java.nio.file.Files
      .createTempDirectory("bpe_merges").toString
    CorpusSignals.bpeTrainMerges(docs, nMerges = 10)
      .write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val fromLoaded = CorpusSignals
      .bpeEncodeWith(CorpusSignals.mergeTable(loaded), docs).collect()
    val fromTrained = CorpusSignals.bpeEncode(docs).collect()
    assert(fromLoaded.map(_.toSeq).toSeq == fromTrained.map(_.toSeq).toSeq)
  }

  test("sourceOverlapMinhash calibrates against the exact matrix: " +
      "clone estimates 1.0, MAE within the 1/sqrt(numPerms) band") {
    import graft.operators.CorpusSignals
    val base = docs.limit(50)
    // clone ONE source verbatim: (src0, srcCLONE) has identical gram
    // sets, so its exact Jaccard is 1.0 and its signatures are equal
    val clone = base.filter(col("source") === "src0")
      .withColumn("source", lit("srcCLONE"))
    val corpus = base.unionByName(clone)
    val exact = CorpusSignals.sourceOverlapMatrix(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = CorpusSignals.sourceOverlapMinhash(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // the union of originals IS the clone's gram set: any source pair
    // absent from the exact matrix simply has J = 0
    val errs = est.map { case (k, e) => math.abs(e - exact.getOrElse(k, 0.0)) }
    val mae = errs.sum / errs.size
    assert(mae <= 0.13, s"MAE $mae") // 1/sqrt(64) = 0.125
    assert(errs.max <= 0.40, s"max err ${errs.max}")
    // identical gram sets hash to identical signatures -> est exactly 1
    val one = est.filter { case ((a, b), _) =>
      exact.get((a, b)).contains(1.0) }
    assert(one.nonEmpty, "no J=1.0 pair — the clone construction broke")
    one.foreach { case (k, e) => assert(e == 1.0, s"$k est $e") }
    // the registered q243 card: full pair universe, exact jaccard
    // replays the matrix (0.0 for disjoint pairs), contract earned
    val card = CorpusSignals.sourceOverlapSketchCalibration(corpus)
      .collect()
    assert(card.length == est.size)
    card.foreach { r =>
      assert(r.getBoolean(3), r.toString)
      assert(r.getDouble(2) ==
        exact.getOrElse((r.getString(0), r.getString(1)), 0.0))
    }
  }

  test("bigram stats match the exploded groupBy form bit-for-bit") {
    val exploded = {
      val base = docs.select(col("doc_id"),
        split(col("text"), " ").as("t"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          size(array_distinct(col("t"))).cast("long").as("n_distinct"),
          expr("transform(sequence(1, size(t)-1), " +
            "i -> concat(element_at(t, i), ' ', element_at(t, i+1)))")
            .as("bgs"))
      val top = base
        .select(col("doc_id").as("bdoc"), explode(col("bgs")).as("b"))
        .groupBy(col("bdoc"), col("b")).agg(count(lit(1)).as("n"))
        .groupBy(col("bdoc"))
        .agg((max(col("n")).cast("double") / sum(col("n")).cast("double"))
          .as("top_bigram_frac"))
      base.join(top, base("doc_id") === top("bdoc"))
        .select(col("doc_id"), col("n_tokens"),
          ((col("n_tokens") - col("n_distinct")).cast("double") /
            col("n_tokens").cast("double")).as("dup_word_frac"),
          col("top_bigram_frac"))
    }
    val a = exploded.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val b = CorpusSignals.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(a.nonEmpty && a == b)
  }

  test("single-token docs have no bigrams and are dropped, not divided by zero") {
    import spark.implicits._
    val tiny = Seq((1L, "only"), (2L, "a a")).toDF("doc_id", "text")
    val got = CorpusSignals.repetitionSignals(tiny).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    assert(got.head.getDouble(2) == 0.5) // dup_word_frac of "a a"
    assert(got.head.getDouble(3) == 1.0) // its single bigram is the top one
  }

  test("repetition-signals plan has no exchange besides the final sort") {
    val plan = CorpusSignals.repetitionSignals(docs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
    assert(!plan.contains("Generate"), s"explode survived the fusion:\n$plan")
  }

  test("boilerplate fraction counts corpus-common 3-grams") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "a b c d"), // grams: "a b c", "b c d"
      (1L, "a b c x"),
      (2L, "a b c y"),
      (3L, "a b c z"),
      (4L, "a b c w"),
      (5L, "q r s t") // both grams unique to this doc
    ).toDF("doc_id", "text")
    val out = CorpusSignals.boilerplateFraction(tiny, minDf = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // "a b c" reaches df=5 (docs 0..4); every other gram is df=1
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5), (4L, 2L, 1L, 0.5), (5L, 2L, 0L, 0.0)))
  }

  test("dupSpanCoverage: a planted cross-doc span covers exactly its " +
    "positions; within-doc repeats alone do not count") {
    import spark.implicits._
    val tiny = Seq(
      // docs 1 & 2 share only the 5-gram "v w x y z" (disjoint
      // vocab otherwise): it covers its 5 token positions in each
      (1L, "a b c d e f v w x y z"),       // 11 tokens, tail covered
      (2L, "v w x y z p q r s t u"),       // 11 tokens, head covered
      (3L, "k l m n o kk ll mm nn oo"),    // unique text -> 0
      // the same 5-gram twice in ONE doc: df counts distinct docs,
      // so internal repetition is not "duplicate" coverage
      (4L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"),
      (5L, "one two")                       // <5 tokens: no grams, 0
    ).toDF("doc_id", "text")
    val out = CorpusSignals.dupSpanCoverage(tiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 11L, 5L, 5.0 / 11.0), (2L, 11L, 5L, 5.0 / 11.0),
      (3L, 10L, 0L, 0.0), (4L, 10L, 0L, 0.0), (5L, 2L, 0L, 0.0)))
  }

  test("curatedDocs: near-dup stage collapses planted near-dups and " +
    "leaves the exact path unchanged when disabled") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    // near-dup of base: only the LAST token differs (1 of 58 shingles)
    val alt = base.split(" ").dropRight(1).mkString(" ") + " zz"
    val contam = "c1 c2 e1 e2 e3 e4 e5 x1 x2"
    val uniq = (1 to 60).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, base, "src1", 300L),   // kept (min-id representative)
      (2L, alt, "src1", 300L),    // near-dup of 1: dropped iff enabled
      (3L, base, "src1", 300L),   // exact dup of 1: always dropped
      (4L, contam, "src1", 300L), // shares a 5-gram with eval: dropped
      (5L, uniq, "src1", 300L),   // kept
      (9L, "e1 e2 e3 e4 e5 e6 e7", "src0", 300L) // the eval doc
    ).toDF("doc_id", "text", "source", "n_chars")
    def ids(nearDup: Boolean): Set[Long] =
      CorpusSignals.curatedDocs(docs, nearDup = nearDup)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(nearDup = false) == Set(1L, 2L, 5L))
    assert(ids(nearDup = true) == Set(1L, 5L))
  }

  test("line dedup drops later occurrences and rewrites documents in order") {
    import spark.implicits._
    val l1 = "w1 w2 w3 w4 w5 w6 w7 w8"
    val l2 = "x1 x2 x3 x4 x5 x6 x7 x8"
    val l3 = "y1 y2 y3 y4 y5 y6 y7 y8"
    val docs = Seq((1L, s"$l1 $l2"), (2L, s"$l1 $l3"), (3L, l1))
      .toDF("doc_id", "text")
    val got = CorpusSignals.lineDedupRewrite(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, s"$l1 $l2"))) // first occurrences all kept
    assert(got(2L) == ((2L, 1L, l3)))         // shared line dropped, rest in order
    assert(got(3L) == ((1L, 0L, "")))         // everything dropped -> empty doc
  }

  test("line dedup keeps each distinct corpus line exactly once") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val kept = CorpusSignals.lineDedupRewrite(docs)
      .agg(sum(col("n_kept"))).head.getLong(0)
    val distinctLines = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(t)/8.0d) as int)-1), " +
          "i -> array_join(slice(t, i*8+1, 8), ' '))")).as("line"))
      .select(countDistinct(col("line"))).head.getLong(0)
    assert(kept == distinctLines && kept > 0)
  }

  test("BPE training reproduces the Sennrich merge sequence") {
    // the worked example of arXiv:1508.07909 §3.2 (no </w> marker):
    // {low:5, lower:2, newest:6, widest:3}. Pair counts give
    // (e,s)=9 tying (s,t)=9 -> lexicographic tie-break picks (e,s);
    // then (es,t)=9; then (l,o)=7 tying (o,w)=7 -> (l,o); then (lo,w).
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val corpus = Seq(text).toDF("text")
    val merges = CorpusSignals.bpeTrainMerges(corpus, nMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("BPE merge replace handles back-to-back pair occurrences") {
    // "a a a a" must merge to "aa aa" (greedy left-to-right), which is
    // exactly what the double-space encoding guarantees; a single-space
    // encoding would consume the shared boundary and produce "aa a a"
    import spark.implicits._
    val corpus = Seq("aaaa aaa").toDF("text")
    val merges = CorpusSignals.bpeTrainMerges(corpus, nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // round 1: (a,a) appears 3x in aaaa + 2x in aaa = 5 votes;
    // merged greedily: aaaa -> "aa aa", aaa -> "aa a".
    // round 2 pairs: (aa,aa)=1, (aa,a)=1 -> tie-break picks (aa,a)
    assert(merges == Seq((1, "a", "a", 5L), (2, "aa", "a", 1L)))
  }

  test("source overlap: a cloned source scores jaccard 1.0 against itself") {
    import spark.implicits._
    val base = docs.limit(50)
    val clone = base.withColumn("source", lit("srcCLONE"))
    val m = CorpusSignals.sourceOverlapMatrix(base.unionByName(clone))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5))
      .toMap
    // every original source s shares its whole gram set with the clone
    // superset, so J(s, clone) = |s| / |clone| and J in (0, 1]; the
    // clone vs the union of originals is exactly 1.0 only when one
    // original source covers everything -- instead assert the defining
    // identity on every emitted pair from the per-pair counts
    val rows = CorpusSignals.sourceOverlapMatrix(base.unionByName(clone))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, ni, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(j == ni.toDouble / (n1 + n2 - ni) && j > 0.0 && j <= 1.0)
    }
    // a source's grams are a subset of the clone's, so intersection
    // size equals the source's own set size for every (s, srcCLONE)
    val vsClone = rows.filter(_.getString(1) == "srcCLONE")
    assert(vsClone.nonEmpty)
    vsClone.foreach(r => assert(r.getLong(4) == r.getLong(2)))
    assert(m.values.forall(v => v > 0.0 && v <= 1.0))
  }

  test("token drift: TVD is 0 for identical and 1 for disjoint snapshots") {
    import spark.implicits._
    val a = Seq(("s", "x y z"), ("s", "x x")).toDF("source", "text")
    val same = CorpusSignals.tokenDrift(a, a).collect()
    assert(same.map(_.getDouble(2)).forall(_ == 0.0))
    val b = Seq(("s", "p q"), ("s", "r")).toDF("source", "text")
    val disjoint = CorpusSignals.tokenDrift(a, b).collect()
    assert(disjoint.map(_.getDouble(2)).forall(_ == 1.0))
    // hand case: old {x:3/5, y:1/5, z:1/5}, new {x:1/3, y:1/3, q:1/3}
    val c = Seq(("s", "x y q")).toDF("source", "text")
    val tvd = CorpusSignals.tokenDrift(a, c).head.getDouble(2)
    val expect = 0.5 * (math.abs(3.0 / 5 - 1.0 / 3) +
      math.abs(1.0 / 5 - 1.0 / 3) + 1.0 / 5 + 1.0 / 3)
    assert(math.abs(tvd - expect) < 1e-15)
  }

  test("BM25: self-retrieval wins, tf orders equal-length docs, " +
    "no-term docs never appear") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "zebra quark"), // the query doc: both terms, shortest
      (10L, "zebra zebra filler pad"), // tf(zebra)=2, dl=4
      (11L, "zebra filler filler pad"), // tf(zebra)=1, dl=4
      (12L, "pad pad pad pad")) // shares no query term
      .toDF("doc_id", "text")
    val got = CorpusSignals.bm25TopK(corpus, nQueries = 1, k = 10)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 0 matches both terms at dl=2; 10 beats 11 on tf saturation
    // at identical length; 12 has no matching term so it is absent
    assert(got == Seq((0L, 1L, 0L), (0L, 2L, 10L), (0L, 3L, 11L)))
  }

  test("BM25: rarer term outranks common term at equal tf and length") {
    import spark.implicits._
    // 'rare' df=2 (query + one doc); 'common' df=5
    val corpus = Seq(
      (0L, "rare common"),
      (10L, "rare pad pad"),
      (11L, "common pad pad"),
      (12L, "common x1 y1"),
      (13L, "common x2 y2"),
      (14L, "common x3 y3"))
      .toDF("doc_id", "text")
    val got = CorpusSignals.bm25TopK(corpus, nQueries = 1, k = 10)
      .filter(col("doc_id").isin(10L, 11L))
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(got(10L) < got(11L),
      s"rare-term doc ranked ${got(10L)} vs common-term ${got(11L)}")
  }

  test("bpeEncode applies learned merges greedily left-to-right") {
    import spark.implicits._
    // corpus: "ab" dominant -> merge 1 = (a,b); then (ab,ab)? counts:
    // 4x "abab", 3x "ab", 1x "cd". round1 pairs: (a,b) freq 4*2+3=11
    // top; round2: (ab,ab) 4 vs (c,d) 1 -> merge (ab,ab); round3 (c,d)
    val docs = Seq(
      (1L, "abab abab ab cd"),
      (2L, "abab abab ab ab")
    ).toDF("doc_id", "text")
    val merges = CorpusSignals.bpeTrainMerges(docs, nMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("a", "b"), ("ab", "ab"), ("c", "d")))
    val enc = CorpusSignals.bpeEncode(docs, nMerges = 3)
      .as[(Long, Int, String)].collect().map(r => r._1 -> r).toMap
    // abab -> [abab], ab -> [ab], cd -> [cd]
    assert(enc(1L) == ((1L, 4, "abab abab ab cd")))
    assert(enc(2L) == ((2L, 4, "abab abab ab ab")))
    // odd repetition: "ababab" = greedy left-to-right -> abab + ab
    val odd = Seq((3L, "ababab")).toDF("doc_id", "text")
    val encOdd = CorpusSignals.bpeEncode(odd, nMerges = 2)
      .as[(Long, Int, String)].collect()
    assert(encOdd.head == ((3L, 2, "abab ab")))
  }

  test("byte-level BPE (q352/q353): reference segmentation by hand — " +
      "space-crossing pieces learned (Ġ-prefixed), merges and encode " +
      "match the hand-computed GPT-2-style run, encode-from-loaded ≡ " +
      "encode-from-trained, and pieces round-trip to the original " +
      "text on the real corpus") {
    import spark.implicits._
    // "aa aa aa b": pre-tokens [aa, Ġaa, Ġaa, Ġb] (unit freqs aa:1,
    // Ġaa:2, Ġb:1). round1 pairs: (a,a) 1+2=3 top; round2: (Ġ,aa) 2;
    // round3: (Ġ,b) 1; then the pair table is empty -> training stops
    val hand = Seq((1L, "aa aa aa b")).toDF("doc_id", "text")
    val merges = CorpusSignals.byteBpeTrainMerges(hand, nMerges = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges.map(m => (m._2, m._3, m._4)) ==
      Seq(("a", "a", 3L), ("Ġ", "aa", 2L), ("Ġ", "b", 1L)),
      merges.toString)
    // the word tier structurally CANNOT learn these space-crossing
    // pieces — that is the byte tier's point
    assert(merges.exists(_._2 == "Ġ"))
    val enc = CorpusSignals.byteBpeEncode(hand, nMerges = 10)
      .as[(Long, Int, String)].collect().head
    assert(enc == ((1L, 4, "aa Ġaa Ġaa Ġb")), enc.toString)
    // encode-from-loaded ≡ encode-from-trained (the lake round trip)
    val dir = java.nio.file.Files
      .createTempDirectory("byte_bpe_merges").toString
    CorpusSignals.byteBpeTrainMerges(docs, nMerges = 10)
      .write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val fromLoaded = CorpusSignals
      .byteBpeEncodeWith(CorpusSignals.mergeTable(loaded), docs)
      .collect().map(_.toSeq)
    val fromTrained = CorpusSignals.byteBpeEncode(docs).collect()
      .map(_.toSeq)
    assert(fromLoaded.toSeq == fromTrained.toSeq)
    // WHITESPACE FAITHFULNESS on the real corpus: concatenating a
    // doc's pieces (drop the separators, map Ġ back to space)
    // reproduces the original text byte-for-byte — the property the
    // GPT-2 byte tier has and a word tokenizer does not
    val texts = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    fromTrained.foreach { r =>
      val id = r(0).asInstanceOf[Long]
      val pieces = r(2).asInstanceOf[String]
      val rebuilt = pieces.split(" ").mkString("").replace('Ġ', ' ')
      assert(rebuilt == texts(id), s"doc $id does not round-trip")
    }
  }

  test("epoch build: dedup and decontamination precede the mixture") {
    import spark.implicits._
    // per-doc pads (clear minChars without sharing 5-grams across docs)
    def pad(p: String) = (1 to 60).map(i => s"$p$i").mkString(" ")
    val dupText = s"alpha beta ${pad("a")}"
    val docs = Seq(
      (0L, "src0", s"e1 e2 e3 e4 e5 ${pad("z")}"), // eval doc (excluded)
      (1L, "srcA", dupText),
      (2L, "srcA", dupText),                       // exact dup -> drops
      (3L, "srcA", s"e1 e2 e3 e4 e5 ${pad("b")}"), // contaminated -> drops
      (4L, "srcB", s"delta epsilon ${pad("c")}")
    ).map { case (id, src, tx) => (id, src, tx, tx.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val epoch = CorpusSignals.epochMixture(CorpusSignals.curatedDocs(docs))
      .as[(Long, String, Long)].collect()
    val ids = epoch.map(_._1).toSet
    // survivors are exactly {1, 4}: 0 is eval, 2 deduped, 3 contaminated
    assert(ids.subsetOf(Set(1L, 4L)) && ids.nonEmpty)
    assert(!ids.contains(2L) && !ids.contains(3L) && !ids.contains(0L))
  }

  test("epochMixture: temperature targets, md5 remainder, repeats explode") {
    import spark.implicits._
    // sizes 4 and 1 -> weights 2/3, 1/3 of total 5:
    // tgt(a) = floor(10/3) = 3 of 4 docs (one drops out, md5-ranked),
    // tgt(b) = floor(5/3) = 1 -> the single doc keeps one copy
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("doc_id", "source")
    val got = CorpusSignals.epochMixture(docs)
      .as[(Long, String, Long)].collect()
    assert(got.count(_._2 == "a") == 3 && got.count(_._2 == "b") == 1)
    // every emitted (doc, copy) run is contiguous from 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length)) }
    // over-sampling: a tiny source against a big one repeats docs
    val skewed = ((1L to 60L).map(i => (i, "big")) :+ (1000L, "tiny"))
      .toDF("doc_id", "source")
    val copies = CorpusSignals.epochMixture(skewed)
      .as[(Long, String, Long)].collect()
      .filter(_._2 == "tiny").map(_._3)
    // weight(tiny) = 1/(1+sqrt(60)) ~ 0.114 of 61 rows -> ~6 copies
    assert(copies.length > 1 &&
      copies.sorted.sameElements(1L to copies.length))
    // deterministic: same input, same epoch
    val again = CorpusSignals.epochMixture(docs)
      .as[(Long, String, Long)].collect()
    assert(got.sorted.sameElements(again.sorted))
    // the rank window is bucketed per (source, md5-byte) — never one
    // task per source
    val plan = CorpusSignals.epochMixture(docs)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(source"), plan)
    assert(plan.contains("rb"), plan)
  }

  test("importanceWeights: target-like raw docs outrank raw-like ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src0", "alpha beta alpha beta gamma"),  // target slice
      (1L, "src1", "alpha beta gamma alpha beta"),  // target vocabulary
      (2L, "src1", "delta epsilon zeta delta eta"), // raw-only vocabulary
      (3L, "src1", "delta epsilon zeta eta theta")
    ).toDF("doc_id", "source", "text")
    val got = CorpusSignals.importanceWeights(docs)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // doc 1 uses the words the target slice over-represents
    assert(got(1L)._4 > got(2L)._4 && got(1L)._4 > got(3L)._4)
    // the score is the occurrence sum: n_tokens * mean
    got.values.foreach { case (_, n, score, mean) =>
      assert(math.abs(score - n * mean) < 1e-9 * math.abs(score)) }
  }

  test("contaminationPerDoc batch form equals the join-form contamination") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val perDoc = CorpusSignals.contaminationPerDoc(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"))
      .orderBy("doc_id").collect().toSeq
    val joined = CorpusSignals.contamination(docs)
      .collect().toSeq
    assert(perDoc == joined)
    assert(perDoc.nonEmpty)
  }

  test("curationFunnel: monotone attrition, last stage equals curatedDocs") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val f = CorpusSignals.curationFunnel(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(f.map(x => (x._1, x._2)).toSeq == Seq(
      (0, "raw"), (1, "quality_gate"), (2, "exact_dedup"),
      (3, "decontaminated")))
    // docs and chars can only shrink down the funnel
    assert(f.sliding(2).forall { case Array(a, b) =>
      b._3 <= a._3 && b._4 <= a._4 })
    // the funnel's last stage IS the curated survivor set
    val curated = CorpusSignals.curatedDocs(docs)
    assert(f.last._3 == curated.count())
    assert(f.last._4 ==
      curated.agg(sum(col("n_chars"))).head.getLong(0))
    assert(f.head._3 > f.last._3) // the test corpus actually attrits
  }

  test("per-source funnel sums to the corpus funnel at every stage") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val whole = CorpusSignals.curationFunnel(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val bySrc = CorpusSignals.curationFunnelBySource(docs).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view
      .mapValues(rows => (rows.map(_._2).sum, rows.map(_._3).sum)).toMap
    assert(bySrc == whole)
    // per-source attrition is monotone too
    val perSource = CorpusSignals.curationFunnelBySource(docs).collect()
      .map(r => (r.getString(2), r.getInt(0), r.getLong(3)))
      .groupBy(_._1)
    perSource.values.foreach { rows =>
      val byStage = rows.sortBy(_._2).map(_._3).toSeq
      assert(byStage.sliding(2).forall {
        case Seq(a, b) => b <= a
        case _ => true
      })
    }
  }

  test("releaseCard: every stat verifiable by hand on a planted corpus") {
    import spark.implicits._
    val good = "the quick brown foxes moved softly over damp grass " +
      "while small birds called from leafy trees before early light " +
      "faded away"
    val docs = Seq(
      // eval side (excluded from the card's counts)
      (0L, "held out benchmark question words here", "en", "src0"),
      // train: a gopher-keeping doc, twice (one exact dup)
      (1L, good, "en", "src1"),
      (2L, good, "en", "src1"),
      // contaminated: contains the eval 5-gram verbatim
      (3L, "prefix held out benchmark question words here suffix",
        "fr", "src2"),
      // too short -> gopher drops it
      (4L, "the cat sat", "en", "src2")
    ).toDF("doc_id", "text", "lang", "source")
    val r = CorpusSignals.releaseCard(docs).head()
    assert(r.getLong(0) == 4)                      // n_docs
    val nTokens = Seq(good, good,
      "prefix held out benchmark question words here suffix",
      "the cat sat").map(_.split(" ").length.toLong).sum
    assert(r.getLong(1) == nTokens)                // n_tokens
    assert(r.getLong(2) == 2 && r.getLong(3) == 2) // n_langs, n_sources
    assert(r.getLong(4) == 1)                      // n_exact_dups
    assert(r.getLong(5) == 1)                      // n_contaminated (doc 3)
    assert(r.getLong(6) == 2)                      // n_gopher_keep (1 and 2)
  }

  test("lang-keyed epoch mixture up-weights the low-resource language") {
    import spark.implicits._
    // 96 docs of "hi", 4 of "lo": n^0.5 temperature gives lo a
    // weight share of sqrt(4)/(sqrt(96)+sqrt(4)) ~ 0.17 of the epoch
    // vs its raw 0.04 — every lo doc repeats, hi docs thin out
    val docs = ((1L to 96L).map(i => (i, s"t$i", "hi")) ++
      (97L to 100L).map(i => (i, s"t$i", "lo")))
      .toDF("doc_id", "text", "lang")
    val epoch = CorpusSignals.epochMixture(docs, keyCol = "lang")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val loShare = epoch("lo").toDouble / (epoch("hi") + epoch("lo"))
    assert(loShare > 0.1 && loShare < 0.3, s"lo share $loShare")
    assert(epoch("lo") >= 4 * 3) // each lo doc at least tripled
    // and the source-keyed default is untouched machinery: same rows
    // as keying on a constant-renamed copy of the column
    val viaSource = CorpusSignals.epochMixture(
      docs.withColumnRenamed("lang", "source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaLang = CorpusSignals.epochMixture(docs, keyCol = "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSource == viaLang)
    // non-string mixing keys work (cast once inside the operator):
    // an INT cluster id keys the same machinery
    val intKeyed = docs.withColumn("cl",
      when(col("lang") === "lo", 1).otherwise(0))
    val viaInt = CorpusSignals.epochMixture(intKeyed, keyCol = "cl")
      .groupBy("cl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaInt("1") == epoch("lo") && viaInt("0") == epoch("hi"))
  }

  test("intraDocLineDedup collapses repeats INSIDE a doc, scope is one row") {
    import spark.implicits._
    val l1 = "a b c d e f g h"
    val l2 = "p q r s t u v w"
    val docs = Seq(
      (1L, s"$l1 $l2 $l1"), // line repeated within the doc
      (2L, l1),             // same line in ANOTHER doc — must survive
      (3L, "x y")           // short doc: one partial line
    ).toDF("doc_id", "text")
    val got = CorpusSignals.intraDocLineDedup(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 2L, s"$l1 $l2")))
    assert(got(2L) == ((1L, 1L, l1))) // cross-doc repeat untouched (q138's job)
    assert(got(3L) == ((1L, 1L, "x y")))
  }

  test("intraDocLineDedup keeps the FIRST occurrence in document order") {
    import spark.implicits._
    val l1 = "a b c d e f g h"
    val l2 = "p q r s t u v w"
    val got = CorpusSignals.intraDocLineDedup(
      Seq((1L, s"$l2 $l1 $l2")).toDF("doc_id", "text")).collect()
    assert(got.head.getString(3) == s"$l2 $l1")
  }

  test("intraDocLineDedup is a pure projection: no hash shuffle in the plan") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = CorpusSignals.intraDocLineDedup(docs)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the presentation sort's range
    // partitioning — the rewrite itself must never shuffle
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("sourceNoveltyCurve: hand corpus novelty and cumulative counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "1 2 3 4 5 6", "srcA"), // grams {1-5, 2-6}: both new
      (2L, "2 3 4 5 6 7", "srcB"), // {2-6 seen in A, 3-7 new}
      (3L, "1 2 3 4 5", "srcC")    // {1-5 seen} — nothing new
    ).toDF("doc_id", "text", "source")
    val got = CorpusSignals.sourceNoveltyCurve(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(got.toSeq == Seq(
      "srcA" -> ((2L, 2L, 2L, 1.0)),
      "srcB" -> ((2L, 1L, 3L, 0.5)),
      "srcC" -> ((1L, 0L, 3L, 0.0))))
  }

  test("sourceNoveltyCurve counts grams once per source, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "1 2 3 4 5", "srcA"),
      (2L, "1 2 3 4 5", "srcA"), // duplicate within the source: one gram
      (3L, "too short", "srcA")  // < 5 tokens: contributes nothing
    ).toDF("doc_id", "text", "source")
    val got = CorpusSignals.sourceNoveltyCurve(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == (("srcA", 1L, 1L, 1L, 1.0)))
  }

  test("bpeFertility: per-source rollup agrees with a direct " +
      "recomputation from the encode; every word is >= 1 piece") {
    import spark.implicits._
    val in = Seq(
      // srcA repeats one word everywhere -> its chars get merged into
      // few pieces; srcB is all rare words -> stays fragmented
      (1L, "aaaa aaaa aaaa aaaa", "srcA", 19L),
      (2L, "aaaa aaaa aaaa", "srcA", 14L),
      (3L, "qfxzv wkjnm aabbc ddeef", "srcB", 23L),
      (4L, "ppqrs ttuuv wwxxy zzabc", "srcB", 23L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = CorpusSignals.bpeFertility(in).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val enc = CorpusSignals.bpeEncode(in).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expA = (enc(1L) + enc(2L)).toLong
    val expB = (enc(3L) + enc(4L)).toLong
    assert(got("srcA") == ((2L, 7L, expA, 33L,
      expA.toDouble / 7, 33.0 / expA)))
    assert(got("srcB") == ((2L, 8L, expB, 46L,
      expB.toDouble / 8, 46.0 / expB)))
    // fertility >= 1 (a word is at least one piece), and the repeated
    // word merges further than the rare ones
    assert(got.values.forall(_._5 >= 1.0))
    assert(got("srcA")._5 < got("srcB")._5)
  }

  test("budgetWaterfill: hand-solved cap, small sources survive whole") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    // totals: A=10, B=20, C=100; budget = 130 div 2 = 65
    // sorted asc: S1=10+2*10=30, S2=30+20=50, S3=130 -> kstar=2,
    // pstar=30, cap=(65-30) div 1 = 35
    val in = Seq(
      (1L, words("a", 10), "srcA"),
      (2L, words("b", 20), "srcB"),
      (3L, words("c", 100), "srcC")
    ).toDF("doc_id", "text", "source")
    val got = CorpusSignals.budgetWaterfill(in).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("srcA") == ((10L, 10L, false, 35L, 65L)))
    assert(got("srcB") == ((20L, 20L, false, 35L, 65L)))
    assert(got("srcC") == ((100L, 35L, true, 35L, 65L)))
  }

  test("budgetWaterfill: cap is maximal-feasible on the real corpus; " +
      "full budget allocates everything") {
    val got = CorpusSignals.budgetWaterfill(docs).collect()
    assert(got.nonEmpty)
    val budget = got.head.getLong(5)
    val cap = got.head.getLong(4)
    val ns = got.map(_.getLong(1))
    // feasible at C, infeasible at C+1 (maximality), allocs consistent
    assert(ns.map(n => math.min(n, cap)).sum <= budget)
    assert(ns.map(n => math.min(n, cap + 1)).sum > budget)
    assert(got.forall(r => r.getLong(2) == math.min(r.getLong(1), cap)))
    assert(got.forall(r => r.getBoolean(3) == (r.getLong(1) > cap)))
    // budgetDen = 1: budget >= total, nobody capped
    val full = CorpusSignals.budgetWaterfill(docs, budgetDen = 1L)
      .collect()
    assert(full.forall(r => r.getLong(2) == r.getLong(1) &&
      !r.getBoolean(3)))
  }

  test("cleaningImpactCard: every stat hand-verifiable on a planted " +
      "corpus") {
    import spark.implicits._
    val a = "g1 g2 g3 g4 g5 f1 f2 f3 f4 f5"        // 10 tokens
    val l8 = "x1 x2 x3 x4 x5 x6 x7 x8"              // one 8-token line
    val in = Seq(
      (100L, "g1 g2 g3 g4 g5 e1 e2", "src0"),       // eval: 7 tokens
      (1L, a, "src1"),                               // contaminated
      (2L, a, "src1"),                               // exact dup of 1
      (3L, s"$l8 $l8", "src1")                       // intra-doc repeat
    ).toDF("doc_id", "text", "source")
    val r = CorpusSignals.cleaningImpactCard(in).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getLong(5)) ==
      ((4L, 43L, 1L, 1L, 1L, 2L)))
  }

  test("contaminationBySource: rates hand-checked per source, eval " +
      "source absent") {
    import spark.implicits._
    val gram = "g1 g2 g3 g4 g5"
    val in = Seq(
      (100L, s"$gram extra words", "src0"),      // eval
      (1L, s"$gram f1 f2 f3", "srcA"),           // contaminated
      (2L, "c1 c2 c3 c4 c5 c6", "srcA"),         // clean
      (3L, "d1 d2 d3 d4 d5 d6", "srcB")          // clean source
    ).toDF("doc_id", "text", "source")
    val got = CorpusSignals.contaminationBySource(in).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == Set("srcA", "srcB"))
    assert(got("srcA") == ((2L, 1L, 0.5)))
    assert(got("srcB") == ((1L, 0L, 0.0)))
  }

  test("contaminationBlastRadius: gram-hit docs at hop 0, their " +
      "near-dups at hop 1, unrelated docs absent") {
    import spark.implicits._
    val gram = "g1 g2 g3 g4 g5"
    val fill = (1 to 12).map("f" + _).mkString(" ")
    val in = Seq(
      (100L, s"$gram extra words here", "src0"),   // eval doc
      (1L, s"$gram $fill", "src1"),                // hop 0: shares gram
      (2L, s"gX g2 g3 g4 g5 $fill", "src1"),       // hop 1: near-dup of 1
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8", "src1")      // unrelated
    ).toDF("doc_id", "text", "source")
    val got = CorpusSignals.contaminationBlastRadius(in).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L)
    assert(got(2L) == 1L)
    assert(!got.contains(3L) && !got.contains(100L))
    // hop-0 set IS the q92 contamination set
    val seeds = CorpusSignals.contamination(in).collect()
      .map(_.getLong(0)).toSet
    assert(got.filter(_._2 == 0L).keySet == seeds)
  }

  test("leakageSafeSplit burns train-twinned eval docs into train; " +
      "clean docs keep their split") {
    import spark.implicits._
    val fam = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val lone = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"
    val probe = (1L to 60L).map(i => (i, fam)).toDF("doc_id", "text")
    val split = CorpusSignals.datasetSplit(probe).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val bySplit = split.toSeq.groupBy(_._2)
      .map { case (s, xs) => s -> xs.map(_._1).sorted }
    assert(bySplit.contains("train"))
    // family: one train twin + eval twins (must burn); plus a lone
    // eval doc with its own text (must keep its split)
    val famIds = (bySplit("train").take(1) ++
      bySplit.filter(_._1 != "train").values.flatMap(_.take(2))).toSeq
    val loneId = bySplit.filter(_._1 != "train").values.head.last
    assert(!famIds.contains(loneId))
    val in = (famIds.map(i => (i, fam)) :+ ((loneId, lone)))
      .toDF("doc_id", "text")
    val got = CorpusSignals.leakageSafeSplit(in).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(got.keySet == (famIds :+ loneId).toSet)
    famIds.foreach { i =>
      assert(got(i)._1 == "train", s"doc $i must end in train")
      assert(got(i)._2 == (split(i) != "train"))
    }
    assert(got(loneId) == ((split(loneId), false)))
  }

  test("waterfillSample ships uncapped sources whole and a stable " +
      "near-allocation slice of capped ones") {
    import spark.implicits._
    val doc = "t1 t2 t3 t4 t5" // 5 tokens
    // big: 400 docs = 2000 tokens; small: 10 docs = 50 tokens
    // budget 1025 -> cap 975: small uncapped, big rate 0.4875
    val in = ((1L to 400L).map(i => (i, doc, "big")) ++
      (1001L to 1010L).map(i => (i, doc, "small")))
      .toDF("doc_id", "text", "source")
    val got = CorpusSignals.waterfillSample(in).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = got.groupBy(_._2)
    // uncapped source ships every doc (bucket < 10^6 strictly)
    assert(bySrc("small").map(_._1).toSet == (1001L to 1010L).toSet)
    // capped source lands near its 975-token allocation (±5 sigma of
    // the binomial keep process, sigma ~ 50 tokens)
    val bigTokens = bySrc("big").map(_._3).sum
    assert(bigTokens > 975 - 250 && bigTokens < 975 + 250,
      s"big kept $bigTokens tokens vs 975 allocated")
    // deterministic: a rerun is identical
    val again = CorpusSignals.waterfillSample(in).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("splitLeakage reports exactly the cross-split near-dup pairs") {
    import spark.implicits._
    // identical docs -> every pair is a perfect near-dup; which pairs
    // LEAK is decided by the md5 split the operator replays. Family
    // kept BELOW the df cap (20) so its grams stay in the term space,
    // with ids picked to land in more than one split.
    val fam = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val probe = (1L to 60L).map(i => (i, fam)).toDF("doc_id", "text")
    val bySplit = CorpusSignals.datasetSplit(probe).collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).sorted }
    assert(bySplit.size > 1)
    // ≤ 12 docs total: grams have df ≤ 12 ≤ maxDf
    val ids = bySplit.values.flatMap(_.take(4)).toSeq.sorted
    val split = CorpusSignals.datasetSplit(probe).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val in = ids.map(i => (i, fam)).toDF("doc_id", "text")
    val got = CorpusSignals.splitLeakage(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4)))
    val expect = (for {
      a <- ids; b <- ids if a < b && split(a) != split(b)
    } yield (a, b, split(a), split(b), 1.0)).toSeq
    assert(got.toSeq.sorted == expect.sorted && expect.nonEmpty)
  }

  test("splitLeakage: same-split near-dups are NOT leaks") {
    val got = CorpusSignals.splitLeakage(docs).collect()
    assert(got.forall(r => r.getString(2) != r.getString(3)))
    // and every leak is a genuine q202 pair
    val pairs = graft.operators.TextAnalysis.sparseCosinePairs(docs)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(r => pairs.contains((r.getLong(0), r.getLong(1)))))
  }

  test("vocabCoverage: hand-computed spectrum and cumulative coverage") {
    import spark.implicits._
    // counts: a=3 b=2 c=1 -> spectrum (3,1) (2,1) (1,1), 6 tokens
    val in = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = CorpusSignals.vocabCoverage(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (3L, 1L, 1L, 3L, 0.5),
      (2L, 1L, 2L, 5L, 5.0 / 6),
      (1L, 1L, 3L, 6L, 1.0)))
  }

  test("vocabCoverage: full curve ends at coverage 1 over the corpus " +
      "vocab; coverage monotone as the cut loosens") {
    val got = CorpusSignals.vocabCoverage(docs).collect()
    assert(got.nonEmpty)
    val last = got.last
    assert(last.getLong(0) == got.map(_.getLong(0)).min)
    assert(last.getDouble(4) == 1.0)
    val cov = got.map(_.getDouble(4)).toSeq
    assert(cov == cov.sorted, "coverage must grow as min_count drops")
    // vocab_size at the loosest cut = total distinct tokens
    val types = docs.select(explode(split(col("text"), " "))).distinct()
      .count()
    assert(last.getLong(2) == types)
  }

  test("dupFlowMatrix: hand corpus — pairwise shared groups and doc mass") {
    import spark.implicits._
    // fp X lives in A(x2), B(x1); fp Y in B(x1), C(x2); fp Z only in A
    val in = Seq(
      (1L, "x x", "A"), (2L, "x x", "A"), (3L, "x x", "B"),
      (4L, "y", "B"), (5L, "y", "C"), (6L, "y", "C"),
      (7L, "z", "A")).toDF("doc_id", "text", "source")
    val got = CorpusSignals.dupFlowMatrix(in).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("A", "B", 1L, 2L, 1L), ("B", "C", 1L, 1L, 2L)))
  }

  test("dupFlowMatrix: no cross-source duplicates -> empty matrix") {
    import spark.implicits._
    val in = Seq((1L, "a", "A"), (2L, "a", "A"), (3L, "b", "B"))
      .toDF("doc_id", "text", "source")
    assert(CorpusSignals.dupFlowMatrix(in).count() == 0)
  }

  test("epochAwareAllocation: tiered solve on a hand corpus") {
    import spark.implicits._
    // big: 64 tokens (share 64/78 -> r_cap 1); small: 8 tokens
    // (8*16=128 > 78, 8*8=64 < 78 -> r_cap 2); tiny: 6 tokens
    // (6*16=96 > 78, 6*8=48 < 78 -> r_cap 2).
    // total 78, budget = 78*5 div 2 = 195.
    // tiers: k1 cap 78, k2 cap 14 -> cum 78, 92. f = 2, rem = 103,
    // marginal tier 3 has NO capacity (mcap 0) -> no marginal.
    def words(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")
    val in = Seq(
      (1L, words("b", 64), "big"),
      (2L, words("s", 8), "small"),
      (3L, words("t", 6), "tiny")).toDF("doc_id", "text", "source")
    val got = CorpusSignals.epochAwareAllocation(in).collect()
      .map(r => r.getString(0) -> (r.getInt(2), r.getInt(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    // (r_cap, full_epochs, marginal, alloc, effective_x8)
    assert(got("big") == (1, 1, 0L, 64L, 64L * 8))
    assert(got("small") == (2, 2, 0L, 16L, 8L * 12))
    assert(got("tiny") == (2, 2, 0L, 12L, 6L * 12))
  }

  test("epochAwareAllocation: marginal tier splits proportionally and " +
      "stays within budget and caps") {
    import graft.operators.CorpusSignals
    val got = CorpusSignals.epochAwareAllocation(docs).collect()
    assert(got.nonEmpty)
    val budget = got.head.getLong(7)
    val totalAlloc = got.map(_.getLong(5)).sum
    // never over-spends; under-spends at most the floor crumbs + any
    // capacity shortfall
    assert(totalAlloc <= budget)
    got.foreach { r =>
      val (n, rCap, full, marginal, alloc) = (r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getLong(5))
      assert(alloc <= rCap.toLong * n, s"${r.getString(0)} over its cap")
      assert(full <= rCap && marginal >= 0)
      // marginal only funds the tier AFTER the fully-funded ones
      if (marginal > 0) assert(full < rCap)
    }
    // determinism
    val again = CorpusSignals.epochAwareAllocation(docs).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("epochScheduleSample realizes the q250 allocation") {
    import graft.operators.CorpusSignals
    val alloc = CorpusSignals.epochAwareAllocation(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(3), r.getLong(4)))
      .toMap // source -> (n_tokens, full_epochs, marginal_alloc)
    val sched = CorpusSignals.epochScheduleSample(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val docsBySource = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    alloc.foreach { case (s, (nTok, full, marginal)) =>
      val mine = sched.filter(_._3 == s)
      // epochs 1..full carry the WHOLE source
      (1 to full).foreach { k =>
        assert(mine.count(_._1 == k) == docsBySource(s), s"$s epoch $k")
      }
      // the marginal tier exists iff funded, and only at epoch full+1
      val margRows = mine.filter(_._1 == full + 1)
      assert(mine.forall(_._1 <= full + 1), s)
      if (marginal == 0) assert(margRows.isEmpty, s)
      else {
        // expected kept token mass == marginal allocation (the q229
        // 5-sigma band: Bernoulli at rate marginal/nTok over tokens)
        val margIds = margRows.map(_._2).toSet
        val kept = docs.filter(col("source") === s)
          .filter(col("doc_id").isin(margIds.toSeq: _*))
          .select(sum(size(split(col("text"), " ")).cast("long")))
          .head().getLong(0)
        val p = marginal.toDouble / nTok
        val sigma = math.sqrt(nTok * p * (1 - p)) *
          (nTok.toDouble / docsBySource(s)) // doc-sized steps
        assert(math.abs(kept - marginal) <= 5 * sigma + 1,
          s"$s kept=$kept marginal=$marginal sigma=$sigma")
      }
    }
    // (epoch, doc_id) is unique — a doc is read once per epoch
    assert(sched.map(t => (t._1, t._2)).distinct.length == sched.length)
    // determinism
    val again = CorpusSignals.epochScheduleSample(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(again.toSeq == sched.toSeq)
  }
}
