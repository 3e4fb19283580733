package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-pair loops of the
  * similarity/dedup operators.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) and array
  * set ops (`array_intersect`) are interpreted / allocate per element,
  * which dominates wall-clock once an operator evaluates them millions
  * of times (all-pairs similarity). These expressions generate tight
  * Java loops inside whole-stage codegen instead — same semantics,
  * orders of magnitude less overhead. Preference order per SURVEY.md
  * §7.3: compose built-ins first, custom Expression only where the
  * benchmark demands — these two earned it.
  */

/** Σ aᵢ·bᵢ over two numeric arrays, accumulated in double left-to-right
  * — bit-identical to the `aggregate(zip_with(...))` fold it replaces
  * (and to the term-expanded oracle SQL). Null-safe per
  * BinaryExpression; null elements are not expected (inputs are dense
  * vectors). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private def getter(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two LEXICOGRAPHICALLY SORTED, de-duplicated string
  * arrays via a single merge pass — replaces `size(array_intersect)`
  * which builds a hash set per evaluation. Sorting is done once per
  * row upstream (array_sort), turning every pairwise evaluation into
  * O(|A|+|B|) comparisons with zero allocation. */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_size expects array<string> inputs")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct, lexicographically sorted word n-gram shingles of a
  * space-separated text, built in one pass — replaces an interpreted
  * split→transform→slice→concat_ws→array_distinct→array_sort chain
  * that dominated the shingling stage. Texts with fewer than n tokens
  * collapse to a single whole-text shingle (same contract as
  * TextFunctions.shingles). CodegenFallback-style eval is fine here:
  * one call per document does ~100 shingles of work, so per-call
  * dispatch overhead is noise. */
case class SortedShinglesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_shingles expects a string input")

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val toks = text.split(space, -1)
    val set = new java.util.TreeSet[UTF8String]()
    if (toks.length < n) set.add(text)
    else {
      var i = 0
      val window = new Array[UTF8String](n)
      while (i + n <= toks.length) {
        var j = 0
        while (j < n) { window(j) = toks(i + j); j += 1 }
        set.add(UTF8String.concatWs(space, window: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      set.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Jaccard similarity of two LEXICOGRAPHICALLY SORTED, de-duplicated
  * string arrays in ONE merge pass: |A∩B| / (|A|+|B|-|A∩B|) with the
  * intersect counted once. The composed form
  * `intersect / (sizes - intersect)` plants TWO SortedIntersectSizeExpr
  * nodes; when Catalyst pushes a jaccard threshold into a join
  * condition (exactly what happens in the q26 bucket join) each
  * candidate pair then pays the merge twice — this expression makes
  * the pushed-down predicate single-pass. Division and comparison are
  * IEEE-exact, so results are bit-identical to the composed form. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_jaccard expects array<string> inputs")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c.toDouble / (na + nb - c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = (double) $c / ($na + $nb - $c);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-document repetition statistics in ONE local pass: token count,
  * distinct-token count, the highest bigram multiplicity, and the
  * bigram total. The compositional form (explode bigrams → groupBy
  * (doc, bigram) → max/sum) shuffles O(tokens) rows for what is a
  * strictly row-local computation — with this expression the
  * repetition-signals query is a narrow projection and the only
  * exchange left is the presentation sort. Returns a 4-int struct;
  * all downstream fractions divide these exact ints, so results are
  * bit-identical to the exploded form. */
case class BigramStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_bigram", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bigram_stats expects a string input")

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val distinct = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < toks.length) { distinct.add(toks(i)); i += 1 }
    val bigrams = new java.util.HashMap[UTF8String, Int]()
    var maxRun = 0
    i = 0
    while (i + 1 < toks.length) {
      val bg = UTF8String.concatWs(space, toks(i), toks(i + 1))
      val c = bigrams.merge(bg, 1, (a, b) => a + b)
      if (c > maxRun) maxRun = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length, distinct.size, maxRun, math.max(toks.length - 1, 0))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `levenshtein(l, r) <= 1` as a zero-allocation predicate. For
  * ASCII inputs (bytes == chars) a single scan decides it: equal
  * lengths allow at most one mismatching byte, a one-byte length gap
  * allows skipping exactly one byte on the longer side, anything
  * further apart is false. Non-ASCII inputs fall back to the engine's
  * threshold DP, so the answer always equals the char-level edit
  * distance check. The banded-DP builtin allocates per call; at
  * millions of candidate pairs per block this scan is the difference
  * between the verify tier being join-bound and predicate-bound. */
case class WithinOneEditExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "within_one_edit expects string inputs")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String]
    val b = r.asInstanceOf[UTF8String]
    WithinOneEditExpr.withinOne(a, b)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WithinOneEditExpr {
  def withinOne(a: UTF8String, b: UTF8String): Boolean = {
    val na = a.numBytes()
    val nb = b.numBytes()
    if (a.numChars() != na || b.numChars() != nb)
      return a.levenshteinDistance(b, 1) >= 0 // non-ASCII: exact DP
    val d = na - nb
    if (d < -1 || d > 1) return false
    if (d == 0) {
      var i = 0
      var diff = 0
      while (i < na && diff <= 1) {
        if (a.getByte(i) != b.getByte(i)) diff += 1
        i += 1
      }
      diff <= 1
    } else {
      val (lo, hi) = if (d == 1) (b, a) else (a, b) // hi is one longer
      var i = 0
      val n = lo.numBytes()
      while (i < n && lo.getByte(i) == hi.getByte(i)) i += 1
      // skip one byte of hi at the first mismatch; the rest must match
      var j = i
      while (j < n && lo.getByte(j) == hi.getByte(j + 1)) j += 1
      j == n
    }
  }
}

/** Jump consistent hash (Lamping & Veach 2014, arXiv:1406.2294): maps
  * a 64-bit key to a shard in [0, numShards) such that growing the
  * shard count from n to n+1 moves EXACTLY the expected 1/(n+1)
  * fraction of keys (each strictly from an old shard to the NEW one)
  * — where `hash mod n` reshuffles 1 − 1/n of the corpus. This is the
  * reshard-stability device for incremental dataset re-export: a
  * release that grows its shard count re-uploads one new shard's
  * worth, not the whole corpus. The published algorithm is a tight
  * integer-LCG loop (O(ln n) iterations, no state), generated here
  * inside whole-stage codegen; the interpreted path shares the same
  * helper. Engine-specific by nature (the LCG multiply wraps mod
  * 2⁶⁴) — no SQL oracle; covered rows-only + movement/balance specs. */
case class JumpHashExpr(child: Expression, numShards: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numShards >= 1, s"numShards must be >= 1 (got $numShards)")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jump_shard expects a bigint key, got ${child.dataType.sql}")
    }

  protected override def nullSafeEval(input: Any): Any =
    JumpHashExpr.jump(input.asInstanceOf[Long], numShards)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val key = ctx.freshName("key")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      s"""
         |long $key = $c;
         |long $b = -1L; long $j = 0L;
         |while ($j < ${numShards}L) {
         |  $b = $j;
         |  $key = $key * 2862933555777941757L + 1L;
         |  $j = (long) (($b + 1L) *
         |    ((double) (1L << 31) / (double) (($key >>> 33) + 1L)));
         |}
         |${ev.value} = (int) $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object JumpHashExpr {
  /** Reference implementation — bit-identical to the generated loop. */
  def jump(key0: Long, numShards: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < numShards) {
      b = j
      key = key * 2862933555777941757L + 1L
      j = ((b + 1L) *
        ((1L << 31).toDouble / ((key >>> 33) + 1L).toDouble)).toLong
    }
    b.toInt
  }
}

/** Column-API entry points for the custom expressions. */
/** Unicode text canonicalization for pretraining corpora: NFC
  * normalization (composed forms — é is one codepoint however the
  * source encoded it), ROOT-locale lowercasing, whitespace-run
  * collapse, trim. One pass per row inside whole-stage codegen via a
  * static helper call (the JDK Normalizer does the heavy lifting;
  * there is nothing to gain from inlining its automaton). Exactness:
  * DuckDB's `nfc_normalize` + `lower` agree with the JDK on the
  * Latin-1/combining-mark range the corpus exercises — pinned by the
  * q129 oracle. */
case class NormalizeTextExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "normalize_text expects a string input")
    }

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeTextExpr.normalize(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.NormalizeTextExpr.normalize($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NormalizeTextExpr {
  /** Whitespace class caveat: the collapse step uses JAVA regex `\s`
    * = [ \t\n\x0B\f\r] — it INCLUDES vertical tab U+000B (which
    * RE2/DuckDB `\s` excludes) and EXCLUDES Unicode spaces such as
    * NBSP U+00A0 (which stay literal). Callers normalizing text that
    * can carry vertical tabs or non-ASCII whitespace should pre-map
    * those codepoints; the q129 oracle pins agreement with DuckDB on
    * the ASCII+Latin-1 range the corpus exercises, which is exactly
    * the supported class. */
  def normalize(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
      .trim
}

object FastOps {
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectSizeExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedJaccardExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sortedShingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(SortedShinglesExpr(
      GraftColumnBridge.expression(text), n))

  def bigramStats(text: Column): Column =
    GraftColumnBridge.column(BigramStatsExpr(
      GraftColumnBridge.expression(text)))

  def withinOneEdit(a: Column, b: Column): Column =
    GraftColumnBridge.column(WithinOneEditExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Jump-consistent-hash shard of a bigint key — see [[JumpHashExpr]]. */
  def jumpShard(key: Column, numShards: Int): Column =
    GraftColumnBridge.column(JumpHashExpr(
      GraftColumnBridge.expression(key), numShards))

  /** One-pass NFC + ROOT-lowercase + whitespace collapse. Supported
    * whitespace class is Java `\s` (tab/LF/VT/FF/CR/space) — see
    * [[NormalizeTextExpr.normalize]] for the RE2/Unicode divergence. */
  def normalizeText(text: Column): Column =
    GraftColumnBridge.column(NormalizeTextExpr(
      GraftColumnBridge.expression(text)))
}
