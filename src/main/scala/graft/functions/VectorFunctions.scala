package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is promoted to double per element and accumulated
  * with a left-to-right fold — the exact evaluation order the oracle
  * SQL spells out term by term — so similarity values are bit-identical
  * across engines and across Spark partitionings. Pure `functions._`
  * expressions: codegen'd, no UDF serialization, scale linearly.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, left-to-right. Backed by the codegen'd
    * [[graft.plans.DotProductExpr]] — bit-identical to the
    * `aggregate(zip_with(...))` fold (see [[dotFold]]) but ~100x
    * cheaper per evaluation, which dominates all-pairs similarity. */
  def dot(a: Column, b: Column): Column =
    graft.plans.FastOps.dotProduct(a, b)

  /** The reference implementation of [[dot]] in pure built-ins; kept
    * for the equivalence test. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double, left-to-right. */
  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity: dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed-norm layout (norms carried alongside the
    * vectors so pair joins don't recompute them per pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** The DuckDB-side equivalent of [[dot]] for a `dim`-dimensional
    * float list column: an explicit left-associated 64-term sum, each
    * element cast to double — bit-identical to the Spark fold. */
  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")

  /** DuckDB-side Σ v² (see [[dotSql]]). */
  def norm2Sql(v: String, dim: Int): String = dotSql(v, v, dim)

  /** DuckDB-side squared L2 distance between a float list `a` and a
    * double list `c`: an explicit left-associated sum of squared
    * differences — bit-identical to the Spark
    * `aggregate(zip_with(...))` fold in [[graft.operators.Similarity
    * .nearestCentroid]]. */
  def l2Sql(a: String, c: String, dim: Int): String =
    (1 to dim).map { i =>
      val d = s"(CAST($a[$i] AS DOUBLE) - $c[$i])"
      s"$d*$d"
    }.mkString(" + ")
}
