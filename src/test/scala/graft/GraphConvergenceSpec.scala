package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Convergence-adaptive tiers of the iterative graph family (r13
  * verdict item 6): the registered tiers run FIXED unrolled rounds
  * (the oracle replays the recurrence); a 100 TB job iterates to a
  * convergence test. These specs pin the contract that makes both
  * tiers one algorithm: the converged run is the fixed-round tier's
  * PREFIX — its result equals the fixed tier at the converged round
  * count, bit-for-bit — and the per-round driver state is one scalar
  * (the q82 changed-count discipline), never data-sized.
  */
class GraphConvergenceSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark

  private def emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("kCore converged == fixed-round tier at the converged count; " +
      "the fixed point really is fixed") {
    val (converged, r) = Similarity.kCoreConvergedWithRounds(emb)
    assert(r >= 1 && r < 64, s"rounds=$r")
    assert(rows(converged) == rows(Similarity.kCore(emb, rounds = r)))
    // idempotence at the fixed point: one more fixed round changes
    // nothing (the peel deleted no edge in round r)
    assert(rows(converged) ==
      rows(Similarity.kCore(emb, rounds = r + 1)))
  }

  test("labelPropagation converged == fixed-round tier; the period-2 " +
      "invariant holds (fixed point OR the classic sync-LPA 2-cycle)") {
    val (converged, r) =
      Similarity.labelPropagationConvergedWithRounds(emb)
    assert(r >= 1 && r < 32, s"rounds=$r")
    assert(rows(converged) ==
      rows(Similarity.labelPropagation(emb, rounds = r)))
    // r+2 lands on the same labeling whether the walk converged
    // (stable) or 2-cycles (same phase) — the invariant that makes
    // the stop rule sound in both regimes
    assert(rows(converged) ==
      rows(Similarity.labelPropagation(emb, rounds = r + 2)))
  }

  test("pageRank converged == fixed-round tier at the converged " +
      "count (same fold-exact recurrence, bit-for-bit)") {
    val (converged, r) = Similarity.pageRankConvergedWithRounds(emb,
      tol = 1e-3)
    assert(r >= 1 && r < 200, s"rounds=$r")
    assert(rows(converged) == rows(Similarity.pageRank(emb, iters = r)))
    // the registered 3-round tier is the SAME walk truncated earlier:
    // a converged run at a loose tol never needs fewer rounds
    assert(r >= 3 || rows(converged) ==
      rows(Similarity.pageRank(emb, iters = 3)))
  }

  test("bfs converged == fixed-round tier; distances are the true " +
      "BFS fixed point (one more hop changes nothing)") {
    val (converged, r) = Similarity.bfsConvergedWithRounds(emb)
    assert(r >= 1 && r < 64, s"rounds=$r")
    assert(rows(converged) == rows(Similarity.bfsHops(emb, maxHops = r)))
    assert(rows(converged) ==
      rows(Similarity.bfsHops(emb, maxHops = r + 1)))
  }
}
