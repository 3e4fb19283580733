package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** observe() counters must equal directly-computed values — the whole
  * point is validation without a second scan, so the counters have to
  * be trustworthy. */
class QualityObserveSpec extends AnyFunSuite {
  private lazy val spark = SharedSession.spark

  test("quality observation counters match direct computation") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), -3.0), (None, 5.0),
      (Some(2L), 0.0), (Some(4L), -1.0)
    ).toDF("id", "v")
    val (instrumented, obs) = Quality.withQualityObservation(df, "id", "v")
    // any action flushes the metrics
    assert(instrumented.count() == 5)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("null_ids") == 1L)
    assert(m("negatives") == 2L)
    // exact on 3 distinct non-null ids (HLL is exact at this size)
    assert(m("approx_distinct_ids") == 3L)
  }

  test("observation rides along a real pipeline action without rescan") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val (instrumented, obs) =
      Quality.withQualityObservation(t.orders, "o_orderkey", "o_totalprice")
    val n = instrumented.filter(col("o_totalprice") >= 0).count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] >= n)
    assert(m("null_ids") == 0L)
    assert(m("negatives") == 0L)
  }
}
