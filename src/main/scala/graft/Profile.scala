package graft

/** Ad-hoc profiling harness: run the named SparkEntry queries a few
  * times each against SPARK_GRAFT_SF_DIR and print per-run wall times
  * to stderr — the tool for chasing individual bench outliers without
  * a full Bench sweep. Session setup and warm-up are Bench's own
  * (shared helpers), so profiled times match bench conditions.
  *
  * Usage: runMain graft.Profile q65_cardinality_sketch q82_dup_clusters
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Bench.timingSession()
    Bench.warmUp(spark, sfDir)
    for (name <- args) SparkEntry.queries.get(name) match {
      case None => System.err.println(s"[profile] unknown query: $name")
      case Some(fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[profile] $name runs=" +
          times.map(t => f"$t%.2f").mkString(",") +
          f" min=${times.min}%.2fs")
    }
    spark.stop()
  }
}
