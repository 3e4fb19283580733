package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: run the named SparkEntry queries a few
  * times each against SPARK_GRAFT_SF_DIR and print per-run wall times
  * to stderr — the tool for chasing individual bench outliers without
  * a full Bench sweep.
  *
  * Usage: runMain graft.Profile q65_cardinality_sketch q82_dup_clusters
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up, same as Bench
    try SparkEntry.queries.get("q01_pricing_summary")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
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
