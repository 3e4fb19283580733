package graftbench

/** Standalone serve harness for scripts/paired_bench.py: the same
  * stdin protocol as `graft.Bench --serve` (LIST / <query> ->
  * TIME <name> <sec> / UNKNOWN), but compiled OUTSIDE the benched
  * jars and prepended to their classpath — so builds that PREDATE the
  * serve mode (any round <= 14) can still be driven as the paired
  * baseline. Depends only on `graft.SparkEntry.queries`'s shape,
  * which has been the driver contract since round 1.
  *
  * paired_bench.py compiles this with the scala compiler that ships
  * in /opt/spark/jars (scala.tools.nsc.Main) against one of the
  * benched jars; the timing body mirrors Bench.serve (noop sink =
  * full materialization, full-precision seconds).
  */
object ServeHarness {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = graft.SparkEntry.queries
    // warm-up: JIT + parquet reader + shuffle paths (Bench.warmUp)
    try queries.get("q01_pricing_summary").foreach(
      _(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    println("READY")
    Console.out.flush()
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in))
    var line = in.readLine()
    while (line != null) {
      val name = line.trim
      if (name == "LIST")
        println("QUERIES " + queries.keys.toSeq.sorted.mkString(" "))
      else if (name.nonEmpty) queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          // a failed query must NOT masquerade as a fast timing — the
          // ok/err flag rides the answer so the driver can exclude it
          val ok =
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite")
                .save()
              true
            } catch { case e: Throwable =>
              System.err.println(
                s"[bench] $name failed: ${e.getMessage}")
              false
            }
          val flag = if (ok) "ok" else "err"
          println(
            f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.4f $flag")
        case None => println(s"UNKNOWN $name")
      }
      Console.out.flush()
      line = in.readLine()
    }
    spark.stop()
  }
}
