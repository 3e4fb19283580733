package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sf)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"--- $name took ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
