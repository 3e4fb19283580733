package graft

import org.scalatest.funsuite.AnyFunSuite

class WaqiDsv2Spec extends AnyFunSuite {
  lazy val spark = SharedSession.spark

  test("DSv2 source plans one partition per city and matches the Dataset path") {
    val dsv2 = spark.read.format("graft.sources.WaqiTableProvider").load()
    assert(dsv2.rdd.getNumPartitions ==
      graft.sources.WaqiFixtures.all.size)
    val viaDsv2 = SparkEntry.queries("q63_waqi_dsv2_source")(spark, "")
      .collect().map(_.toSeq).toSeq
    val viaDataset = SparkEntry.queries("q60_waqi_flatten_long")(spark, "")
      .collect().map(_.toSeq).toSeq
    assert(viaDsv2 == viaDataset)
  }
}
