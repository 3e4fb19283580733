package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{WaqiFixtures, WaqiSource}

/** Reference-parity queries over the canned WAQI payloads (rows-only
  * checks — the oracle runs DuckDB over the sfDir parquet tables, and
  * these read embedded JSON fixtures instead; their correctness is
  * asserted against golden expectations in WaqiPipelineSpec). */
object WaqiParity {

  private def longDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Flatten.longFormat(
      WaqiSource.ok(WaqiSource.parse(s.createDataset(WaqiFixtures.all))),
      WaqiSource.Pollutants)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_waqi_flatten_long" -> ((s, _) =>
      longDf(s).orderBy("pollutant", "country", "day")),
    "q61_waqi_pivot_wide" -> ((s, _) =>
      Reshape.pivotWide(longDf(s), WaqiSource.Pollutants)
        .orderBy("day", "country")),
    "q62_waqi_per_pollutant" -> ((s, _) => {
      import s.implicits._
      Flatten.perPollutant(
        WaqiSource.ok(WaqiSource.parse(s.createDataset(WaqiFixtures.all))),
        "pm25").orderBy("country", "day")
    }),
    // same flatten, but the payloads arrive through the DataSource V2
    // table (one input partition per city) instead of a local Dataset
    "q63_waqi_dsv2_source" -> ((s, _) => {
      import s.implicits._
      val raw = s.read.format("graft.sources.WaqiTableProvider").load()
        .as[(String, String)]
      Flatten.longFormat(WaqiSource.ok(WaqiSource.parse(raw)),
        WaqiSource.Pollutants).orderBy("pollutant", "country", "day")
    })
  )

  val oracleSql: Map[String, String] = Map()
}
