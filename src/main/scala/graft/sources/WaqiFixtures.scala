package graft.sources

/** Canned WAQI-shaped payloads (FIXTURES.md family A): three good
  * cities plus every observed failure mode
  * (`/root/reference/dags/my_data_pipeline.py:40-48,64`). Used by the
  * demo app, the rows-only parity queries, and the test suite.
  */
object WaqiFixtures {

  private def good(city: String, aqi: Int, days: Seq[(String, Int)])
      : (String, String) = {
    def arr(scale: Int): String = days.map { case (d, base) =>
      s"""{"avg": ${base * scale}, "day": "$d", "max": ${base * scale + 12},
         | "min": ${math.max(base * scale - 9, 0)}}""".stripMargin
        .replace("\n", "")
    }.mkString("[", ",", "]")
    city ->
      s"""{"status": "ok", "data": {"aqi": $aqi,
         | "city": {"name": "${city.capitalize}"},
         | "forecast": {"daily": {
         |   "o3": ${arr(2)}, "pm10": ${arr(1)},
         |   "pm25": ${arr(3)}, "uvi": ${arr(0)}
         | }}}}""".stripMargin.replace("\n", "")
  }

  /** 3 healthy cities, 2–3 forecast days each. */
  val goodPayloads: Seq[(String, String)] = Seq(
    good("amsterdam", 42,
      Seq("2026-08-10" -> 14, "2026-08-11" -> 16, "2026-08-12" -> 11)),
    good("berlin", 55, Seq("2026-08-10" -> 21, "2026-08-11" -> 18)),
    good("paris", 38,
      Seq("2026-08-10" -> 12, "2026-08-11" -> 10, "2026-08-12" -> 15)))

  /** Failure variants — each must contribute zero data rows. */
  val failurePayloads: Seq[(String, String)] = Seq(
    "errorcity" -> """{"status": "error"}""",
    "httpfail" -> "Error 401: Invalid API token.",
    "noforecast" ->
      """{"status": "ok", "data": {"aqi": 10, "city": {"name": "X"}}}""",
    "emptyarrays" ->
      """{"status": "ok", "data": {"aqi": 5, "city": {"name": "Y"},
        | "forecast": {"daily": {"o3": [], "pm10": [], "pm25": [],
        | "uvi": []}}}}""".stripMargin.replace("\n", ""))

  val all: Seq[(String, String)] = goodPayloads ++ failurePayloads
}
