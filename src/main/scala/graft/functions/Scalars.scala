package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helpers mirroring reference string/date semantics. */
object Scalars {

  /** Python `str.capitalize` exactly (reference P4,
    * `/root/reference/dags/my_data_pipeline.py:69`): first character
    * uppercased, ALL the rest lowercased. Differs from `initcap`,
    * which capitalizes every word. */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 1000000)))

  /** Reference keeps `day` as a string (SURVEY.md §1.2); this is the
    * opt-in normalization to a real date. */
  def dayToDate(c: Column): Column = to_date(c, "yyyy-MM-dd")
}
