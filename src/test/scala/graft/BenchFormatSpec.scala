package graft

import org.scalatest.funsuite.AnyFunSuite

/** The benchmark's stdout contract: ONE JSON line that must fit the
  * 2000-char output tail it is read back from (with headroom for the
  * build tool's trailer lines), while carrying an individual entry for
  * EVERY registered query — an aggregate bucket is exactly where a
  * per-query regression hides. Guarded here because the failure mode
  * is silent — the line still prints, it just never parses — and it
  * regresses one registered query at a time. */
class BenchFormatSpec extends AnyFunSuite {

  test("bench JSON stays under the tail window at worst-case timings") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // the "9" cap bounds every value to 1 char and slow queries all
    // materialize entries, so THIS line is the worst case over all
    // possible timings — the length guard is timing-independent by
    // construction
    val line = Bench.buildJson(names.map(_ -> 987.654),
      "/root/testdata/sf0.1")
    // budget: 2000-char tail minus the MEASURED ~76-char sbt trailer
    // ("[success] Total time: ..." + newline padding). The registry
    // outgrew the per-entry object syntax at 270 queries, so
    // "queries" is now the parallel key/value-array pair (~4 chars
    // per entry) — worst case 1199 at 270 queries, headroom to ~400.
    assert(line.length < 1920,
      s"bench line ${line.length} chars — approaching the 2000-char " +
        "tail window; next squeeze: drop the space separator for " +
        "fixed-width 2-char keys")
    // every registered query gets its own entry — no "rest" bucket
    assert(!line.contains("\"rest\""),
      "registry outgrew MaxQueryEntries — per-query coverage lost")
    // short keys must stay unique, or per-query timings collide —
    // tested through the REAL derivation, not a copy that could drift
    val short = names.map(Bench.shortKey)
    assert(short.distinct.size == short.size,
      s"duplicate short keys: ${short.diff(short.distinct).distinct}")
  }

  /** Decode the parallel-array "queries" pair back to key -> digit —
    * the same reconstruction scripts/bench_compare.py performs. */
  private def decode(line: String): Map[String, Char] = {
    val m = """"queries":\{"k":"([^"]*)","v":"([^"]*)"\}""".r
      .findFirstMatchIn(line).getOrElse(fail(s"no k/v pair in $line"))
    val keys = m.group(1).split(" ").filter(_.nonEmpty)
    val vals = m.group(2)
    assert(keys.length == vals.length, s"k/v out of step in $line")
    keys.zip(vals).toMap
  }

  test("bench JSON is valid JSON with every query present") {
    val names = Seq("q01_a", "q02_b")
    val line = Bench.buildJson(names.map(_ -> 1.4), "/x")
    // minimal structural check without a JSON lib on the classpath
    assert(line.startsWith("""{"metric":"total","value":2.80,"""))
    // the key encoding is declared in-line — decimal and base36 digit
    // strings are ambiguous, so decoders key on this marker (and on
    // the {"k","v"} shape for the array generation)
    assert(line.contains(""""enc":36"""))
    // keys are the query number with "q" and zero-padding stripped,
    // rendered base36 (1 and 2 coincide with decimal)
    assert(decode(line) == Map("1" -> '1', "2" -> '1'))
    // a 3-digit decimal id renders as 2 base36 chars: 135 -> "3r"
    val b36 = Bench.buildJson(Seq("q135_dup_span" -> 2.0), "/x")
    assert(decode(b36) == Map("3r" -> '2'), b36)
    // single-digit rendering capped at 9; sub-0.5s entries are
    // OMITTED (absence decodes as "ran in <0.5s" — every registered
    // query always runs)
    val tiers = decode(Bench.buildJson(
      Seq("q03_c" -> 12.345, "q04_d" -> 123.45, "q05_e" -> 0.46,
        "q06_f" -> 1.4), "/x"))
    assert(tiers == Map("3" -> '9', "4" -> '9', "6" -> '1'))
    // "sf" was dropped from the line at 216 queries (length budget —
    // the driver fixes the SF and records it next to the tail)
    val sf = Bench.buildJson(names.map(_ -> 1.0), "/root/testdata/sf0.1")
    assert(!sf.contains("\"sf\"") && sf.endsWith("}"))
    // under the cap there is no "rest" field
    assert(!line.contains("\"rest\""))
  }

  test("bench JSON caps per-query entries at the slowest MaxQueryEntries") {
    val n = Bench.MaxQueryEntries + 30
    // names q0001..; times rise with the index, so the kept set
    // is exactly the LAST MaxQueryEntries names
    val names = (1 to n).map(i => f"q$i%04d_x")
    val line = Bench.buildJson(names.map(nm =>
      nm -> nm.drop(1).takeWhile(_ != '_').toDouble), "/x")
    // base36 keys: dropped ids 1 and 30 ("1", "u"), kept 31 ("v") and n
    val kv = decode(line)
    assert(!kv.contains("1") && !kv.contains("u"))
    assert(kv.contains("v") &&
      kv.contains(java.lang.Long.toString(n.toLong, 36)))
    // the dropped tail is summed into "rest" (1+2+...+30 = 465)
    assert(line.contains(""""rest":465.00"""), line)
  }
}
