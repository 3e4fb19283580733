package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for row-local-heavy operators (optimization
  * guide §2.5, "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * The CPU-dense projections in this library (shingling, per-doc
  * MinHash/SimHash signature families, Gram-matrix explodes, codec
  * decodes) run BEFORE the first exchange, so their parallelism is
  * whatever the scan delivered. A parquet input with fewer row groups
  * than the session has cores — exactly the bench's single-file,
  * single-row-group tables, or one gzip/misc unsplittable shard in
  * production — serializes the whole projection on one core while the
  * rest of the machine idles.
  *
  * [[fanOut]] repartitions ONLY in that regime: when the planned scan
  * arrives in fewer partitions than the session's parallelism. At
  * scale a table scan always carries at least cores-many splits, so
  * this is a structural no-op there — the plan with real data keeps
  * exactly its old shape (no extra Exchange), which is what keeps the
  * device out of the "tuned for local mode" class: nothing is sized
  * to the local core count; the gate reads the actual scan layout.
  *
  * Correctness: a round-robin repartition changes row order and
  * placement, never row content. Callers are the operators whose
  * downstream algebra is already partitioning-independent by this
  * library's exactness discipline (integer/decimal aggregates, sorted
  * folds, row-local hashes, total final orderings) — the same
  * invariant their shuffles already rely on; each adopting query is
  * re-proven hash-identical against the DuckDB oracle.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
