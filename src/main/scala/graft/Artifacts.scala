package graft

/** Session-scoped lake-artifact plumbing shared by the materialized
  * index builders ([[operators.TextAnalysis.materializedPostingsTable]],
  * [[operators.Similarity.materializedIvfIndex]] and the PQ sidecars):
  *
  *  - [[digest]] names catalog tables from a COLLISION-RESISTANT
  *    digest of the dataset path (first 16 hex of md5) instead of the
  *    32-bit `String.hashCode` — two dataset directories can collide
  *    on hashCode and silently overwrite each other's artifact
  *    (mode=overwrite) or serve each other's rows;
  *  - [[tempDir]] registers every artifact directory on ONE shared
  *    exit-time cleanup list (a single JVM shutdown hook drains it,
  *    each deletion isolated in its own try/catch), so a long-lived
  *    test/bench session neither leaks parquet trees into the system
  *    temp dir nor accumulates one hook thread per artifact;
  *  - [[KeyedMemo]] is the build-once-per-key device the index
  *    builders share: the map itself is never locked across a build
  *    (a multi-minute Spark job), only the KEY's own cell monitor is
  *    — concurrent builds of different keys proceed in parallel and
  *    lock nesting between builders cannot deadlock.
  */
object Artifacts {

  /** First 16 hex chars of md5(key) — 64 collision-resistant bits,
    * valid in a catalog identifier. */
  def digest(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  private val cleanupPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  /** Installed at most once (lazy-val monitor); drains [[cleanupPaths]]
    * with each tree isolated so one failing deletion cannot abort the
    * rest. */
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = cleanupPaths.poll()
      while (p != null) {
        try deleteTree(p) catch { case _: Throwable => () }
        p = cleanupPaths.poll()
      }
    }))

  /** A fresh temp directory that is recursively deleted on JVM exit. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    cleanupHook
    cleanupPaths.add(dir)
    dir
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteTree(_)) finally s.close()
      }
      try Files.deleteIfExists(p) catch { case _: Throwable => () }
    }
  }

  /** Build-once-per-key memo: `computeIfAbsent` installs a lazy cell
    * (cheap — no build under the map's bin lock); the build itself
    * runs under the cell's OWN monitor, so two threads racing on the
    * same key build once while unrelated keys never serialize. A
    * build that throws leaves its cell uninitialized — the next call
    * retries, matching the old getOrElseUpdate semantics. */
  final class KeyedMemo[K, V] {
    private val cells =
      new java.util.concurrent.ConcurrentHashMap[K, () => V]
    def getOrBuild(key: K)(build: => V): V =
      cells.computeIfAbsent(key,
        new java.util.function.Function[K, () => V] {
          def apply(k: K): () => V = { lazy val v: V = build; () => v }
        })()
  }
}
