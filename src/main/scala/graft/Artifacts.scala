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
  *  - [[tempDir]] registers every artifact directory for recursive
  *    deletion at JVM exit, so a long-lived test/bench session does
  *    not leak parquet trees into the system temp dir.
  *
  * Builders hold their registry's monitor around getOrElseUpdate
  * (TrieMap.getOrElseUpdate is not atomic), so a first call races
  * cannot double-build or double-register a table name.
  */
object Artifacts {

  /** First 16 hex chars of md5(key) — 64 collision-resistant bits,
    * valid in a catalog identifier. */
  def digest(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  /** A fresh temp directory that is recursively deleted on JVM exit. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
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
}
