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

  /** Name of the commit marker written LAST inside a durable artifact
    * directory: its presence is the transaction boundary — a crashed
    * or partial build leaves no marker and is rebuilt, never served. */
  val CommitMarker = "_GRAFT_COMMIT"

  /** Params sidecar written before the marker; consulted on reuse so a
    * caller pointing a DIFFERENT build configuration at an existing
    * artifact fails loudly instead of silently serving the wrong
    * layout (the r13 ADVICE memo-key hazard, applied to disk). */
  val ParamsFile = "_GRAFT_PARAMS"

  def isCommitted(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, CommitMarker))

  /** Durable builds EXECUTED by this JVM — a spec hook: a cold-session
    * reload that really served the at-rest artifact leaves this
    * counter untouched. */
  val durableBuilds = new java.util.concurrent.atomic.AtomicLong

  private val durableMemo = new KeyedMemo[(Any, String), String]

  /** The DURABLE build-once device — the piece the session-scoped
    * [[KeyedMemo]] + [[tempDir]] convention deliberately lacks: a
    * committed artifact — written by this JVM, a previous session, or
    * another job entirely — is served as-is, so the "build once,
    * serve many" economics survive process exit. `params` is the
    * build-configuration string: recorded inside the artifact and
    * REQUIRED to match on every committed reuse. NOTE the dir itself
    * carries the INPUT identity — two different input frames pointed
    * at one dir are indistinguishable to the params check, so durable
    * homes should be derived from the source data ([[durableDirFor]]
    * keys them to the dataset's metadata fingerprint, which is what
    * every registered query does).
    *
    * Publication is RACE-SAFE across builders (sessions, or whole
    * JVMs on a shared lake): `build` writes into a private staging
    * dir NEXT TO the target (same filesystem), the params + commit
    * marker land in the staging tree, and the tree is published with
    * ONE atomic rename — the target either doesn't exist or is a
    * complete committed artifact; two racing first-builders each
    * build a consistent tree and the rename loser discards its
    * staging copy and serves the winner's. No partially-written
    * artifact can ever carry the marker. Memoized per (owner,
    * canonical path, params) so repeat calls in one JVM skip even the
    * marker stat. */
  def durable(owner: Any, dir: String, params: String = "")
      (build: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val canon = Paths.get(dir).toAbsolutePath.normalize.toString
    // params ride the MEMO key too: a same-session caller with a
    // different configuration re-enters the cell and hits the loud
    // on-disk params check instead of a silent memo hit
    durableMemo.getOrBuild((owner, s"$canon|$params")) {
      def checkParams(): Unit = {
        val onDisk = Files.readString(Paths.get(canon, ParamsFile))
        require(onDisk == params,
          s"artifact at $canon was built with params '$onDisk', " +
            s"caller expects '$params' — refusing to serve it")
      }
      if (isCommitted(canon)) checkParams()
      else {
        val parent = Paths.get(canon).getParent
        Files.createDirectories(parent)
        val staging = Files.createTempDirectory(parent, ".graft_build_")
        cleanupHook
        cleanupPaths.add(staging) // crash leftovers, not the artifact
        build(staging.toString)
        Files.writeString(staging.resolve(ParamsFile), params)
        Files.write(staging.resolve(CommitMarker), Array.emptyByteArray)
        // crashed-build debris at the target (a tree with NO marker —
        // a committed tree only ever appears atomically) is replaced,
        // not served and not treated as a lost race
        if (Files.exists(Paths.get(canon)) && !isCommitted(canon))
          try deleteTree(Paths.get(canon)) catch { case _: Throwable => () }
        val published =
          try {
            Files.move(staging, Paths.get(canon),
              StandardCopyOption.ATOMIC_MOVE)
            true
          } catch {
            // exists / not-empty / denied — the JDK surfaces the
            // collision as assorted FileSystemExceptions per platform
            case _: java.nio.file.FileSystemException => false
          }
        if (published) durableBuilds.incrementAndGet()
        else {
          // a racing builder published first: serve ITS tree (must be
          // committed + params-compatible), discard ours
          try deleteTree(staging) catch { case _: Throwable => () }
          require(isCommitted(canon),
            s"lost the publish race at $canon but the winner's " +
              "artifact is not committed")
          checkParams()
        }
      }
      canon
    }
  }

  /** Default lake root for DURABLE artifacts: `$GRAFT_ARTIFACTS_DIR`
    * when set (the production knob — point it at the warehouse), else
    * `artifacts/` under the working directory. NOT registered for
    * exit-time deletion — surviving the JVM is the point. */
  def durableRoot: String =
    sys.env.getOrElse("GRAFT_ARTIFACTS_DIR",
      new java.io.File("artifacts").getAbsolutePath)

  /** THE durable-artifact home convention:
    * `<durableRoot>/<prefix>_<digest(datasetDir | fingerprint(sidecar))>`
    * — keyed to the dataset path AND the named source table's
    * metadata fingerprint, so a regenerated input quietly gets a
    * fresh artifact instead of being served a stale one. One
    * definition; the per-family helpers delegate here so a keying
    * change cannot fork the scheme. */
  def durableDirFor(prefix: String, datasetDir: String,
      sidecar: String): String =
    s"$durableRoot/${prefix}_${digest(
      datasetDir + "|" + pathFingerprint(s"$datasetDir/$sidecar"))}"

  /** Metadata fingerprint of a dataset path (file or directory):
    * digest over sorted (relative name, size, mtime) — cheap, no data
    * read — used to key durable artifacts to their SOURCE so a
    * regenerated input quietly gets a fresh artifact instead of being
    * screened against a stale index. */
  def pathFingerprint(path: String): String = {
    import java.nio.file.{Files, Paths, Path}
    val root = Paths.get(path)
    if (!Files.exists(root)) return digest(s"absent:$path")
    val sb = new StringBuilder
    val s = Files.walk(root)
    try {
      s.sorted().forEach { (p: Path) =>
        if (Files.isRegularFile(p)) {
          sb.append(root.relativize(p)).append('|')
            .append(Files.size(p)).append('|')
            .append(Files.getLastModifiedTime(p).toMillis).append('\n')
        }
      }
    } finally s.close()
    digest(sb.toString)
  }

  /** Register catalog table `name` over a COMMITTED bucketed layout at
    * `location` — the reload half of a durable BUCKETED artifact:
    * `spark.read.parquet` would discard the bucket spec (bucketing
    * lives in the catalog, not the files), so a fresh session
    * re-declares it with CREATE TABLE … CLUSTERED BY … LOCATION over
    * the existing files (Spark recovers each file's bucket id from
    * its name, so the co-location guarantee survives the JVM).
    * No-op when the session already knows the table (the build
    * session registered it via saveAsTable). */
  def registerBucketedTable(s: org.apache.spark.sql.SparkSession,
      name: String, location: String, schemaDdl: String,
      bucketCol: String, nBuckets: Int,
      sortCol: Option[String] = None): Unit =
    if (!s.catalog.tableExists(name)) {
      val sortClause = sortCol.map(c => s" SORTED BY ($c)").getOrElse("")
      s.sql(s"CREATE TABLE $name ($schemaDdl) USING parquet " +
        s"CLUSTERED BY ($bucketCol)$sortClause INTO $nBuckets BUCKETS " +
        s"LOCATION '$location'")
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
