package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

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
  *
  * The DURABLE layer ([[durable]], [[pathFingerprint]],
  * [[isCommitted]], [[registerBucketedTable]]) runs entirely on the
  * Hadoop [[FileSystem]] API, so an artifact home can be a local
  * path, an `hdfs://` dir or an object-store URI — the same surface
  * the payloads are written through. Commit protocol is
  * capability-aware ([[commitMode]]): staging + one atomic directory
  * rename where the FS supports it (local, HDFS), marker-last
  * in-place commit where it doesn't (S3 and friends have no atomic
  * directory rename — renaming there is a copy loop that can be
  * observed half-done, so the marker alone is the transaction
  * boundary and a best-effort build lock keeps concurrent
  * first-builders from writing over each other).
  */
object Artifacts {

  /** First 16 hex chars of md5(key) — 64 collision-resistant bits,
    * valid in a catalog identifier. */
  def digest(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  private val cleanupActions =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Installed at most once (lazy-val monitor); drains
    * [[cleanupActions]] with each action isolated so one failing
    * deletion cannot abort the rest. */
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var a = cleanupActions.poll()
      while (a != null) {
        try a() catch { case _: Throwable => () }
        a = cleanupActions.poll()
      }
    }))

  /** A fresh LOCAL temp directory that is recursively deleted on JVM
    * exit — the home of session-scoped (non-durable) artifacts. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    cleanupHook
    cleanupPaths(dir)
    dir
  }

  private def cleanupPaths(p: java.nio.file.Path): Unit =
    cleanupActions.add(() => deleteTree(p))

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

  // ------------------------------------------------------------------
  // Hadoop-FileSystem seam: every durable-layer I/O goes through here,
  // so a lake URI works exactly like a local path.
  // ------------------------------------------------------------------

  /** The active session's Hadoop configuration when one exists (it
    * carries the deployment's fs.* settings — credentials, endpoints);
    * vanilla defaults otherwise (local file:// still resolves). */
  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Resolve a caller-supplied dir string (plain path, relative path,
    * or URI) to its FileSystem + fully-qualified Path. */
  private[graft] def fsPath(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    (fs, fs.makeQualified(p))
  }

  /** The canonical string form handed back to callers and used as the
    * memo key: the PLAIN absolute path for the local scheme (so build
    * lambdas and Spark writers can use it verbatim, and pre-existing
    * local callers see the exact strings they always did) — but ONLY
    * when the deployment's default filesystem is also local: on a
    * cluster whose fs.defaultFS is hdfs://, a stripped `file:` path
    * handed to a Spark writer would re-resolve against HDFS and split
    * the payload from the marker across two filesystems, so there the
    * explicit URI is preserved. */
  private def pathString(p: Path): String =
    if (p.toUri.getScheme == "file" && defaultFsIsLocal)
      p.toUri.getPath
    else p.toString

  private def defaultFsIsLocal: Boolean =
    FileSystem.getDefaultUri(hadoopConf).getScheme match {
      case null | "file" => true
      case _ => false
    }

  /** Canonical form of a dir string — exposed so artifact NAMES
    * (catalog tables keyed to a dir) derive from the same
    * normalization the durable layer itself uses. */
  def canonical(dir: String): String = pathString(fsPath(dir)._2)

  private def writeSmall(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
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

  /** Best-effort mutual-exclusion file for the marker-mode commit
    * (object stores): created exclusively by the builder, deleted
    * when the build finishes or fails. */
  val BuildLock = "_GRAFT_BUILD_LOCK"

  def isCommitted(dir: String): Boolean = {
    val (fs, p) = fsPath(dir)
    fs.exists(new Path(p, CommitMarker))
  }

  /** Durable builds EXECUTED by this JVM — a spec hook: a cold-session
    * reload that really served the at-rest artifact leaves this
    * counter untouched. */
  val durableBuilds = new java.util.concurrent.atomic.AtomicLong

  private val durableMemo = new KeyedMemo[(Any, String), String]

  /** Commit protocol for this FS: `rename` (staging dir + one atomic
    * directory rename — local, HDFS, anything POSIX-renaming) or
    * `marker` (in-place build, marker written last — object stores,
    * where "rename" is a non-atomic copy loop). Scheme-derived;
    * overridable per-run via -Dgraft.artifacts.commit /
    * $GRAFT_ARTIFACTS_COMMIT for stores this list mis-classifies. */
  private val NoAtomicRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "oss", "cos", "obs",
    "wasb", "wasbs", "abfs", "abfss", "swift")
  private[graft] def commitMode(fs: FileSystem): String =
    sys.props.get("graft.artifacts.commit")
      .orElse(sys.env.get("GRAFT_ARTIFACTS_COMMIT"))
      .getOrElse(
        if (NoAtomicRenameSchemes(fs.getScheme)) "marker" else "rename")

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
    * Publication under the `rename` protocol is RACE-SAFE across
    * builders (sessions, or whole JVMs on a shared lake): `build`
    * writes into a private staging dir NEXT TO the target (same
    * filesystem), the params + commit marker land in the staging
    * tree, and the tree is published with ONE atomic rename — the
    * target either doesn't exist or is a complete committed artifact;
    * two racing first-builders each build a consistent tree and the
    * rename loser discards its staging copy and serves the winner's.
    * Crashed-build debris at the target (a tree with NO marker) is
    * renamed ASIDE to a private trash name before deletion — deleting
    * in place raced a concurrent publisher (the r14 ADVICE TOCTOU:
    * the slower deleter could walk a just-published committed tree);
    * the rename-aside makes ownership exclusive, and a grabbed tree
    * that turns out to be committed is put straight back. No
    * partially-written artifact can ever carry the marker.
    *
    * Under the `marker` protocol (object stores) the build writes IN
    * PLACE and the marker lands last — the marker alone is the
    * transaction boundary (that discipline transfers; the atomic
    * rename does not). A best-effort exclusive [[BuildLock]] keeps
    * concurrent first-builders from interleaving writes: losers poll
    * for the winner's marker instead of double-building, a lock
    * released without a marker (failed build) is re-contended, and a
    * stale lock past `graft.artifacts.lockWaitMs` fails loudly rather
    * than hanging forever.
    *
    * Memoized per (owner, canonical path, params) so repeat calls in
    * one JVM skip even the marker stat. */
  def durable(owner: Any, dir: String, params: String = "")
      (build: String => Unit): String = {
    val (fs, target) = fsPath(dir)
    val canon = pathString(target)
    // params ride the MEMO key too: a same-session caller with a
    // different configuration re-enters the cell and hits the loud
    // on-disk params check instead of a silent memo hit
    durableMemo.getOrBuild((owner, s"$canon|$params")) {
      def committed(): Boolean = fs.exists(new Path(target, CommitMarker))
      def checkParams(): Unit = {
        val onDisk = readSmall(fs, new Path(target, ParamsFile))
        require(onDisk == params,
          s"artifact at $canon was built with params '$onDisk', " +
            s"caller expects '$params' — refusing to serve it")
      }
      if (committed()) checkParams()
      else if (commitMode(fs) == "rename")
        publishByRename(fs, target, canon, params, build, checkParams _)
      else
        publishByMarker(fs, target, canon, params, build, checkParams _)
      canon
    }
  }

  private def nonce(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private def publishByRename(fs: FileSystem, target: Path,
      canon: String, params: String, build: String => Unit,
      checkParams: () => Unit): Unit = {
    val parent = target.getParent
    fs.mkdirs(parent)
    val staging = new Path(parent, s".graft_build_${nonce()}")
    fs.mkdirs(staging)
    cleanupHook
    // crash leftovers, not the artifact
    cleanupActions.add(() => { fs.delete(staging, true); () })
    build(pathString(staging))
    writeSmall(fs, new Path(staging, ParamsFile), params)
    writeSmall(fs, new Path(staging, CommitMarker), "")
    // crashed-build debris at the target (a tree with NO marker — a
    // committed tree only ever appears atomically under this
    // protocol): grab it with a rename to a private trash name FIRST
    // — once renamed, this builder owns the tree exclusively and can
    // inspect it without racing a publisher — then delete it there.
    // A grabbed tree that turns out to carry the marker was a
    // committed artifact published between the check and the grab:
    // put it straight back (or discard ours if a third racer claimed
    // the slot meanwhile — both trees are complete committed builds).
    if (fs.exists(target) &&
        !fs.exists(new Path(target, CommitMarker))) {
      val trash = new Path(parent, s".graft_trash_${nonce()}")
      val grabbed =
        try fs.rename(target, trash)
        catch { case _: Throwable => false }
      if (grabbed) {
        if (fs.exists(new Path(trash, CommitMarker))) {
          val putBack =
            try fs.rename(trash, target)
            catch { case _: Throwable => false }
          if (!putBack) { try fs.delete(trash, true) catch { case _: Throwable => () } }
        } else {
          try fs.delete(trash, true) catch { case _: Throwable => () }
        }
      }
    }
    var published =
      try fs.rename(staging, target)
      catch { case _: Throwable => false }
    // some filesystems (HDFS among them) apply POSIX-mv semantics and
    // move the source INTO an existing destination directory instead
    // of failing — that "success" would nest our staging tree inside
    // the winner's committed artifact; detect and undo it, then take
    // the lost-race path
    if (published) {
      val movedInto = new Path(target, staging.getName)
      if (fs.exists(movedInto)) {
        try fs.delete(movedInto, true) catch { case _: Throwable => () }
        published = false
      }
    }
    if (published) durableBuilds.incrementAndGet()
    else {
      // a racing builder published first: serve ITS tree (must be
      // committed + params-compatible), discard ours
      try fs.delete(staging, true) catch { case _: Throwable => () }
      require(fs.exists(new Path(target, CommitMarker)),
        s"lost the publish race at $canon but the winner's " +
          "artifact is not committed")
      checkParams()
    }
  }

  private def lockWaitMs: Long =
    sys.props.get("graft.artifacts.lockWaitMs").map(_.toLong)
      .getOrElse(600000L)

  private def publishByMarker(fs: FileSystem, target: Path,
      canon: String, params: String, build: String => Unit,
      checkParams: () => Unit): Unit = {
    val marker = new Path(target, CommitMarker)
    val lock = new Path(target, BuildLock)
    val token = nonce()
    val deadline = System.nanoTime() + lockWaitMs * 1000000L
    var done = false
    while (!done) {
      if (fs.exists(marker)) { checkParams(); done = true }
      else {
        fs.mkdirs(target)
        // exclusive create is BEST-EFFORT on stores without a
        // conditional PUT: the token read-back catches most lost
        // races at acquisition, and a second read-back immediately
        // before the commit marker ensures at most one builder ever
        // COMMITS (a builder whose token was overwritten aborts
        // without the marker and re-contends). The residual hazard —
        // two builders interleaving payload writes inside the
        // read-back windows — cannot be closed without a conditional
        // PUT; stores that have one (S3 conditional writes, GCS
        // preconditions) get true exclusivity when the Hadoop client
        // surfaces it, and GRAFT_ARTIFACTS_COMMIT=rename opts into
        // the rename protocol where the store's rename is known
        // consistent.
        def ownsLock(): Boolean =
          try readSmall(fs, lock) == token
          catch { case _: Throwable => false }
        val acquired =
          try {
            val out = fs.create(lock, false)
            try out.write(token.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            ownsLock()
          } catch { case _: Throwable => false }
        if (acquired) {
          var committedHere = false
          try {
            if (!fs.exists(marker)) {
              // clear previous debris payloads (never the lock)
              fs.listStatus(target).foreach { st =>
                if (st.getPath.getName != BuildLock)
                  fs.delete(st.getPath, true)
              }
              build(pathString(target))
              writeSmall(fs, new Path(target, ParamsFile), params)
              // the pre-commit re-verification: if another builder
              // overwrote the token meanwhile, this tree may be
              // interleaved — abort WITHOUT the marker (it stays
              // uncommitted debris) and re-contend
              if (ownsLock()) {
                writeSmall(fs, marker, "")
                durableBuilds.incrementAndGet()
                committedHere = true
              }
            } else { checkParams(); committedHere = true }
          } finally {
            // release the lock when it is still OURS (normal commit,
            // or a thrown build) — but never delete another builder's
            // lock (the aborted-lost-token path)
            if (committedHere || ownsLock())
              try fs.delete(lock, false)
              catch { case _: Throwable => () }
          }
          done = committedHere
        } else {
          // someone else holds the lock: poll for their marker; a
          // lock released WITHOUT a marker (failed build) loops back
          // to contend again; a stale lock fails loudly
          var waiting = true
          while (waiting) {
            if (fs.exists(marker)) { checkParams(); done = true; waiting = false }
            else if (!fs.exists(lock)) waiting = false // re-contend
            else if (System.nanoTime() > deadline)
              sys.error(s"timed out waiting for a concurrent build " +
                s"of $canon (lock $BuildLock held past " +
                s"${lockWaitMs}ms with no commit marker — a crashed " +
                "builder? delete the lock file to recover)")
            else Thread.sleep(50)
          }
        }
      }
    }
  }

  /** Default lake root for DURABLE artifacts: `$GRAFT_ARTIFACTS_DIR`
    * when set (the production knob — a local path, `hdfs://` dir or
    * object-store URI; all I/O rides the Hadoop FileSystem API), else
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
    * digest over sorted (relative name, size, mtime, content witness)
    * — used to key durable artifacts to their SOURCE so a regenerated
    * input quietly gets a fresh artifact instead of being screened
    * against a stale index. The WITNESS is the first + last 64 bytes
    * of each file (two positioned reads, no full scan): it catches
    * the regeneration that size+mtime alone cannot — a
    * deterministic-size rewrite on a second-granularity filesystem,
    * or an mtime-preserving copy (`cp -p`, rsync) of different bytes
    * (the r14 ADVICE hazard). Parquet puts its footer metadata
    * (row-group offsets, column stats) in exactly that tail window,
    * so any re-write of real data moves the witness. */
  private val fingerprintMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  def pathFingerprint(path: String): String = {
    val (fs, root) = fsPath(path)
    if (!fs.exists(root)) return digest(s"absent:$path")
    val rootUriPath = root.toUri.getPath
    val files = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) files += st
    }
    val listed = files
      .map(st => (st.getPath.toUri.getPath.stripPrefix(rootUriPath)
        .stripPrefix("/"), st))
      .sortBy(_._1)
    // metadata-only signature of the listing, memoized per JVM: repeat
    // calls (every at-rest query invocation keys its durable home
    // through here) cost ONE recursive listing, not O(files) reads.
    // The witness still catches the cross-JOB mtime-preserving
    // rewrite — its target hazard — because a fresh JVM's memo is
    // empty; a same-metadata rewrite WITHIN one JVM's lifetime would
    // serve the memoized fingerprint until restart (accepted: the
    // alternative is O(files) object-store reads per query)
    val metaSb = new StringBuilder(pathString(root)).append('\n')
    listed.foreach { case (rel, st) =>
      metaSb.append(rel).append('|').append(st.getLen).append('|')
        .append(st.getModificationTime).append('\n')
    }
    val metaKey = digest(metaSb.toString)
    val cached = fingerprintMemo.get(metaKey)
    if (cached != null) return cached
    val sb = new StringBuilder
    listed.foreach { case (rel, st) =>
      sb.append(rel).append('|')
        .append(st.getLen).append('|')
        .append(st.getModificationTime).append('|')
        .append(contentWitness(fs, st)).append('\n')
    }
    val fp = digest(sb.toString)
    fingerprintMemo.put(metaKey, fp)
    fp
  }

  /** md5-digest of a file's first + last 64 bytes (clamped for short
    * files) — the cheap content term of [[pathFingerprint]]. A read
    * failure retries once and then FAILS LOUDLY: silently
    * substituting a fixed token would flip the fingerprint (re-keying
    * every durable artifact to a fresh home) on a transient blip and
    * flip it back afterwards, orphaning the blip-keyed builds. */
  private def contentWitness(fs: FileSystem, st: FileStatus): String = {
    def readOnce(): String = {
      val n = st.getLen
      val span = math.min(64L, n).toInt
      val head = new Array[Byte](span)
      val tail = new Array[Byte](span)
      if (span > 0) {
        val in = fs.open(st.getPath)
        try {
          in.readFully(0L, head)
          in.readFully(n - span, tail)
        } finally in.close()
      }
      val b64 = java.util.Base64.getEncoder
      digest(b64.encodeToString(head) + "|" + b64.encodeToString(tail))
        .take(8)
    }
    try readOnce()
    catch { case _: Throwable => readOnce() }
  }

  /** Register catalog table `name` over a COMMITTED bucketed layout at
    * `location` — the reload half of a durable BUCKETED artifact:
    * `spark.read.parquet` would discard the bucket spec (bucketing
    * lives in the catalog, not the files), so a fresh session
    * re-declares it with CREATE TABLE … CLUSTERED BY … LOCATION over
    * the existing files (Spark recovers each file's bucket id from
    * its name, so the co-location guarantee survives the JVM).
    * When the session ALREADY knows the table, the existing entry is
    * VERIFIED against the request — location, bucket column, bucket
    * count, sort columns — and a mismatch fails loudly: with a
    * persistent metastore (or any name collision) a stale entry
    * pointing at an old location would otherwise serve the wrong
    * layout silently (the r14 ADVICE finding). */
  def registerBucketedTable(s: org.apache.spark.sql.SparkSession,
      name: String, location: String, schemaDdl: String,
      bucketCol: String, nBuckets: Int,
      sortCol: Option[String] = None): Unit =
    if (!s.catalog.tableExists(name)) {
      val sortClause = sortCol.map(c => s" SORTED BY ($c)").getOrElse("")
      s.sql(s"CREATE TABLE $name ($schemaDdl) USING parquet " +
        s"CLUSTERED BY ($bucketCol)$sortClause INTO $nBuckets BUCKETS " +
        s"LOCATION '$location'")
    } else {
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      val haveLoc = meta.storage.locationUri
        .map(u => canonical(u.toString)).getOrElse("")
      val wantLoc = canonical(location)
      require(haveLoc == wantLoc,
        s"catalog table $name points at '$haveLoc' but the caller's " +
          s"artifact lives at '$wantLoc' — refusing to serve a stale " +
          "registration")
      val spec = meta.bucketSpec.getOrElse(
        sys.error(s"catalog table $name has no bucket spec — it is " +
          "not the bucketed artifact registration it collides with"))
      require(spec.numBuckets == nBuckets &&
          spec.bucketColumnNames == Seq(bucketCol) &&
          spec.sortColumnNames == sortCol.toSeq,
        s"catalog table $name bucket spec " +
          s"(${spec.numBuckets} x ${spec.bucketColumnNames
            .mkString(",")}, sorted ${spec.sortColumnNames
            .mkString(",")}) does not match the requested " +
          s"($nBuckets x $bucketCol, sorted ${sortCol.toSeq
            .mkString(",")})")
    }

  // ------------------------------------------------------------------
  // Incremental artifact MAINTENANCE: commit-marked delta dirs under a
  // durable artifact. The nightly loop this closes (the r14 verdict's
  // #2): the admission manifest decides what enters tonight's batch,
  // the staleness cards decide when to REBUILD — and in between,
  // admitted rows APPEND here, so a 100 TB base is rebuilt only when
  // the gate fires, not nightly.
  // ------------------------------------------------------------------

  /** The delta-home convention: `<artifact>/deltas/<name>`. Each delta
    * is itself a [[durable]] commit-marked dir (marker written last,
    * race-safe publish), so a crashed appender leaves no half-visible
    * increment and serving jobs only ever see whole deltas. `name` is
    * the increment's identity (a batch id, a crawl date) — appending
    * the same name twice is a no-op serve, not a duplicate. */
  def deltaDir(artifactDir: String, name: String): String = {
    require(name.nonEmpty && !name.contains("/") &&
        !name.contains("\\") && name != "." && name != "..",
      s"delta name must be a real single path segment, got '$name' — " +
        "'.', '..' or a separator would resolve the delta into the " +
        "artifact root itself")
    s"${canonical(artifactDir)}/deltas/$name"
  }

  /** COMMITTED delta dirs under an artifact, name-sorted — the set a
    * serving job unions with the base. Uncommitted (in-flight or
    * crashed) deltas are invisible by construction. */
  def committedDeltas(artifactDir: String): Seq[String] = {
    val (fs, root) = fsPath(artifactDir)
    val deltas = new Path(root, "deltas")
    if (!fs.exists(deltas)) Seq.empty
    else fs.listStatus(deltas).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, CommitMarker)))
      .map(st => pathString(st.getPath)).sorted
  }

  // ------------------------------------------------------------------
  // Artifact inventory + GC (the r14 verdict's #5): pathFingerprint
  // keying means every regenerated input quietly gets a fresh
  // artifact home — correct, but the orphaned predecessors accumulate
  // in durableRoot forever without these.
  // ------------------------------------------------------------------

  /** The fingerprint suffixes of the SUPPLIED live datasets — an
    * artifact home named `<prefix>_<digest>` is live iff its digest
    * appears here (the digest term of [[durableDirFor]] is
    * prefix-independent, so one suffix covers every family built from
    * that dataset). */
  private def liveSuffixes(
      liveDatasets: Seq[(String, String)]): Set[String] =
    liveDatasets.map { case (ds, sidecar) =>
      digest(ds + "|" + pathFingerprint(s"$ds/$sidecar"))
    }.toSet

  private def listArtifactDirs(root: String): Seq[FileStatus] = {
    val (fs, p) = fsPath(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .sortBy(_.getPath.getName)
  }

  /** One row per artifact home under `root`: (artifact, family,
    * params, committed, n_files, bytes, n_deltas, live).
    *  - `family` is the name up to its last '_' (the
    *    [[durableDirFor]] prefix); staging/trash debris shows up as
    *    its dot-name, uncommitted;
    *  - `live` = the digest suffix matches one of the supplied
    *    (datasetDir, sidecar) pairs under the CURRENT fingerprint —
    *    a regenerated input's predecessors show live=false and are
    *    [[gcArtifacts]] food.
    * Metadata-only: one listing + one contentSummary per artifact
    * (scales with artifact COUNT, never data volume). Registered as
    * the rows-only q346. */
  def inventory(s: org.apache.spark.sql.SparkSession, root: String,
      liveDatasets: Seq[(String, String)])
      : org.apache.spark.sql.DataFrame = {
    val live = liveSuffixes(liveDatasets)
    val (fs, _) = fsPath(root)
    val rows = listArtifactDirs(root).flatMap { st =>
      // per-artifact rows are individually guarded: a dir vanishing
      // between the listing and its stat (a concurrent gcArtifacts —
      // the companion feature — or another job's cleanup) drops ITS
      // row instead of aborting the whole inventory
      try {
        val name = st.getPath.getName
        val cut = name.lastIndexOf('_')
        val family = if (cut > 0) name.substring(0, cut) else name
        val suffix = if (cut > 0) name.substring(cut + 1) else ""
        val committed = fs.exists(new Path(st.getPath, CommitMarker))
        val params =
          try readSmall(fs, new Path(st.getPath, ParamsFile))
          catch { case _: Throwable => "" }
        val summary = fs.getContentSummary(st.getPath)
        Some((name, family, params, committed, summary.getFileCount,
          summary.getLength,
          committedDeltas(pathString(st.getPath)).size, live(suffix)))
      } catch { case _: Throwable => None }
    }
    import s.implicits._
    rows.toDF("artifact", "family", "params", "committed", "n_files",
      "bytes", "n_deltas", "live").orderBy("artifact")
  }

  /** Garbage-collect artifact homes under `root`:
    *  - UNCOMMITTED debris (crashed builds, staging/trash leftovers)
    *    is always collectable;
    *  - COMMITTED artifacts are deleted ONLY when ORPHANED — their
    *    fingerprint suffix matches none of the supplied live
    *    datasets; an artifact still keyed to a live dataset is
    *    REFUSED no matter what (the keep-live contract);
    *  - nothing younger than `minAgeMs` is touched, so an in-flight
    *    build's staging dir or an about-to-commit target cannot be
    *    collected from under its builder.
    * Returns the deleted paths, sorted. Schedule it from the artifact
    * owner's maintenance window; the age guard (default 1 h) is the
    * only concurrency defense a GC can honestly offer on a plain
    * filesystem. */
  def gcArtifacts(root: String, liveDatasets: Seq[(String, String)],
      minAgeMs: Long = 3600000L): Seq[String] = {
    val live = liveSuffixes(liveDatasets)
    val (fs, _) = fsPath(root)
    val now = System.currentTimeMillis()
    listArtifactDirs(root).flatMap { st =>
      val name = st.getPath.getName
      val suffix = name.substring(name.lastIndexOf('_') + 1)
      val committed = fs.exists(new Path(st.getPath, CommitMarker))
      // a marker-mode build IN FLIGHT holds the lock — never collect
      // under a live builder, regardless of age (a crashed builder's
      // stale lock must be removed by the operator first, exactly as
      // the lock-wait error message instructs)
      val locked =
        try fs.exists(new Path(st.getPath, BuildLock))
        catch { case _: Throwable => true }
      if (committed && live(suffix)) None // refused: live artifact
      else if (locked) None // refused: builder may be live
      else if (now - lastActivity(fs, st) < minAgeMs) None // too young
      else {
        try {
          fs.delete(st.getPath, true)
          Some(pathString(st.getPath))
        } catch { case _: Throwable => None }
      }
    }.sorted
  }

  /** The newest modification time anywhere under an artifact dir —
    * the GC age signal. The top-level dir mtime alone is NOT it: a
    * long rename-mode build writing nested payload subdirs can leave
    * the staging dir's own mtime at build start, and an age-based
    * sweep would collect the tree from under the live builder. */
  private def lastActivity(fs: FileSystem, st: FileStatus): Long = {
    var latest = st.getModificationTime
    try {
      val it = fs.listFiles(st.getPath, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getModificationTime > latest)
          latest = f.getModificationTime
      }
    } catch { case _: Throwable => latest = System.currentTimeMillis() }
    latest
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
