package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The durable publish raced against a SIMULATED broken object store
  * ([[FaultyFileSystem]]: non-exclusive create + non-atomic copy-loop
  * rename) — the r15 verdict's top item, part (b). Each scenario is
  * DETERMINISTIC (hook-ordered, not stochastic):
  *
  *  1. lock THEFT under non-exclusive create: the victim builder whose
  *     token was silently overwritten aborts WITHOUT committing and
  *     serves the thief's tree — exactly one commit, no interleaved
  *     files at the target (the staged marker-mode build keeps the
  *     victim's payload out of the target entirely), manifest clean;
  *  2. a commit landing MID-CLEAR is never deleted: the clear aborts
  *     and the builder serves the winner's tree (the r15 ADVICE
  *     marker-deletion finding, exercised on the faulty store);
  *  3. a torn copy-loop "rename" on a MISCONFIGURED store (rename mode
  *     forced where rename isn't atomic) fails LOUDLY, and the torn
  *     marker'd tree it can leave is caught by [[Artifacts.verifyArtifact]]
  *     — the defense-in-depth for exactly this misconfiguration;
  *  4. the per-scheme commit override classifies the faulty scheme
  *     independently of the local one (a mixed lake must not share one
  *     global answer).
  */
class FaultyStoreSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SharedSession.spark
    FaultyFileSystem.register(s.sparkContext.hadoopConfiguration)
    s
  }

  private def withProp[T](key: String, value: String)(body: => T): T = {
    val prev = sys.props.get(key)
    sys.props(key) = value
    try body
    finally prev match {
      case Some(v) => sys.props(key) = v
      case None => sys.props -= key
    }
  }

  /** A fresh artifact home addressed through the faulty scheme; the
    * returned local path inspects the same tree via java.nio. */
  private def faultyHome(): (String, java.nio.file.Path) = {
    val local = Files.createTempDirectory("graft_faulty_")
      .resolve("home")
    ("faulty://" + local.toString, local)
  }

  /** Write into a faulty:// build dir via its 1:1 local mapping. */
  private def put(d: String, name: String, content: String): Unit =
    Files.writeString(
      Paths.get(new java.net.URI(d).getPath).resolve(name), content)

  test("per-scheme commit override: the faulty scheme can be forced " +
      "to marker mode while the local scheme stays on rename") {
    spark // force registration
    val (faultyFs, _) = {
      val p = new org.apache.hadoop.fs.Path("faulty:///tmp")
      (p.getFileSystem(
        spark.sparkContext.hadoopConfiguration), ())
    }
    val localFs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    withProp("graft.artifacts.commit.faulty", "marker") {
      assert(Artifacts.commitMode(faultyFs) == "marker")
      assert(Artifacts.commitMode(localFs) == "rename")
    }
    // the global override still covers both
    withProp("graft.artifacts.commit", "marker") {
      assert(Artifacts.commitMode(faultyFs) == "marker")
      assert(Artifacts.commitMode(localFs) == "marker")
    }
  }

  test("lock theft under NON-EXCLUSIVE create: the victim builder " +
      "aborts without committing, serves the thief's tree — exactly " +
      "one commit, no interleaved payload at the target, manifest " +
      "verifies clean") {
    spark
    FaultyFileSystem.reset()
    withProp("graft.artifacts.commit.faulty", "marker") {
      val (dir, local) = faultyHome()
      val before = Artifacts.durableBuilds.get()
      val aInBuild = new java.util.concurrent.CountDownLatch(1)
      val thiefDone = new java.util.concurrent.CountDownLatch(1)
      val aErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val tA = new Thread(() => {
        try {
          Artifacts.durable("victimA", dir, "p=1") { d =>
            aInBuild.countDown()
            // hold the victim's build open while the thief steals the
            // lock (faulty create silently overwrites the token),
            // builds, and COMMITS
            assert(thiefDone.await(60,
              java.util.concurrent.TimeUnit.SECONDS))
            put(d, "payload", "A")
          }
          ()
        } catch { case t: Throwable => aErr.set(t) }
      })
      tA.start()
      assert(aInBuild.await(60, java.util.concurrent.TimeUnit.SECONDS))
      // the thief: same home, same params, create(lock, false)
      // silently overwrites the victim's token on this store
      Artifacts.durable("thiefB", dir, "p=1") { d =>
        put(d, "payload", "B")
      }
      thiefDone.countDown()
      tA.join(60000)
      assert(aErr.get() == null,
        s"the victim must serve, not fail: ${aErr.get()}")
      assert(Artifacts.durableBuilds.get() == before + 1,
        "exactly one of the two builders may commit")
      assert(Artifacts.isCommitted(dir))
      assert(Files.readString(local.resolve("payload")) == "B",
        "the committed tree must be the thief's complete build")
      // the victim's staged build never touched the target: the
      // manifest verifies with no strays and no torn files
      assert(Artifacts.verifyArtifact(dir) == ((1, 1)))
      // no staging debris left behind by either builder
      val leftovers = Files.list(local.getParent).iterator()
      var debris = List.empty[String]
      while (leftovers.hasNext) {
        val n = leftovers.next().getFileName.toString
        if (n.startsWith(".graft_")) debris ::= n
      }
      assert(debris.isEmpty, s"race left debris: $debris")
    }
  }

  test("a commit landing MID-CLEAR is never deleted: the clear " +
      "aborts, the builder serves the winner's tree, stale debris " +
      "survives untouched (bounded damage, no torn commit)") {
    spark
    FaultyFileSystem.reset()
    withProp("graft.artifacts.commit.faulty", "marker") {
      val (dir, local) = faultyHome()
      // stale crash debris at the target: the builder will try to
      // clear it before moving its build in
      Files.createDirectories(local)
      Files.writeString(local.resolve("stale_junk"), "old")
      val before = Artifacts.durableBuilds.get()
      val targetName = local.getFileName.toString
      var fired = false
      // the racing winner lands its FULL commit exactly inside the
      // clear window — after the builder's marker check, before its
      // first delete (the listStatus call between them is the seam)
      FaultyFileSystem.onListStatus = { p =>
        if (!fired && p.getName == targetName &&
            Files.exists(local.resolve("stale_junk"))) {
          fired = true
          Files.writeString(local.resolve("winner_payload"), "W")
          Files.writeString(
            local.resolve(Artifacts.ParamsFile), "p=1")
          Files.write(local.resolve(Artifacts.CommitMarker),
            Array.emptyByteArray)
        }
      }
      try {
        Artifacts.durable("midClear", dir, "p=1") { d =>
          put(d, "payload", "LOSER")
        }
      } finally FaultyFileSystem.reset()
      assert(fired, "the mid-clear commit hook never fired")
      assert(Files.exists(local.resolve(Artifacts.CommitMarker)),
        "the winner's commit marker was deleted by the clear loop")
      assert(Files.exists(local.resolve("winner_payload")),
        "the winner's payload was deleted by the clear loop")
      assert(!Files.exists(local.resolve("payload")),
        "the loser's build leaked into the committed tree")
      assert(Files.exists(local.resolve("stale_junk")),
        "the clear must abort entirely once the marker appears")
      assert(Artifacts.durableBuilds.get() == before,
        "the loser must serve the winner's tree, not commit")
    }
  }

  test("a torn copy-loop 'rename' on a misconfigured store fails " +
      "LOUDLY — and the marker'd torn tree it leaves is exactly what " +
      "verifyArtifact detects") {
    spark
    FaultyFileSystem.reset()
    // rename mode FORCED onto the faulty scheme: the operator
    // misclassified the store (its rename is a copy loop)
    withProp("graft.artifacts.commit.faulty", "rename") {
      val (dir, local) = faultyHome()
      var copied = 0
      FaultyFileSystem.preCopy = { _ =>
        copied += 1
        // lexical copy order puts _GRAFT_COMMIT first: tear after the
        // sidecars, before the payload — the worst-case torn publish
        if (copied > 2) sys.error("store blipped mid-copy")
      }
      val e =
        try intercept[Exception] {
          Artifacts.durable("tornRename", dir, "p=1") { d =>
            put(d, "payload", "X")
          }
        } finally FaultyFileSystem.reset()
      // loud, not silent: the builder cannot tell a torn copy from a
      // lost race, and the winner-must-be-committed check trips
      assert(e != null)
      // the hazard: the torn tree CARRIES the marker (copied first)…
      assert(Artifacts.isCommitted(dir),
        "this scenario exists because the marker copies first")
      assert(!Files.exists(local.resolve("payload")),
        "payload should be missing from the torn tree")
      // …and the manifest check catches it at serve time
      val v = intercept[Exception](Artifacts.verifyArtifact(dir))
      assert(v.getMessage.contains("MISSING") ||
        v.getMessage.contains("manifest"), v.getMessage)
    }
  }
}
