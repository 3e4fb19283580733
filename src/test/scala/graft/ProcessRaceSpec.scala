package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The durable publish raced across REAL PROCESSES — the r15
  * verdict's top item, part (a). DurableArtifactsSpec races two
  * threads in one JVM; the layer's actual claim is cross-JOB safety
  * on a shared lake, where the racers share nothing but the
  * filesystem (no common memo, no common locks, no common JVM
  * shutdown ordering). Each case forks two full JVMs running
  * [[DurableRaceChild]] against one artifact home and asserts from
  * the OUTSIDE:
  *  - both processes exit 0 (the loser serves, never crashes);
  *  - exactly ONE process commits (its durableBuilds counter is 1);
  *  - the surviving tree is one complete committed build — its
  *    payload names a single owner and its manifest verifies with no
  *    strays (the loser's build never leaked in);
  *  - no staging/trash debris outlives the race.
  * Run for BOTH commit protocols: `rename` (both builders collide at
  * the publish rename) and `marker` (builders contend on the lock). */
class ProcessRaceSpec extends AnyFunSuite {

  private case class ChildResult(owner: String, built: Boolean,
      commits: Long, exit: Int, log: String)

  private def fork(mode: String, dir: String, params: String,
      owner: String, barrierDir: String, n: Int, where: String)
      : Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin",
      "java").toString
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(java, "-Xmx512m", "-cp", cp,
      "graft.DurableRaceChild", mode, dir, params, owner, barrierDir,
      n.toString, where)
    pb.redirectErrorStream(true)
    pb.start()
  }

  private def harvest(owner: String, p: Process): ChildResult = {
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val exited = p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    assert(exited, s"$owner did not exit; log:\n$out")
    val line = out.linesIterator
      .find(_.startsWith("RACE_RESULT")).getOrElse("")
    val kv = line.split(' ').drop(1)
      .map(_.split('=')).collect { case Array(k, v) => k -> v }.toMap
    ChildResult(owner, kv.get("built").contains("true"),
      kv.get("commits").map(_.toLong).getOrElse(-1L),
      p.exitValue(), out)
  }

  private def race(mode: String, where: String): Unit = {
    val root = Files.createTempDirectory(s"graft_procrace_$mode")
    val dir = root.resolve("artifact").toString
    val barrier = Files.createDirectories(root.resolve("barrier"))
      .toString
    val pA = fork(mode, dir, "p=1", "procA", barrier, 2, where)
    val pB = fork(mode, dir, "p=1", "procB", barrier, 2, where)
    val a = harvest("procA", pA)
    val b = harvest("procB", pB)
    assert(a.exit == 0, s"procA failed (exit ${a.exit}):\n${a.log}")
    assert(b.exit == 0, s"procB failed (exit ${b.exit}):\n${b.log}")
    // exactly one PROCESS commits
    assert(a.commits + b.commits == 1,
      s"commit counters: procA=${a.commits} procB=${b.commits}")
    if (where == "inBuild")
      assert(a.built && b.built,
        "the in-build barrier must force both processes to build")
    else
      assert(a.built || b.built, "someone must have built")
    // the surviving tree is ONE complete committed build
    assert(Artifacts.isCommitted(dir))
    val payload = Files.readString(Paths.get(dir, "payload"))
    assert(payload == "procA" || payload == "procB", payload)
    val winner = if (a.commits == 1) "procA" else "procB"
    assert(payload == winner,
      s"payload '$payload' is not the committing process '$winner'")
    // manifest verifies: no strays, no torn files — the loser's build
    // never leaked into the published tree
    assert(Artifacts.verifyArtifact(dir) == ((1, 1)))
    // no staging/trash debris outlives the race
    val s = Files.list(root)
    val debris =
      try {
        val it = s.iterator()
        var acc = List.empty[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith(".graft_")) acc ::= n
        }
        acc
      } finally s.close()
    assert(debris.isEmpty, s"race left debris: $debris")
  }

  test("two REAL JVMs racing one rename-mode publish: both build, " +
      "one commits, the loser serves the winner's complete tree") {
    race("rename", "inBuild")
  }

  test("two REAL JVMs contending one marker-mode home: one builds " +
      "under the lock and commits, the other serves the marker") {
    race("marker", "preCall")
  }

  test("two REAL JVMs racing one DELTA append under a committed home " +
      "(the nightly loop's hottest write): one delta commits, the " +
      "home and its marker are untouched, the delta verifies clean") {
    // the SURVEY claim on trial: "appends are durable() dirs
    // themselves — marker-last, race-safe, idempotent per delta name"
    // — raced across processes, not threads
    val root = Files.createTempDirectory("graft_procrace_delta")
    val home = root.resolve("artifact").toString
    Artifacts.durable("deltaRaceBase", home, "p=1") { d =>
      Files.writeString(Paths.get(d, "base_payload"), "base")
    }
    val delta = Artifacts.deltaDir(home, "day1")
    val barrier = Files.createDirectories(root.resolve("barrier"))
      .toString
    val pA = fork("rename", delta, "d=1", "procA", barrier, 2, "inBuild")
    val pB = fork("rename", delta, "d=1", "procB", barrier, 2, "inBuild")
    val a = harvest("procA", pA)
    val b = harvest("procB", pB)
    assert(a.exit == 0, s"procA failed:\n${a.log}")
    assert(b.exit == 0, s"procB failed:\n${b.log}")
    assert(a.commits + b.commits == 1,
      s"delta commits: procA=${a.commits} procB=${b.commits}")
    // the delta is committed and serving-visible; the HOME's own
    // commit and payload are untouched by the race
    assert(Artifacts.committedDeltas(home) ==
      Seq(Artifacts.canonical(delta)))
    assert(Artifacts.isCommitted(home))
    assert(Files.readString(Paths.get(home, "base_payload")) == "base")
    assert(Artifacts.verifyArtifact(home)._2 == 1)
    assert(Artifacts.verifyArtifact(delta) == ((1, 1)))
    val payload = Files.readString(
      Paths.get(Artifacts.canonical(delta), "payload"))
    assert(payload == (if (a.commits == 1) "procA" else "procB"))
  }
}
