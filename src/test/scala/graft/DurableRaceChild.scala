package graft

import java.nio.file.{Files, Paths}

/** Child main forked by [[ProcessRaceSpec]]: one REAL JVM racing the
  * durable publish of one artifact home against sibling processes —
  * the cross-JOB form of DurableArtifactsSpec's thread races (two
  * `new Thread`s in one JVM share the memo, the JIT, the page cache;
  * two jobs on a shared lake share NOTHING but the filesystem).
  *
  * Args: `mode dir params owner barrierDir nRacers where`
  *  - `mode`: commit protocol to force (`rename` | `marker`);
  *  - `where`: `inBuild` parks every racer INSIDE its build lambda
  *    until all have built (forces the publish collision — rename
  *    mode only: marker mode serializes builders on the lock, so an
  *    in-build barrier would deadlock by design), `preCall` lines the
  *    racers up immediately before `durable()` (marker mode: the lock
  *    contention race).
  *
  * Prints one machine-readable line:
  * `RACE_RESULT owner=<o> built=<bool> commits=<n>` — `commits` is
  * this PROCESS's durableBuilds counter, so the parent can assert
  * exactly one process committed. */
object DurableRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(mode, dir, params, owner, barrierDir, nRacersS, where) =
      args
    sys.props("graft.artifacts.commit") = mode
    val n = nRacersS.toInt
    def announce(tag: String): Unit =
      Files.createFile(Paths.get(barrierDir, s"$tag.$owner"))
    def await(tag: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      def count(): Long = {
        val s = Files.list(Paths.get(barrierDir))
        try s.filter(_.getFileName.toString.startsWith(tag + "."))
          .count()
        finally s.close()
      }
      while (count() < n) {
        require(System.nanoTime() < deadline,
          s"barrier '$tag' timed out in $owner")
        Thread.sleep(20)
      }
    }
    if (where == "preCall") { announce("start"); await("start") }
    var built = false
    Artifacts.durable(owner, dir, params) { d =>
      built = true
      if (where == "inBuild") { announce("build"); await("build") }
      Files.writeString(Paths.get(d, "payload"), owner)
    }
    println(s"RACE_RESULT owner=$owner built=$built " +
      s"commits=${Artifacts.durableBuilds.get()}")
  }
}
