package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** O4 (deployment topology) executable artifact: `bin/graft-submit`
  * resolves DEPLOY.md's cluster shape into a concrete spark-submit
  * command. --dry-run prints the resolved command line, so the
  * derivations (shuffle partitions from total cores, AQE + skew-join,
  * scan split size, resource flags only off local) are pinned here
  * without launching a JVM. The script is also exercised for real
  * against sf0.001 (see DEPLOY.md's "smoke run" note).
  */
class LauncherSpec extends AnyFunSuite {
  private val script = "bin/graft-submit"

  // a placeholder jar so --dry-run needs no prior `sbt package` —
  // the spec pins the command DERIVATIONS, not the artifact build
  private val stubJar = {
    val f = java.io.File.createTempFile("graft-stub", ".jar")
    f.deleteOnExit()
    f.getAbsolutePath
  }

  private def dryRun(args: String*): String = {
    val out = new StringBuilder
    val code = Process(
      Seq("bash", script, "--dry-run", "--jar", stubJar) ++ args,
      new java.io.File(".")).!(ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n')))
    assert(code == 0, s"graft-submit failed:\n$out")
    out.toString
  }

  test("script parses (bash -n)") {
    assert(Seq("bash", "-n", script).! == 0)
  }

  test("local master: cores from local[N], no executor resource flags") {
    val cmd = dryRun("--master", "local[32]", "--class", "graft.Bench")
    assert(cmd.contains("spark-submit"))
    assert(cmd.contains("--class graft.Bench"))
    assert(cmd.contains("spark.sql.shuffle.partitions=96")) // 3 x 32
    assert(cmd.contains("spark.sql.adaptive.enabled=true"))
    assert(cmd.contains("spark.sql.adaptive.skewJoin.enabled=true"))
    assert(cmd.contains("spark.sql.files.maxPartitionBytes=268435456"))
    assert(!cmd.contains("--num-executors"))
  }

  test("cluster master: DEPLOY.md resource shape and 3x-cores shuffle") {
    val cmd = dryRun("--master", "yarn", "--executors", "1000",
      "--executor-cores", "4", "--class", "graft.Verify")
    assert(cmd.contains("--num-executors 1000"))
    assert(cmd.contains("--executor-cores 4"))
    assert(cmd.contains("spark.sql.shuffle.partitions=12000")) // 3 x 4000
    assert(cmd.contains("spark.executor.memoryOverheadFactor=0.125"))
  }

  test("local[*], bare local, and malformed local masters") {
    // local[*] = every host core, still the local branch
    val star = dryRun("--master", "local[*]", "--class", "graft.Bench")
    assert(!star.contains("--num-executors"),
      "local[*] fell through to the cluster resource branch")
    val nproc = Runtime.getRuntime.availableProcessors()
    assert(star.contains(s"spark.sql.shuffle.partitions=${3 * nproc}"))
    // bare "local" is Spark's single-thread mode
    val bare = dryRun("--master", "local", "--class", "graft.Bench")
    assert(!bare.contains("--num-executors"))
    assert(bare.contains("spark.sql.shuffle.partitions=3"))
    // any other local-ish master is rejected, never given the
    // 1000-executor cluster shape
    val out = new StringBuilder
    val code = Process(Seq("bash", script, "--dry-run", "--jar", stubJar,
      "--master", "local-cluster[2,1,1024]"), new java.io.File("."))
      .!(ProcessLogger(s => out.append(s), s => out.append(s)))
    assert(code == 2, s"expected rejection, got rc=$code:\n$out")
    assert(out.toString.contains("unsupported local master"))
  }

  test("app args pass through after --") {
    val cmd = dryRun("--class", "graft.Verify", "--",
      "/root/testdata/sf0.001", "/tmp/launcher_out")
    assert(cmd.contains("/root/testdata/sf0.001"))
    assert(cmd.contains("/tmp/launcher_out"))
  }
}
