package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** A local-backed [[org.apache.hadoop.fs.FileSystem]] that SIMULATES
  * the two hazards real object stores add over POSIX — the exact
  * assumptions the durable layer's marker-mode protocol must survive:
  *
  *  - `create(path, overwrite = false)` is NOT exclusive: like a
  *    HEAD-then-PUT store, a second writer silently overwrites an
  *    existing file even when it asked for exclusive create (the
  *    BuildLock hazard);
  *  - `rename` is NOT atomic: a directory "rename" is a copy loop —
  *    entries copied one at a time in lexical order, then the source
  *    deleted — and an injectable per-entry hook can tear it mid-copy
  *    (the reason object-store schemes default to marker mode).
  *
  * Registered under the `faulty://` scheme
  * (`fs.faulty.impl = graft.FaultyFileSystem`); paths map 1:1 onto
  * the local filesystem, so specs can inspect trees with java.nio.
  * Hooks live on the companion — reset them in `finally`. */
class FaultyFileSystem extends RawLocalFileSystem {
  private var myUri: URI = _

  override def getScheme: String = "faulty"
  // the superclass constructor consults getUri before this class's
  // fields initialize — fall back to the scheme default until then
  override def getUri: URI =
    if (myUri == null) URI.create("faulty:///") else myUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    myUri = URI.create(name.getScheme + ":///")
    super.initialize(name, conf)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    FaultyFileSystem.onListStatus(f)
    super.listStatus(f)
  }

  /** The HEAD-then-PUT simulation: exclusivity is requested and NOT
    * honored — `overwrite = false` behaves like `overwrite = true`.
    * Both public overloads route here (`fs.create(p, false)` hits the
    * permission-less one directly on RawLocalFileSystem). */
  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication,
      blockSize, progress)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable)
      : FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  /** The copy-loop simulation: a file "rename" is copy + delete; a
    * directory "rename" copies entries one at a time (lexical order —
    * sidecars sort before payload, the worst case for a torn publish)
    * and deletes the source last. [[FaultyFileSystem.preCopy]] fires
    * before each FILE copy and may throw to tear the loop. */
  override def rename(src: Path, dst: Path): Boolean = {
    val st = getFileStatus(src)
    if (st.isFile) {
      FaultyFileSystem.preCopy(src)
      FileUtil.copy(this, src, this, dst, true, getConf)
    } else {
      if (exists(dst)) return false
      mkdirs(dst)
      super.listStatus(src).sortBy(_.getPath.getName).foreach { e =>
        if (!rename(e.getPath, new Path(dst, e.getPath.getName)))
          return false
      }
      delete(src, true)
      true
    }
  }
}

object FaultyFileSystem {
  /** Fires before each file copy inside [[FaultyFileSystem.rename]];
    * throw to tear the copy loop mid-"rename". */
  @volatile var preCopy: Path => Unit = _ => ()

  /** Fires on entry to [[FaultyFileSystem.listStatus]] — the seam the
    * marker-mode debris clear walks through, so a spec can land a
    * racing commit exactly inside the clear window. */
  @volatile var onListStatus: Path => Unit = _ => ()

  def reset(): Unit = { preCopy = _ => (); onListStatus = _ => () }

  /** Register the scheme on a Hadoop configuration. */
  def register(conf: Configuration): Unit =
    conf.set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
}
