package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` raw filesystem with the fork-and-exec permission path
  * replaced by one java.nio syscall.
  *
  * Without the native Hadoop library (absent in this sandbox, and in
  * most Spark-on-K8s images), `RawLocalFileSystem.setPermission` falls
  * back to `Shell.execCommand("chmod", ...)` — a full process
  * fork+exec — and EVERY `FileSystem.create` applies the default
  * permission through it. The engine's commit machinery creates many
  * small files per DML statement (staged parquet, manifests, metadata
  * JSON, streaming offset/commit logs), so jstack sampling of the bench
  * showed the driver spending a measurable share of wall time inside
  * `ProcessImpl.forkAndExec`. `Files.setPosixFilePermissions` is the
  * same chmod as one library call.
  *
  * The sticky bit (not representable in PosixFilePermission) and
  * non-POSIX filesystems fall back to the shell path.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission._

  private val bits = Array(
    OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
    GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
    OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val m = permission.toShort.toInt
    if ((m & ~0x1ff) != 0) super.setPermission(p, permission) // sticky etc.
    else try {
      val perms = java.util.EnumSet.noneOf(
        classOf[java.nio.file.attribute.PosixFilePermission])
      var i = 0
      while (i < 9) {
        if ((m & (1 << (8 - i))) != 0) perms.add(bits(i))
        i += 1
      }
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
      ()
    } catch {
      case _: UnsupportedOperationException => super.setPermission(p, permission)
    }
  }
}

/** Drop-in `LocalFileSystem` (some Spark internals cast the `file://`
  * filesystem to that type via `FileSystem.getLocal`) built on
  * [[FastRawLocalFileSystem]], with checksum siblings disabled: the
  * `.crc` files double every create (and its permission call) and
  * nothing in the engine reads them — durability on a real deployment
  * comes from HDFS/S3, which bind to their own scheme and are untouched
  * by this `file://`-only override (`spark.hadoop.fs.file.impl` in
  * [[graft.GraftSession]]).
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem) {
  override def initialize(uri: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
