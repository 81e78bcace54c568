package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * Local filesystem whose permission operations use java.nio instead of
 * forking a `chmod` process per call.
 *
 * Without the hadoop native library (libhadoop.so — absent from plain
 * spark-jars deployments), `RawLocalFileSystem.setPermission` shells out
 * to `chmod` through `Shell.execCommand`, and the local FS calls it on
 * EVERY file create and mkdir (`LocalFSFileOutputStream` applies the
 * creation permission, `mkOneDirWithMode` likewise). A driver-side commit
 * therefore pays a process fork+exec (~5-15 ms each, worse under load)
 * per staged parquet file, per .crc shadow file, per log JSON, per
 * committer setup — profiling showed ~10% of a commit-heavy gate's wall
 * inside `ProcessImpl.forkAndExec` (OPTIMIZATION_r13.md). java.nio's
 * `Files.setPosixFilePermissions` is a single syscall.
 *
 * Scope: local FS only — hdfs/s3 schemes never hit this path, so wiring
 * this class in is an exact no-op for cluster deployments. Permission
 * SEMANTICS are unchanged: the same 9-bit rwx mask is applied; the rare
 * modes java.nio cannot express (sticky/setuid/setgid) fall back to the
 * forking implementation.
 */
class GwNioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    import java.nio.file.attribute.PosixFilePermission
    import java.nio.file.attribute.PosixFilePermission._
    val order = Array(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
      GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
      OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
    val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    var i = 0
    while (i < 9) {
      if ((bits & (1 << (8 - i))) != 0) set.add(order(i))
      i += 1
    }
    try {
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      ()
    } catch {
      // non-POSIX store: keep the contract by delegating to the default
      case _: UnsupportedOperationException => super.setPermission(p, permission)
    }
  }
}

/** The checksummed local FS over [[GwNioRawLocalFileSystem]] — drop-in for
  * `fs.file.impl` (same `file` scheme, same .crc shadow-file behavior as
  * the default LocalFileSystem; only the permission syscall path differs). */
class GwNioLocalFileSystem extends LocalFileSystem(new GwNioRawLocalFileSystem)
