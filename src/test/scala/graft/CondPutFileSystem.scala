package graft

import java.io.ByteArrayOutputStream
import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, FSDataOutputStreamBuilder, Path, RawLocalFileSystem}

/**
 * Test shim modeling an object store with HADOOP-19256 conditional-create
 * semantics (the s3a `fs.option.create.conditional.overwrite` If-None-Match
 * PUT): bytes buffer invisibly until `close()`, and the close COMPLETES the
 * upload atomically iff no object exists at the path — the conflict
 * surfaces AT CLOSE, exactly the shape [[graft.log.GwLog.commitViaConditionalPut]]
 * must handle. `rename` and plain `create` keep RawLocalFileSystem's
 * non-atomic behavior (this is an "object store": no atomic
 * create-no-overwrite outside the conditional PUT), and the scheme is not
 * in [[graft.log.GwLog.atomicCreateScheme]], so commits negotiate the
 * conditional path for real.
 */
class CondPutFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cput"
  override def getUri: URI = URI.create("cput:///")

  override def createFile(path: Path): FSDataOutputStreamBuilder[_, _] =
    new CondPutFileSystem.Builder(this, path)
}

/** Like [[CondPutFileSystem]] but WITHOUT the conditional-create capability:
  * the default builder rejects the unknown mandatory key at build(), which
  * must push GwLog onto the write-temp + rename-claim fallback. */
class NoCondPutFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "noput"
  override def getUri: URI = URI.create("noput:///")
}

object CondPutFileSystem {
  /** Conditional-create builds observed (capability negotiations that
    * reached the PUT path) — lets the spec pin that the conditional
    * protocol actually ran rather than a silent fallback. */
  val conditionalBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  final class Builder(fs0: CondPutFileSystem, p: Path)
    extends FSDataOutputStreamBuilder[FSDataOutputStream, Builder](fs0, p) {

    override def getThisBuilder: Builder = this

    override def build(): FSDataOutputStream = {
      // builder spec: reject mandatory keys this store does not understand
      rejectUnknownMandatoryKeys(
        java.util.Collections.singleton(graft.log.GwLog.ConditionalCreateOpt),
        s" for $p")
      if (!getOptions.getBoolean(graft.log.GwLog.ConditionalCreateOpt, false))
        return fs0.create(p, getFlags.contains(org.apache.hadoop.fs.CreateFlag.OVERWRITE))
      conditionalBuilds.incrementAndGet()
      val local = fs0.pathToFile(p).toPath
      java.nio.file.Files.createDirectories(local.getParent)
      val buf = new ByteArrayOutputStream()
      val sink = new java.io.OutputStream {
        override def write(b: Int): Unit = buf.write(b)
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          buf.write(b, off, len)
        override def close(): Unit = {
          // the PUT completes here: CREATE_NEW is the If-None-Match —
          // atomic, winner decided by the "store", conflict at close
          val out = java.nio.file.Files.newOutputStream(local,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try out.write(buf.toByteArray) finally out.close()
        }
      }
      new FSDataOutputStream(sink, null)
    }
  }
}
