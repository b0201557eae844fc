package graft

import java.io.{EOFException, File, FileNotFoundException, FileOutputStream, OutputStream}
import java.net.URI
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, FSInputStream, FileUtil, Path}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission

/** Test-only Hadoop FileSystem registered under a non-`file` scheme
  * (`mock3a://`) that emulates the S3A *contract surface*, not just scheme
  * routing (SURVEY.md §1.3: s3a is config-not-code; hadoop-aws is absent
  * from this container's jar set, so the connector behaviors a real
  * `s3a://` read exercises are reproduced here and asserted in
  * ObjectStoreContractSpec):
  *
  *   - **Ranged GETs + seek**: `open()` returns a stream where each
  *     contiguous read sequence is one emulated ranged GET of at most
  *     `ReadRange` bytes (the `fs.s3a.readahead.range` analogue); any
  *     out-of-range or backward `seek` aborts the open GET and the next
  *     read issues a new one — exactly S3AInputStream's model, and the
  *     access pattern Parquet's footer-then-column-chunk reads depend on.
  *   - **Multipart upload boundaries**: `create()` buffers into fixed-size
  *     parts staged beside the target (dot-prefixed = hidden to Hadoop
  *     listings), "completing the upload" — concatenating parts into the
  *     visible object — only at `close()`. Until then the object does NOT
  *     exist (S3 visibility-at-complete semantics).
  *   - **No append**: object stores are write-once; `append()` throws,
  *     as S3AFileSystem does.
  *   - **Copy-based rename**: `rename()` is a recursive copy + delete
  *     through the same GET/multipart streams (S3 has no rename; S3A
  *     emulates it with server-side COPY) — non-atomic by construction.
  *
  * Metadata ops (listStatus, getFileStatus, mkdirs, delete) delegate to
  * the local filesystem; FileStatus paths stay qualified under `mock3a:`
  * via the overridden `getUri`. Static counters let specs assert the
  * emulated protocol was actually exercised.
  */
object MockObjectStoreFs {
  /** Multipart part boundary. Real S3 minimum is 5 MiB; scaled down so a
    * fixture-sized parquet write completes multiple parts. */
  val PartSize: Int = 256 * 1024
  /** Emulated ranged-GET window (`fs.s3a.readahead.range` analogue). */
  val ReadRange: Long = 64L * 1024

  val getRequests = new AtomicLong
  val backwardSeeks = new AtomicLong
  val multipartUploads = new AtomicLong
  val partsCompleted = new AtomicLong
  def resetCounters(): Unit = {
    getRequests.set(0); backwardSeeks.set(0)
    multipartUploads.set(0); partsCompleted.set(0)
  }
}

class MockObjectStoreFs extends RawLocalFileSystem {
  import MockObjectStoreFs._

  override def getScheme: String = "mock3a"
  override def getUri: URI = URI.create("mock3a:///")

  // ---- ranged-GET read path ----------------------------------------------

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val file = pathToFile(f)
    if (!file.isFile) throw new FileNotFoundException(f.toString)
    new FSDataInputStream(new RangedGetStream(file))
  }

  /** One "open GET" at a time: reads inside [pos, rangeEnd) stream from the
    * current GET; a seek outside it (or past it) aborts and the next read
    * re-issues. Mirrors S3AInputStream::seekInStream + reopen. */
  private final class RangedGetStream(file: File) extends FSInputStream {
    private val ch: FileChannel =
      FileChannel.open(file.toPath, StandardOpenOption.READ)
    private val len = ch.size()
    private var pos = 0L
    private var rangeEnd = -1L // exclusive end of the open GET; -1 = none

    override def seek(p: Long): Unit = {
      if (p < 0) throw new EOFException(s"negative seek: $p")
      if (p > len) throw new EOFException(s"seek past EOF: $p > $len")
      if (p < pos) backwardSeeks.incrementAndGet()
      if (p < pos || p >= rangeEnd) rangeEnd = -1L // abort the open GET
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    private def ensureRange(): Boolean = {
      if (pos >= len) return false
      if (rangeEnd < 0 || pos >= rangeEnd) {
        getRequests.incrementAndGet()
        rangeEnd = math.min(len, pos + ReadRange)
      }
      true
    }

    override def read(): Int = {
      if (!ensureRange()) return -1
      val buf = ByteBuffer.allocate(1)
      val n = ch.read(buf, pos)
      if (n <= 0) -1 else { pos += 1; buf.get(0) & 0xff }
    }

    override def read(b: Array[Byte], off: Int, length: Int): Int = {
      if (length == 0) return 0
      if (!ensureRange()) return -1
      val want = math.min(length.toLong, rangeEnd - pos).toInt
      val n = ch.read(ByteBuffer.wrap(b, off, want), pos)
      if (n <= 0) -1 else { pos += n; n }
    }

    override def available(): Int = math.min(len - pos, Int.MaxValue).toInt
    override def close(): Unit = ch.close()
  }

  // ---- multipart write path / append rejection ---------------------------

  /** Single funnel for every create/append variant in RawLocalFileSystem. */
  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean, permission: FsPermission): OutputStream = {
    if (append)
      throw new UnsupportedOperationException(
        "append() is not supported by object stores (S3A contract)")
    new MultipartOutputStream(pathToFile(f))
  }

  /** Buffers `PartSize` parts into hidden staging files; on close,
    * "completes the upload" by concatenating parts into the target —
    * before that the object is invisible (nothing exists at the target
    * path). */
  private final class MultipartOutputStream(target: File) extends OutputStream {
    multipartUploads.incrementAndGet()
    private val part = new Array[Byte](PartSize)
    private var partFill = 0
    private var partNo = 0
    private var closed = false
    private def stagingFile(n: Int) =
      new File(target.getParentFile, s".${target.getName}.mpu-$n")

    private def uploadPart(): Unit = {
      partNo += 1
      val out = new FileOutputStream(stagingFile(partNo))
      try out.write(part, 0, partFill) finally out.close()
      partsCompleted.incrementAndGet()
      partFill = 0
    }

    override def write(b: Int): Unit = {
      part(partFill) = b.toByte; partFill += 1
      if (partFill == PartSize) uploadPart()
    }
    override def write(b: Array[Byte], off: Int, length: Int): Unit = {
      var o = off; var rem = length
      while (rem > 0) {
        val n = math.min(rem, PartSize - partFill)
        System.arraycopy(b, o, part, partFill, n)
        partFill += n; o += n; rem -= n
        if (partFill == PartSize) uploadPart()
      }
    }

    override def close(): Unit = {
      if (closed) return
      closed = true
      if (partFill > 0 || partNo == 0) uploadPart() // empty object = 1 empty part
      val out = new FileOutputStream(target)
      try {
        (1 to partNo).foreach { n =>
          val sf = stagingFile(n)
          Files.copy(sf.toPath, out)
          sf.delete()
        }
      } finally out.close()
    }
  }

  // ---- copy-based rename -------------------------------------------------

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // route through our own streams: recursive GET + multipart PUT + delete,
    // the S3A COPY-object emulation (non-atomic; no native rename exists)
    FileUtil.copy(this, src, this, dst, /*deleteSource=*/ true, getConf)
  }
}
