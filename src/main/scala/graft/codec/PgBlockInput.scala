package graft.codec

import java.io.{EOFException, InputStream}

/** Block-buffered big-endian reader for PGCOPY payload decode.
  *
  * The decode loop runs per field per row on every scan task — through
  * `DataInputStream` each fixed-width primitive costs one virtual
  * `read()` call PER BYTE on the wrapped stream (readInt = 4, and on a
  * `ByteArrayInputStream` each is synchronized), which at a 60M-row
  * sf10 connector scan is several billion megamorphic calls. Here the
  * stream refills a private window in bulk and every primitive is
  * monomorphic int arithmetic on a local array — the same shape the
  * reference gets from decoding whole COPY chunks out of a buffer
  * (ref: src/include/postgres_binary_reader.hpp:74-118, which reads
  * fields from an in-memory buffer, never a byte-at-a-time stream).
  *
  * Method names mirror `DataInputStream` so call sites swap over
  * unchanged; semantics match where it matters (EOFException on a
  * truncated read, including `readShort` at a clean end-of-stream,
  * which the tuple loop uses as its stop signal).
  */
final class PgBlockInput(src: InputStream, chunkSize: Int = 1 << 18) {
  private var buf = new Array[Byte](math.max(chunkSize, 64))
  private var pos = 0
  private var lim = 0
  private var eof = false

  /** Make at least `n` bytes available at `pos` (compacting + bulk
    * refilling); EOFException if the stream ends first. */
  private def refill(n: Int): Unit = {
    if (pos > 0) {
      val avail = lim - pos
      System.arraycopy(buf, pos, buf, 0, avail)
      pos = 0; lim = avail
    }
    if (n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(n, buf.length * 2))
    while (lim < n && !eof) {
      val r = src.read(buf, lim, buf.length - lim)
      if (r < 0) eof = true else lim += r
    }
    if (lim < n) throw new EOFException("PGCOPY stream truncated")
  }

  @inline private def ensure(n: Int): Unit = if (lim - pos < n) refill(n)

  def readByte(): Byte = { ensure(1); val v = buf(pos); pos += 1; v }

  def readShort(): Short = {
    ensure(2)
    val v = (((buf(pos) & 0xff) << 8) | (buf(pos + 1) & 0xff)).toShort
    pos += 2; v
  }

  def readInt(): Int = {
    ensure(4)
    val p = pos
    val v = ((buf(p) & 0xff) << 24) | ((buf(p + 1) & 0xff) << 16) |
      ((buf(p + 2) & 0xff) << 8) | (buf(p + 3) & 0xff)
    pos = p + 4; v
  }

  def readLong(): Long = {
    ensure(8)
    val p = pos
    val hi = ((buf(p) & 0xff) << 24) | ((buf(p + 1) & 0xff) << 16) |
      ((buf(p + 2) & 0xff) << 8) | (buf(p + 3) & 0xff)
    val lo = ((buf(p + 4) & 0xff) << 24) | ((buf(p + 5) & 0xff) << 16) |
      ((buf(p + 6) & 0xff) << 8) | (buf(p + 7) & 0xff)
    pos = p + 8
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def readFloat(): Float = java.lang.Float.intBitsToFloat(readInt())
  def readDouble(): Double = java.lang.Double.longBitsToDouble(readLong())

  def readFully(dst: Array[Byte]): Unit = readFully(dst, 0, dst.length)

  def readFully(dst: Array[Byte], off: Int, len: Int): Unit = {
    val fromWindow = math.min(len, lim - pos)
    System.arraycopy(buf, pos, dst, off, fromWindow)
    pos += fromWindow
    var o = off + fromWindow
    var remaining = len - fromWindow
    // large payloads bypass the window: bulk-read straight into dst
    while (remaining > 0) {
      val r = src.read(dst, o, remaining)
      if (r < 0) { eof = true; throw new EOFException("PGCOPY stream truncated") }
      o += r; remaining -= r
    }
  }

  /** Make `n` bytes contiguous in the window and return the backing
    * array — the field's bytes start at [[windowPos]]. The caller
    * reads them IN PLACE (no scratch-buffer copy) and then consumes
    * them with [[skipWindow]]. The array is only valid until the next
    * read/refill; callers must not retain it. Grows the window when a
    * single field exceeds the chunk size, so any field length works. */
  def window(n: Int): Array[Byte] = { ensure(n); buf }
  def windowPos: Int = pos
  def skipWindow(n: Int): Unit = pos += n

  /** Skip exactly `n` bytes (EOFException if the stream ends first) —
    * the pruned-column path. */
  def skipFully(n: Int): Unit = {
    var remaining = n
    val fromWindow = math.min(remaining, lim - pos)
    pos += fromWindow
    remaining -= fromWindow
    while (remaining > 0) {
      // refill in window-sized gulps so a multi-chunk skip stays bulk
      refill(math.min(remaining, buf.length))
      val take = math.min(remaining, lim - pos)
      pos += take; remaining -= take
    }
  }

  def close(): Unit = src.close()
}
