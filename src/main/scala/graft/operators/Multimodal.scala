package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) ride through the engine as opaque
  * `BinaryType` columns next to a typed metadata struct. The transform
  * stages (decode → feature-extract → resize/frame-sample) run as
  * partition-wise batch operators over `Dataset[T]` — the Scala
  * analogue of `mapInPandas`: one iterator per partition, batch-amortized
  * setup (a real decoder would be initialized once per partition, not
  * per row), constant memory.
  *
  * Decoders plug in behind [[MediaDecoder]]: [[RealImageDecoder]]
  * decodes PNG/JPEG/BMP/GIF through javax.imageio (pure JVM);
  * [[FakeDecoder]] is the deterministic stand-in the oracle-checked
  * battery uses (byte-derived features are reproducible in SQL, pixel
  * decoding is not). Audio/video byte codecs would slot in the same
  * seam with JNI libraries this container doesn't ship.
  */
object Multimodal {

  /** typed metadata carried beside the blob */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      sizeBytes: Long,
      sourceUri: String)

  final case class MediaRow(doc_id: Long, bytes: Array[Byte], meta: MediaMeta)

  /** decoded features; `ok=false` rows carry the failure reason and
    * survive the pipeline (bad media must never kill a 100 TB job) */
  final case class MediaFeatures(
      doc_id: Long,
      ok: Boolean,
      error: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      head_checksum: Long,
      feature: Array[Float])

  /** The decode seam. Implementations must be `Serializable` (shipped
    * to executors) and cheap to construct per partition. */
  trait MediaDecoder extends Serializable {
    def features(docId: Long, bytes: Array[Byte], meta: MediaMeta): MediaFeatures
  }

  /** Real image decode on the pure-JVM codecs: javax.imageio reads
    * PNG / JPEG / BMP / GIF with no native libraries. The "embedding"
    * is a deterministic 8-dim mean-luminance grid (4×2 cells, [0,1]) —
    * the place a learned vision encoder would slot in; everything a
    * 100 TB pipeline cares about is already exercised: real
    * width/height, per-partition reader reuse, and undecodable payloads
    * becoming `ok=false` rows instead of task failures. */
  final class RealImageDecoder extends MediaDecoder {
    override def features(docId: Long, bytes: Array[Byte], meta: MediaMeta): MediaFeatures = {
      if (bytes == null || bytes.isEmpty)
        return MediaFeatures(docId, ok = false, "empty media payload", 0, 0, 0L, 0L, Array.empty)
      val checksum = bytes.take(8).foldLeft(0L)((a, b) => a + (b & 0xff))
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case e: Exception =>
          return MediaFeatures(docId, ok = false,
            s"decode failed: ${e.getClass.getSimpleName}: ${e.getMessage}",
            0, 0, bytes.length.toLong, checksum, Array.empty)
        }
      if (img == null) // ImageIO signals "no reader for these bytes" with null
        return MediaFeatures(docId, ok = false, "unrecognized image format",
          0, 0, bytes.length.toLong, checksum, Array.empty)
      val w = img.getWidth
      val h = img.getHeight
      // 4×2 grid of mean luminance — cell (gx, gy) covers
      // [gx·w/4, (gx+1)·w/4) × [gy·h/2, (gy+1)·h/2)
      val sums = new Array[Double](8)
      val counts = new Array[Long](8)
      var y = 0
      while (y < h) {
        val gy = math.min(y * 2 / h, 1)
        var x = 0
        while (x < w) {
          val cell = gy * 4 + math.min(x * 4 / w, 3)
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          sums(cell) += lum / 255.0
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val feat = Array.tabulate(8)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
      MediaFeatures(docId, ok = true, "", w, h, bytes.length.toLong, checksum, feat)
    }
  }

  /** Deterministic stand-in: "dimensions" derived from leading bytes,
    * an 8-dim "embedding" from a rolling byte hash. Deterministic =
    * testable and oracle-friendly. */
  final class FakeDecoder extends MediaDecoder {
    override def features(docId: Long, bytes: Array[Byte], meta: MediaMeta): MediaFeatures = {
      if (bytes == null || bytes.isEmpty)
        return MediaFeatures(docId, ok = false, "empty media payload", 0, 0, 0L, 0L, Array.empty)
      val head = bytes.take(8)
      val checksum = head.foldLeft(0L)((a, b) => a + (b & 0xff))
      val w = 1 + (bytes(0) & 0x3f)
      val h = 1 + (if (bytes.length > 1) bytes(1) & 0x3f else 0)
      val feat = new Array[Float](8)
      var acc = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        acc = acc * 31 + (bytes(i) & 0xff)
        if (i % 8 == 7 || i == bytes.length - 1)
          feat((i / 8) % 8) += ((acc & 0xffff).toFloat / 65535f)
        i += 1
      }
      MediaFeatures(docId, ok = true, "", w, h, bytes.length.toLong, checksum, feat)
    }
  }

  /** Stage 1: attach blob + metadata columns to a table (here the
    * documents text bytes stand in for media payloads). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .select(
        col("doc_id"),
        col("bytes"),
        struct(
          lit("image").as("mediaType"),
          // byte length of the stored payload (length over a BINARY
          // column counts octets) — length(text) counts CHARACTERS
          // and disagrees with n_bytes for any multibyte document
          length(col("bytes")).cast("long").as("sizeBytes"),
          concat(lit("mem://docs/"), col("doc_id")).as("sourceUri")).as("meta"))

  /** Stage 2: partition-wise decode. One decoder instance per
    * partition; rows stream through an iterator (constant memory —
    * the mapInPandas batch shape). */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder = new FakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup happens HERE (decoder init, native libs)
      val d = decoder
      rows.map(r => d.features(r.doc_id, r.bytes, r.meta))
    }
  }

  /** One resized thumbnail's features: `rows` holds the per-thumbnail-
    * row mean intensity in [0,1] (th entries; double, and accumulated
    * in a fixed left-to-right fold so the fake path is bit-identical
    * to an oracle recomputing the same chain). */
  final case class ThumbRow(
      doc_id: Long,
      ok: Boolean,
      tw: Int,
      th: Int,
      checksum: Long,
      rows: Array[Double])

  /** The resize seam — same contract as [[MediaDecoder]]: Serializable,
    * cheap per partition. */
  trait Thumbnailer extends Serializable {
    def thumb(docId: Long, bytes: Array[Byte], tw: Int, th: Int): ThumbRow
  }

  /** Real image resize on the pure-JVM stack: javax.imageio decode →
    * Graphics2D bilinear scale into a tw×th BufferedImage → per-row
    * mean luminance. Exercised by the operator specs against generated
    * PNGs; the oracle battery runs the deterministic fake (DuckDB
    * cannot decode PNG, so a real-codec entry would have no oracle). */
  final class RealThumbnailer extends Thumbnailer {
    override def thumb(docId: Long, bytes: Array[Byte], tw: Int, th: Int): ThumbRow = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return ThumbRow(docId, ok = false, 0, 0, 0L, Array.empty)
      val out = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
      g.dispose()
      val rows = new Array[Double](th)
      var checksum = 0L
      var y = 0
      while (y < th) {
        var sum = 0.0
        var x = 0
        while (x < tw) {
          val rgb = out.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          sum += lum / 255.0
          checksum += (rgb & 0xffffff)
          x += 1
        }
        rows(y) = sum / tw
        y += 1
      }
      ThumbRow(docId, ok = true, tw, th, checksum, rows)
    }
  }

  /** Deterministic stand-in resize: the "thumbnail" subsamples the
    * payload bytes at a fixed stride (len / (tw·th), the nearest-
    * neighbor analogue), pixel intensity = byte value / 255. Exactly
    * recomputable in SQL from the document text, which is what gives
    * the battery entry its oracle. Payloads shorter than tw·th bytes
    * come back ok=false (nothing to subsample). */
  final class FakeThumbnailer extends Thumbnailer {
    override def thumb(docId: Long, bytes: Array[Byte], tw: Int, th: Int): ThumbRow = {
      val n = tw * th
      if (bytes == null || bytes.length < n)
        return ThumbRow(docId, ok = false, 0, 0, 0L, Array.empty)
      val stride = bytes.length / n
      val rows = new Array[Double](th)
      var checksum = 0L
      var y = 0
      while (y < th) {
        var sum = 0.0
        var x = 0
        while (x < tw) {
          val px = bytes((y * tw + x) * stride) & 0xff
          sum += px / 255.0
          checksum += px
          x += 1
        }
        rows(y) = sum / tw
        y += 1
      }
      ThumbRow(docId, ok = true, tw, th, checksum, rows)
    }
  }

  /** Stage 2b: partition-wise resize — the same mapPartitions shape as
    * [[decodeFeatures]] (per-partition thumbnailer instance, streaming
    * iterator, constant memory). */
  def resizeFeatures(media: DataFrame, tw: Int, th: Int,
      thumbnailer: Thumbnailer = new FakeThumbnailer): Dataset[ThumbRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val t = thumbnailer
      rows.map(r => t.thumb(r.doc_id, r.bytes, tw, th))
    }
  }

  /** Audio-style window fingerprinting: OVERLAPPING fixed-size byte
    * windows (size `win`, hop `hop` < win) over the payload, one
    * 128-bit fingerprint per window — the Shazam-landmark plumbing
    * with the DSP stubbed: a real deployment would FFT the PCM and
    * hash spectral peaks per window; here the fingerprint is a direct
    * md5 of the window bytes (STUB — deterministic and
    * oracle-recomputable), and everything around it (overlap
    * windowing, per-window rows, cross-doc matching downstream) is the
    * real Spark shape. Returns (doc_id, window_idx, fp).
    *
    * Scale: the windowing is a per-row lambda over the payload — no
    * shuffle; at hop = win/2 the row expansion is 2 rows per `win`
    * payload bytes, carried as 32-char fingerprints, not slices. */
  def windowFingerprints(media: DataFrame, win: Int = 64, hop: Int = 32): DataFrame = {
    require(hop >= 1 && hop <= win,
      s"hop must be in [1, win]: hop=$hop win=$win (hop=0 would emit no " +
        "windows via null division; hop>win would silently skip bytes)")
    media.select(col("doc_id"), col("bytes"))
      .filter(length(col("bytes")) >= win)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((length(col("bytes")) - win) / hop).cast("int")),
          i => md5(col("bytes").substr(i * hop + 1, lit(win)))))
          .as(Seq("window_idx", "fp")))
  }

  /** Stage 3: deterministic frame/sample selection — keep every k-th
    * byte-window "frame" of the payload, as a stand-in for video frame
    * sampling; pure Spark built-ins. */
  def sampleFrames(media: DataFrame, every: Int): DataFrame =
    // fixed-width windows via substring: Spark (UTF8String) and DuckDB
    // both count code points there, so payloads with newlines or
    // non-BMP characters chunk identically on both engines — a
    // `(?<=\G.{32})` regex split would count UTF-16 units and refuse to
    // match '.' across line terminators. The degenerate empty-payload
    // sequence(0,-1) rows fall to the length(frame) > 0 filter.
    media.select(col("doc_id"), decode(col("bytes"), "UTF-8").as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), ceil(length(col("t")) / 32.0).cast("int") - 1))
          .as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx"),
        col("t").substr(col("frame_idx") * 32 + 1, lit(32)).as("frame"))
      .filter(length(col("frame")) > 0)
}
