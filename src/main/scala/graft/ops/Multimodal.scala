package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the decoder. */
case class MediaMeta(url: String, n_bytes: Long, width: Int, height: Int,
                     n_frames: Int, format: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded in batched partition functions.
  *
  * The image path is REAL end to end: [[withPayload]] synthesizes genuine
  * PNG files (deterministic, size-predictable -- see [[makePng]]) for half
  * the corpus, and [[decodeMeta]] decodes them with the JDK's
  * `javax.imageio` -- a header-only metadata read (ImageReader.getWidth/
  * getHeight without pixel decode), the shape that scales to payloads far
  * larger than these. Payloads no installed codec recognizes (the "video"
  * half) fall through to the clearly-marked [[stubDecode]] -- no video
  * libraries exist in this container; swapping in a real one changes only
  * that function.
  */
object Multimodal {

  /** STUB decoder for non-image payloads: deterministic fake metadata from
    * payload length and first payload byte. Replace with a real codec
    * (e.g. ffmpeg bindings) in production; signature and batching stay.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = if (payload == null) 0 else payload.length
    val first = if (n == 0) 0 else payload(0) & 0xff
    val width = (n % 64) + 1
    val height = ((n / 64) % 64) + 1
    val frames = (first % 7) + 1
    val fmt = if (n % 2 == 0) "img" else "vid"
    (width, height, frames, fmt)
  }

  /** A minimal, deterministic PNG: 8-bit RGB, all-black, ONE stored
    * (uncompressed) deflate block. Every byte is a pure function of
    * (width, height), and the total size is closed-form:
    *
    *   raw     = height * (1 + 3 * width)        (filter byte + RGB row)
    *   n_bytes = 68 + raw
    *     = 8 (signature) + 25 (IHDR) + 12 + [2 zlib hdr + 5 stored-block
    *       hdr + raw + 4 adler] (IDAT) + 12 (IEND)
    *
    * so the DuckDB oracle can predict the file size exactly while the
    * Spark side decodes the REAL file. Requires raw <= 65535 (one stored
    * block), i.e. the 64x64 synthetic dimension cap.
    */
  def makePng(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, "png dims must be positive")
    val raw = new Array[Byte](height * (1 + 3 * width)) // zero-filled: filter 0 + black pixels
    require(raw.length <= 65535, "raw scanlines must fit one stored deflate block")
    val out = new java.io.ByteArrayOutputStream(68 + raw.length)
    val d = new java.io.DataOutputStream(out)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      d.writeInt(data.length)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      d.write(tb); d.write(data); d.writeInt(crc.getValue.toInt)
    }
    d.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    val idat = java.nio.ByteBuffer.allocate(11 + raw.length)
      .put(0x78.toByte).put(0x01.toByte) // zlib CMF/FLG (32K window, check ok)
      .put(0x01.toByte)                  // final stored block
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(raw.length.toShort).putShort((~raw.length & 0xffff).toShort)
      .put(raw)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    idat.putInt(adler.getValue.toInt)
    chunk("IDAT", idat.array())
    chunk("IEND", Array.emptyByteArray)
    d.flush()
    out.toByteArray
  }

  /** A minimal, deterministic baseline JPEG: grayscale, one component,
    * flat quant table, two one-code Huffman tables, a single all-zero
    * entropy byte. Every byte is a pure function of (width, height) and
    * the total size is CONSTANT -- 155 bytes = 2 (SOI) + 18 (APP0 JFIF) +
    * 69 (DQT) + 13 (SOF0) + 40 (DHT x2) + 10 (SOS) + 1 (entropy) +
    * 2 (EOI) -- so the DuckDB oracle predicts n_bytes as a literal while
    * the Spark side decodes the real file. The header (through SOS) is
    * fully valid and is what [[imageMeta]] reads; the entropy segment is
    * only long enough for a header read, not a full pixel decode -- the
    * same honesty boundary as [[makePng]]'s all-black pixels.
    */
  def makeJpeg(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 65535 && height <= 65535,
      "jpeg dims must fit SOF0 shorts")
    val out = new java.io.ByteArrayOutputStream(155)
    val d = new java.io.DataOutputStream(out)
    d.writeShort(0xFFD8) // SOI
    d.writeShort(0xFFE0); d.writeShort(16) // APP0 JFIF
    d.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    d.writeByte(0); d.writeShort(0x0101); d.writeByte(0)
    d.writeShort(1); d.writeShort(1); d.writeByte(0); d.writeByte(0)
    d.writeShort(0xFFDB); d.writeShort(67); d.writeByte(0) // DQT, flat
    (0 until 64).foreach(_ => d.writeByte(1))
    d.writeShort(0xFFC0); d.writeShort(11); d.writeByte(8) // SOF0 baseline
    d.writeShort(height); d.writeShort(width)
    d.writeByte(1) // one component
    d.writeByte(1); d.writeByte(0x11); d.writeByte(0) // id, 1x1, qtable 0
    // DHT: DC table 0 and AC table 0, each one 1-bit code -> symbol 0
    d.writeShort(0xFFC4); d.writeShort(2 + 2 * (1 + 16 + 1))
    d.writeByte(0x00); d.writeByte(1); (1 until 16).foreach(_ => d.writeByte(0)); d.writeByte(0x00)
    d.writeByte(0x10); d.writeByte(1); (1 until 16).foreach(_ => d.writeByte(0)); d.writeByte(0x00)
    d.writeShort(0xFFDA); d.writeShort(8) // SOS
    d.writeByte(1); d.writeByte(1); d.writeByte(0x00)
    d.writeByte(0); d.writeByte(63); d.writeByte(0)
    d.writeByte(0x00) // entropy: zero bits = DC diff 0 + EOB
    d.writeShort(0xFFD9) // EOI
    d.flush()
    out.toByteArray
  }

  /** Header-only image metadata via javax.imageio: (width, height, format)
    * if any installed ImageReader recognizes the payload (PNG/JPEG/GIF/BMP
    * in a stock JDK). Reads ONLY the header -- no pixel decode, no temp
    * files -- so per-row cost is independent of image size.
    */
  def imageMeta(payload: Array[Byte]): Option[(Int, Int, String)] = {
    if (payload == null || payload.length == 0) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Attach the synthetic binary media column: even-length html rows carry
    * a REAL image -- a PNG when the length is 0 mod 4, a baseline JPEG
    * when 2 mod 4 (both with dimensions derived from the html length, so
    * the oracle predicts what the real decoder reads); odd-length rows
    * carry the raw html bytes standing in for an undecodable video
    * payload.
    */
  def withPayload(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // never spill headers to temp files
        it.map { case (url, html) =>
          val n = if (html == null) 0 else html.length
          val payload =
            if (n % 4 == 0) makePng((n % 64) + 1, ((n / 64) % 64) + 1)
            else if (n % 4 == 2) makeJpeg((n % 64) + 1, ((n / 64) % 64) + 1)
            else html
          (url, payload)
        }
      }.toDF("url", "payload")
  }

  /** Batched decode over partitions: iterator-in/iterator-out with an
    * explicit batch size, mirroring mapInPandas batch semantics. Narrow
    * (no shuffle); scales linearly with input splits. Real codecs first
    * ([[imageMeta]]); stub for the rest.
    */
  def decodeMeta(corpus: DataFrame, batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    withPayload(corpus).as[(String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would run once
          batch.iterator.map { case (url, payload) =>
            val nBytes = if (payload == null) 0L else payload.length.toLong
            imageMeta(payload) match {
              case Some((w, h, fmt)) => MediaMeta(url, nBytes, w, h, 1, fmt)
              case None =>
                val (w, h, f, fmt) = stubDecode(payload)
                MediaMeta(url, nBytes, w, h, f, fmt)
            }
          }
        }
      }
  }

  /** Frame sampling plan for video-ish payloads: one row per sampled frame
    * index (every `stride`-th frame). Pure plan-side explode -- the actual
    * frame extraction is the stubbed decode.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 2): DataFrame =
    meta.toDF().select(col("url"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .orderBy(col("url"), col("frame_idx"))
}
