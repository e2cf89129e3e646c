package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the decoder. */
case class MediaMeta(url: String, n_bytes: Long, width: Int, height: Int,
                     n_frames: Int, format: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded in batched partition functions.
  *
  * Image AND audio paths are REAL end to end: [[withPayload]] synthesizes
  * genuine PNG, baseline-JPEG and PCM-WAV files (deterministic,
  * size-predictable -- [[makePng]]/[[makeJpeg]]/[[makeWav]]), and
  * [[decodeMeta]] decodes them with stock-JDK parsers -- `javax.imageio`
  * header reads for images (ImageReader.getWidth/getHeight without pixel
  * decode) and `javax.sound.sampled` for audio (AudioFileFormat from the
  * RIFF chunks, no sample decode) -- the header-only shape that scales to
  * payloads far larger than these. Payloads no installed codec recognizes
  * (the "video" quarter) fall through to the clearly-marked
  * [[stubDecode]] -- no video libraries exist in a stock JDK; swapping in
  * a real one changes only that function.
  */
object Multimodal {

  /** STUB decoder of last resort -- payloads none of the real parsers
    * ([[imageMeta]], [[audioMeta]], [[aviMeta]]) recognize (unreachable
    * from the synthetic corpus; kept for arbitrary external payloads):
    * deterministic fake metadata from
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

  /** A minimal, deterministic PCM WAV: RIFF/WAVE header + fmt + data
    * chunks, 16-bit silence. Every byte is a pure function of the
    * arguments and the total size is closed-form:
    * n_bytes = 44 + nSamples * channels * 2.
    */
  def makeWav(sampleRate: Int, nSamples: Int, channels: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0 && (channels == 1 || channels == 2),
      "wav args out of range")
    val dataLen = nSamples * channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    b.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
    b.put("fmt ".getBytes(ascii)).putInt(16)
    b.putShort(1).putShort(channels.toShort) // PCM
    b.putInt(sampleRate).putInt(sampleRate * channels * 2)
    b.putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes(ascii)).putInt(dataLen)
    b.array() // data region stays zero-filled: silence
  }

  /** A minimal, deterministic AVI container: RIFF/AVI + LIST/hdrl +
    * `avih` main header carrying (totalFrames, width, height). Constant
    * closed-form size: 12 (RIFF) + 12 (LIST/hdrl) + 8 + 56 (avih) = 88
    * bytes. The header is valid per the AVI spec; there is no movi data
    * -- [[aviMeta]] reads container metadata only (see its doc).
    */
  def makeAvi(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 0, "avi args out of range")
    val b = java.nio.ByteBuffer.allocate(88)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    b.put("RIFF".getBytes(ascii)).putInt(80).put("AVI ".getBytes(ascii))
    b.put("LIST".getBytes(ascii)).putInt(68).put("hdrl".getBytes(ascii))
    b.put("avih".getBytes(ascii)).putInt(56)
    b.putInt(33333) // usec/frame (30 fps)
    b.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
    b.putInt(nFrames)
    b.putInt(0).putInt(1).putInt(0) // initialFrames, streams, sugBufSize
    b.putInt(width).putInt(height)
    // 4 reserved dwords stay zero
    b.array()
  }

  /** Video CONTAINER metadata from a RIFF/AVI payload: walk the chunk
    * tree to the `avih` main header and read (width, height, totalFrames)
    * -- a real parse of the standard container format, the shape a
    * training pipeline runs before shipping payloads to an external
    * codec. This is container-level only: no JDK video codec exists, so
    * frame PIXEL decode stays external by design (the one remaining
    * boundary; [[stubDecode]] now covers only payloads no parser here
    * recognizes).
    */
  def aviMeta(payload: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (payload == null || payload.length < 24) return None
    val b = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a)
      new String(a, java.nio.charset.StandardCharsets.US_ASCII)
    }
    try {
      if (fourcc() != "RIFF") return None
      b.getInt // riff size
      if (fourcc() != "AVI ") return None
      // walk top-level chunks; descend into LIST/hdrl for avih. Hostile-
      // input guards (the doc promises arbitrary external payloads):
      // a negative or backward chunk size must fail the parse, never
      // rewind the cursor (infinite loop), and LIST nesting is
      // depth-capped so crafted deep nesting cannot overflow the stack
      // (StackOverflowError would escape an Exception catch).
      def walk(end: Int, depth: Int): Option[(Int, Int, Int)] = {
        if (depth > 16) return None
        while (b.position() + 8 <= end) {
          val id = fourcc()
          val sz = b.getInt
          if (sz < 0) return None // negative size would rewind the cursor
          val next = b.position() + sz + (sz & 1) // chunks are word-aligned
          id match {
            case "LIST" if sz >= 4 =>
              val listType = fourcc()
              if (listType == "hdrl") {
                val r = walk(math.min(next, end), depth + 1)
                if (r.isDefined) return r
              }
            case "avih" if sz >= 40 =>
              val base = b.position()
              val frames = b.getInt(base + 16)
              val w = b.getInt(base + 32)
              val h = b.getInt(base + 36)
              return Some((w, h, frames))
            case _ => ()
          }
          b.position(math.min(next, end))
        }
        None
      }
      walk(payload.length, 0).map { case (w, h, f) => (w, h, f, "avi") }
    } catch { case _: RuntimeException => None }
  }

  /** Header-only audio metadata via javax.sound.sampled (a stock-JDK
    * parser, like imageio for images): (sampleRate, channels, frames,
    * type) if an installed AudioFileReader recognizes the payload
    * (WAV/AIFF/AU in a stock JDK). Reads only the header -- frame count
    * comes from the chunk sizes, no sample decode.
    */
  def audioMeta(payload: Array[Byte]): Option[(Int, Int, Long, String)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val f = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      Some((f.getFormat.getSampleRate.toInt, f.getFormat.getChannels,
        f.getFrameLength.toLong,
        f.getType.toString.toLowerCase(java.util.Locale.ROOT)))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
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

  /** Attach the synthetic binary media column, one REAL format per
    * length-mod-4 class (dimensions/rates derived from the html length,
    * so the oracle predicts what the real decoders read):
    * 0 -> PNG, 2 -> baseline JPEG, 1 -> PCM WAV (audio), 3 -> an AVI
    * container whose RIFF header carries the rule's dimensions and a
    * fixed 5-frame count (container metadata parses for real via
    * [[aviMeta]]; frame PIXEL decode stays external -- no JDK video
    * codec).
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
          val payload = (n % 4) match {
            case 0 => makePng((n % 64) + 1, ((n / 64) % 64) + 1)
            case 2 => makeJpeg((n % 64) + 1, ((n / 64) % 64) + 1)
            case 1 => makeWav(8000 + (n % 8) * 1000, (n % 64) + 1, ((n / 4) % 2) + 1)
            case _ => makeAvi((n % 64) + 1, ((n / 64) % 64) + 1, 5)
          }
          (url, payload)
        }
      }.toDF("url", "payload")
  }

  /** Batched decode over partitions: iterator-in/iterator-out with an
    * explicit batch size, mirroring mapInPandas batch semantics. Narrow
    * (no shuffle); scales linearly with input splits. Real codecs first
    * ([[imageMeta]], then [[audioMeta]]); stub for the rest. Audio rows
    * reuse the MediaMeta shape as (width = sample rate Hz,
    * height = channels, n_frames = audio frames).
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
              case None => audioMeta(payload) match {
                case Some((rate, ch, frames, fmt)) =>
                  // clamp to [0, MaxInt]: AudioSystem reports
                  // NOT_SPECIFIED as -1, and >2^31-frame files would
                  // overflow a bare toInt to negative
                  MediaMeta(url, nBytes, rate, ch,
                    math.min(math.max(frames, 0L), Int.MaxValue).toInt, fmt)
                case None => aviMeta(payload) match {
                  case Some((w, h, frames, fmt)) =>
                    MediaMeta(url, nBytes, w, h, math.max(frames, 0), fmt)
                  case None =>
                    val (w, h, f, fmt) = stubDecode(payload)
                    MediaMeta(url, nBytes, w, h, f, fmt)
                }
              }
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
    // zero-frame payloads (empty WAV data chunk, zero-frame AVI header)
    // contribute zero rows -- a bare sequence(0, n_frames-1) would throw
    // 'Illegal sequence boundaries' on them and fail the whole job
    meta.toDF().select(col("url"), col("n_frames"),
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array())).as("frame_idx"))
      .orderBy(col("url"), col("frame_idx"))
}
