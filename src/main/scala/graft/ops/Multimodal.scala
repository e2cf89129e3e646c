package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the (stubbed) decoder. */
case class MediaMeta(url: String, n_bytes: Long, width: Int, height: Int,
                     n_frames: Int, format: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded in batched partition functions.
  *
  * The Spark-side plumbing is real and tested: schema, partition-level
  * batching (the Scala analog of `mapInPandas` batch shape), deterministic
  * output. The decode itself is a clearly-marked STUB -- no image/audio
  * libraries exist in this container -- producing deterministic fake
  * dimensions from the payload bytes so tests and oracles are stable.
  * Swapping in a real decoder changes only the body of [[stubDecode]].
  */
object Multimodal {

  /** STUB decoder: deterministic fake metadata from payload length and
    * first payload byte. Replace with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) in production; signature and batching stay.
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

  /** Attach a synthetic binary payload column (the corpus html bytes) --
    * stands in for a real media column in the input table.
    */
  def withPayload(corpus: DataFrame): DataFrame =
    corpus.select(col("url"), col("html").as("payload"))

  /** Batched decode over partitions: iterator-in/iterator-out with an
    * explicit batch size, mirroring mapInPandas batch semantics. Narrow
    * (no shuffle); scales linearly with input splits.
    */
  def decodeMeta(corpus: DataFrame, batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    withPayload(corpus).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would run once
          batch.iterator.map { case (url, payload) =>
            val (w, h, f, fmt) = stubDecode(payload)
            MediaMeta(url, if (payload == null) 0L else payload.length.toLong, w, h, f, fmt)
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
