package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators: tumbling-window aggregation (run through
  * Structured Streaming with a memory sink) and gap-based sessionization.
  */
object Events {

  /** Tumbling 5-minute window aggregation executed as a REAL streaming
    * query: readStream over the events parquet -> watermark -> windowed
    * agg -> memory sink, drained synchronously. Batch-equivalent semantics
    * (complete mode), so the DuckDB time_bucket oracle applies.
    */
  // staged-source memoization: the parquet streaming source needs a
  // directory; stage each sf's single file once per process, not per call.
  // Keyed on (path, mtime, size) so a changed source file re-stages instead
  // of serving a stale copy; staged dirs are deleted on JVM exit.
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), String]()
  sys.addShutdownHook {
    staged.values().forEach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  private def stagedKey(sfDir: String): (String, Long, Long) = {
    val f = new java.io.File(s"$sfDir/events.parquet")
    (sfDir, f.lastModified(), f.length())
  }

  def streamWindowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val src = staged.computeIfAbsent(stagedKey(sfDir), _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
      spark.read.parquet(s"$sfDir/events.parquet")
        .write.mode("overwrite").parquet(dir)
      dir
    })
    val batch = spark.read.parquet(s"$sfDir/events.parquet")

    // event-time columns must be TIMESTAMP (LTZ); the synthetic table is
    // NTZ -- round-trip through LTZ under the UTC session tz and hand the
    // wall-clock-identical NTZ back so the oracle compares naively.
    val stream = spark.readStream.schema(batch.schema).parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

    val name = s"win_agg_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** At-least-once delivery made exactly-once, as a REAL streaming query:
    * the stream is unioned with itself (every event delivered twice — the
    * redelivery simulation) and streaming `dropDuplicates` on event_id
    * collapses it back, so per-type counts equal the batch counts. The
    * dedup is the query's single stateful operator (append mode into the
    * memory sink; counting happens batch-side over the sink) and the
    * watermark bounds its per-key state at production scale.
    */
  def streamDedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val src = staged.computeIfAbsent(stagedKey(sfDir), _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
      spark.read.parquet(s"$sfDir/events.parquet")
        .write.mode("overwrite").parquet(dir)
      dir
    })
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(batch.schema).parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
    val deduped = stream.unionByName(stream)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
    val name = s"dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
  }

  /** Gap sessionization (30-min inactivity): declarative window functions
    * -- lag + cumulative sum of break flags -- one shuffle by user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // interval arithmetic works on NTZ and LTZ alike, exact to the microsecond
    val gap = col("ts") - lag(col("ts"), 1).over(byUser)
    events
      .withColumn("brk",
        when(gap.isNull || gap > expr(s"INTERVAL $gapMinutes MINUTES"), 1L).otherwise(0L))
      .withColumn("session_no", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_no"))
  }
}
