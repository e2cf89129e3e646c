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

  /** Session for the streaming queries with SCALE-ADAPTIVE state
    * partitioning. AQE cannot coalesce the shuffle feeding a stateful
    * streaming operator, so `spark.sql.shuffle.partitions` fixes the state
    * store count for the life of the query: the session constant (sized
    * for the batch gates) would spin up one state store + per-batch delta
    * file per partition regardless of stream volume. Derive the partition
    * count from the source's bytes with the SAME advisory-size rule AQE
    * uses for batch shuffles (guide §2.2/§2.5: size partitions by bytes,
    * not core count), clamped to the session's configured partitions —
    * so a production-scale stream still gets the full configured
    * parallelism and only a small source gets a small state store set.
    * Pure parallelism change: aggregation/dedup results are identical.
    */
  private def streamSession(spark: SparkSession, srcDir: String): SparkSession = {
    val bytes = Option(new java.io.File(srcDir).listFiles())
      .map(_.map(_.length()).sum).getOrElse(0L)
    val advisory = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val configured = spark.sessionState.conf.numShufflePartitions.toLong
    val parts = math.max(1L, math.min(configured, bytes / math.max(advisory, 1L) + 1))
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s
  }

  /** Checkpoint dir for the drain-synchronously memory-sink queries: state
    * checkpoints are scratch I/O of the query, so they belong on the fast
    * local scratch (tmpfs when available — the same placement Bench uses
    * for spark.local.dir), not the shared disk. Deleted on JVM exit.
    */
  private def scratchCheckpointDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir = (if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft_ckpt")
    else java.nio.file.Files.createTempDirectory("graft_ckpt")).toString
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    dir
  }

  def streamWindowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val src = staged.computeIfAbsent(stagedKey(sfDir), _ => {
      // a byte-identical copy: the streaming source only needs the
      // parquet bytes under a directory, so a Spark read+rewrite job here
      // was pure overhead (the source may be a single file or a
      // Spark-written parquet directory; copy whichever it is)
      val dir = java.nio.file.Files.createTempDirectory("graft_events")
      val srcFile = new java.io.File(s"$sfDir/events.parquet")
      if (srcFile.isDirectory) // a Spark-written dir: its part files go in the root
        org.apache.commons.io.FileUtils.copyDirectory(srcFile, dir.toFile)
      else org.apache.commons.io.FileUtils.copyFile(srcFile,
        new java.io.File(dir.toFile, "events.parquet"))
      dir.toString
    })
    val ss = streamSession(spark, src)
    val batch = ss.read.parquet(s"$sfDir/events.parquet")

    // event-time columns must be TIMESTAMP (LTZ); the synthetic table is
    // NTZ -- round-trip through LTZ under the UTC session tz and hand the
    // wall-clock-identical NTZ back so the oracle compares naively.
    val stream = ss.readStream.schema(batch.schema).parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

    val name = s"win_agg_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete").format("memory")
      .option("checkpointLocation", scratchCheckpointDir()).queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name)
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
      // a byte-identical copy: the streaming source only needs the
      // parquet bytes under a directory, so a Spark read+rewrite job here
      // was pure overhead (the source may be a single file or a
      // Spark-written parquet directory; copy whichever it is)
      val dir = java.nio.file.Files.createTempDirectory("graft_events")
      val srcFile = new java.io.File(s"$sfDir/events.parquet")
      if (srcFile.isDirectory) // a Spark-written dir: its part files go in the root
        org.apache.commons.io.FileUtils.copyDirectory(srcFile, dir.toFile)
      else org.apache.commons.io.FileUtils.copyFile(srcFile,
        new java.io.File(dir.toFile, "events.parquet"))
      dir.toString
    })
    val ss = streamSession(spark, src)
    val batch = ss.read.parquet(s"$sfDir/events.parquet")
    val stream = ss.readStream.schema(batch.schema).parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
    val deduped = stream.unionByName(stream)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
    val name = s"dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", scratchCheckpointDir()).queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name)
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
