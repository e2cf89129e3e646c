package graft.tools

import graft.Bench
import graft.index.{IndexBuilder, IndexReader}
import graft.query.IndexExecutor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: concurrent serving THROUGHPUT (queries/sec) against one
  * reader + the process history, at 1/4/16/32 client threads -- the
  * reference serves thread-per-request (StartCompletionServer `-m`), so
  * single-query p50 alone under-describes the serving story.
  *
  * The query pool is DISTINCT queries derived from the index's own
  * dictionary (mid-df words: exact, prefix, and AND-pair shapes), far
  * more than the history's LRU capacity, so the number measures engine
  * execution under concurrency, not history-map lookups. Fixed total
  * work split across threads (strong scaling): qps = total / wall.
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val total = sys.env.getOrElse("SPARK_GRAFT_TP_TOTAL", "192").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-tp-local")
      // A/B knob: FAIR round-robins tasks across concurrent query jobs
      // (serving fairness) where FIFO drains them in submission order
      .config("spark.scheduler.mode",
        sys.env.getOrElse("SPARK_GRAFT_SCHED", "FIFO"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Bench.replicatedCorpus(spark, sfDir, 10).cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_tp").toString
    IndexBuilder.build(spark, corpus, dir, numShards = 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val reader = new IndexReader(spark, dir)

    // deterministic pool of DISTINCT queries: the synthetic vocabulary is
    // tiny (~31 terms), so distinctness comes from enumerating AND
    // pairs/triples (n^2 combinations) plus the exact and prefix shapes
    val words = reader.dictionary
      .filter(!col("term").contains(":"))
      .orderBy(col("term").asc)
      .limit(600).select(col("term")).collect().map(_.getString(0))
    require(words.length >= 3, s"pool too small: ${words.length}")
    val singles = words.toSeq
    val prefixes = words.map(w => w.substring(0, math.min(3, w.length)) + "*").distinct.toSeq
    val pairs = for (a <- words.toSeq; b <- words.toSeq if a < b) yield s"$a $b"
    val shapes = Seq(singles, prefixes, pairs)
    // round-robin across shapes, each shape consumed in order -- all
    // entries distinct by construction (pairs alone give n*(n-1)/2)
    val pool: IndexedSeq[String] = Iterator.from(0)
      .map(i => shapes(i % shapes.length).lift(i / shapes.length))
      .take(3 * (singles.length + prefixes.length + pairs.length))
      .flatten.distinct.take(total).toIndexedSeq
    require(pool.length == total, s"pool not distinct enough: ${pool.length}/$total")
    // one untimed pass of a few queries to warm codegen paths
    pool.take(4).foreach(q => IndexExecutor.topK(reader, q, 10).collect())

    // SPARK_GRAFT_TP_HTTP=1: drive the FULL wire path (HTTP handler pool,
    // per-request job group + timeout watchdog, JSON render) instead of
    // the engine facade -- measures what a real client sees
    val httpMode = sys.env.get("SPARK_GRAFT_TP_HTTP").contains("1")
    val server = if (httpMode)
      Some(CompletionServer.start(spark, dir, port = 0, handlerThreads = 32))
    else None
    def runQuery(q: String): Unit =
      if (httpMode) {
        val u = java.net.URLEncoder.encode(q, "UTF-8")
        val conn = new java.net.URL(
          s"http://127.0.0.1:${server.get.getAddress.getPort}/?q=$u&h=10")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        if (code != 200) throw new RuntimeException(s"HTTP $code for $q")
        val is = conn.getInputStream
        try { val buf = new Array[Byte](8192); while (is.read(buf) >= 0) () }
        finally is.close()
      } else IndexExecutor.topK(reader, q, 10).collect(): Unit

    for (t <- Seq(1, 4, 16, 32)) {
      val idx = new java.util.concurrent.atomic.AtomicInteger(0)
      val errors = new java.util.concurrent.atomic.AtomicInteger(0)
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val t0 = System.nanoTime()
      val threads = (1 to t).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < total) {
            val s = System.nanoTime()
            try runQuery(pool(i))
            catch { case _: Throwable => errors.incrementAndGet() }
            lats.add((System.nanoTime() - s) / 1e6)
            i = idx.getAndIncrement()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val xs = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Double]
        lats.forEach(v => b += v); b.toSeq
      }
      println(f"TP threads=$t%2d  qps ${total / wall}%6.1f  wall ${wall}%6.1f s  " +
        f"p50 ${Bench.percentile(xs, 0.5)}%7.1f ms  p95 ${Bench.percentile(xs, 0.95)}%7.1f ms" +
        (if (errors.get > 0) s"  ERRORS=${errors.get}" else ""))
    }
    server.foreach(_.stop(0))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
