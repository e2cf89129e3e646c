package graft

import graft.core.WebCorpus
import graft.index.{IndexBuilder, IndexReader}
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Near-real-time index updates: stream new docs -> appended block shards
  * -> immediately visible to the same IndexReader path.
  */
class StreamingIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed documents become queryable without a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ix").toString
    val base = WebCorpus.fromDocuments(spark, "/root/testdata/sf0.001")
    IndexBuilder.build(spark, base, dir, numShards = 1)

    val before = new IndexReader(spark, dir, cacheBlocks = false)
    val Some((lo, hi)) = before.prefixRange("spark")
    val nBefore = before.decode(before.blocksForRange(lo, hi)).count()

    // two streamed micro-batches of new docs using existing vocabulary
    val maxDoc = base.agg(max(col("doc_id"))).head().getLong(0)
    val newDocs = Seq(
      (maxDoc + 1, "spark spark merge window"),
      (maxDoc + 2, "spark join batch"),
      (maxDoc + 3, "totallynewterm spark")).toDF("doc_id", "text")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    newDocs.write.mode("overwrite").parquet(srcDir)

    val q = StreamingIndexer.start(spark, srcDir, newDocs.schema, dir, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val after = new IndexReader(spark, dir, cacheBlocks = false)
    val decoded = after.decode(after.blocksForRange(lo, hi))
    assert(decoded.count() === nBefore + 3) // 3 new docs contain "spark"
    val topDocs = after.topKOrFull(Seq("spark"), 100).collect().map(_.getLong(0)).toSet
    assert(topDocs.contains(maxDoc + 1) && topDocs.contains(maxDoc + 2) && topDocs.contains(maxDoc + 3))
    // unseen term is skipped until the next batch rebuild (documented drift)
    assert(after.dictionary.filter(col("term") === "totallynewterm").count() === 0)

    // drift lineage aggregates across shards: partition discovery supplies
    // the shard column (rows carry only the count, no conflicting column)
    val drift = spark.read.parquet(s"$dir/drift")
    assert(drift.columns.toSet === Set("dropped_doc_terms", "shard"))
    assert(drift.agg(sum(col("dropped_doc_terms"))).head().getLong(0) === 1L)
  }

  test("delta shards follow the batch index's committed codec") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_codec").toString
    val base = WebCorpus.fromDocuments(spark, "/root/testdata/sf0.001")
    // non-default codec: the delta shard must follow the COMMITTED codec,
    // not the build-time default
    IndexBuilder.build(spark, base, dir, numShards = 1, doclistCodec = "gamma")
    val maxDoc = base.agg(max(col("doc_id"))).head().getLong(0)
    StreamingIndexer.appendBatch(spark,
      Seq((maxDoc + 1, "spark merge stream")).toDF("doc_id", "text"),
      dir, "stream-codec-test")
    // the appended shard's bytes decode correctly under the index codec --
    // a default-encoded shard would decode to garbage or throw
    val r = new IndexReader(spark, dir, cacheBlocks = false)
    assert(r.doclistCodec === graft.index.Codec.Gamma)
    val hits = r.topKOrFull(Seq("spark"), 10000).collect().map(_.getLong(0)).toSet
    assert(hits.contains(maxDoc + 1))
  }
}
