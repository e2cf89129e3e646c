package graft

import graft.index.{IndexBuilder, IndexReader}
import org.scalatest.funsuite.AnyFunSuite

/** Block-max WAND must (a) actually prune blocks on a skewed corpus and
  * (b) stay exact while doing so.
  */
class WandSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pruning fires on low-upper-bound blocks and stays exact") {
    // 10 short docs rich in the rare term "gold"; 100 medium filler docs;
    // 900 long filler docs whose tf-part (and so block-max) is tiny.
    // The gold docs are the SHORTEST, so the filler block containing them
    // has the strictly highest block_max_tfpart -- phase 1 deterministically
    // picks it, regardless of block metadata collect order.
    val pad = (1 to 200).map(i => s"pad$i").mkString(" ")
    val docs = (
      (0L until 10L).map(i => (i, "gold gold gold gold filler")) ++
      (10L until 110L).map(i => (i, "filler quick note extra word")) ++
      (110L until 1000L).map(i => (i, s"filler $pad"))
    ).toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft_wand").toString
    IndexBuilder.build(spark, docs, dir, numShards = 1, blockSize = 64,
      buildPartitions = 8)
    // wandMinBlocks = 1 forces the two-phase path for this test
    val reader = new IndexReader(spark, dir, cacheBlocks = false, wandMinBlocks = 1)

    val (wandDf, total, scanned) = reader.topKOrWandStats(Seq("gold", "filler"), 5)
    val wand = wandDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = reader.topKOrFull(Seq("gold", "filler"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(total > 10)
    assert(scanned < total, s"expected pruning: scanned=$scanned total=$total")
    assert(wand === full)
    // the gold-rich docs dominate the top-5
    assert(wand.map(_._1).forall(_ < 10L))
  }
}
