package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 0-based rank ids in ascending key order, web-scale-safe.
  *
  * `row_number().over(Window.orderBy(key))` funnels the WHOLE relation
  * through one task (Spark plans an unpartitioned window as a single
  * partition) -- a guaranteed OOM for a 10^9-term vocabulary or a 10^12-doc
  * corpus. Two scale-safe formulations, both producing ids identical to the
  * window formulation (dense, 0-based, ascending key order):
  *
  *  - [[withDenseIdByPrefix]] (build hot path): bucket = truncate(key, L).
  *    Truncation is monotone under lexicographic order, so buckets are
  *    contiguous key ranges; id = bucket offset (a prefix-sum window over
  *    the <= |alphabet|^L bucket-totals relation, broadcast) + rank within
  *    bucket (a PARTITIONED window -- parallel). ONE Spark job, no
  *    range-sampling job, no RDD count job, per-task work bounded by the
  *    heaviest bucket. Right when keys spread over prefixes (vocabulary
  *    terms do).
  *  - [[withDenseId]] (general): range-partitioned sort + RDD zipWithIndex
  *    (a sampling job + a per-partition count job). Right when keys share
  *    long prefixes (urls) or the distribution is unknown.
  *
  * (Pattern prescribed in SURVEY.md §7.2.2; reference analog: sorted
  * vocabulary with wordId = array index, src/server/Vocabulary.h:17-33.)
  */
object DenseRank {

  def withDenseId(df: DataFrame, keyCol: String, idCol: String,
                  numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(nPart, col(keyCol).asc)
      .sortWithinPartitions(col(keyCol).asc)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    // zipWithIndex = per-partition counts collected once (nPart longs) +
    // offset-adjusted local indexes; both of its jobs execute over the SAME
    // shuffled RDD (ShuffleExchange reuses its shuffle), so ids are stable.
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(withId, schema)
  }

  def withDenseIdByPrefix(df: DataFrame, keyCol: String, idCol: String,
                          prefixLen: Int = 2): DataFrame = {
    // artificial `:namespace:` words (facet/filter/ordering) all share the
    // first prefixLen chars -- a fixed truncation would funnel that whole
    // namespace through one window task. Keys starting with ':' bucket on
    // a LONGER prefix reaching into the value. Variable-length truncation
    // stays order-monotone because the length depends only on the first
    // character: equal first chars compare at equal truncation lengths,
    // different first chars already order the truncations.
    val bucket = when(substring(col(keyCol), 0, 1) === ":",
        substring(col(keyCol), 0, prefixLen + 18))
      .otherwise(substring(col(keyCol), 0, prefixLen))
    val withB = df.withColumn("_b", bucket)
    // bucket offsets = exclusive prefix sum of per-bucket counts, computed
    // HIERARCHICALLY so no unpartitioned window ever sees an unbounded
    // relation: the ':'-key branch reaches into the value, so its bucket
    // count scales with value cardinality (a high-cardinality `:ordering:`
    // namespace could mint ~one bucket per distinct value). Level 1 sums
    // within a super-bucket (= first prefixLen chars) via a PARTITIONED
    // window; level 2's unpartitioned window runs over super-bucket totals,
    // <= |alphabet|^prefixLen rows (<= 65k for L=2) BY CONSTRUCTION,
    // independent of both key count and value cardinality.
    val totals = withB.groupBy(col("_b")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_s", substring(col("_b"), 0, prefixLen))
    val wSuper = Window.partitionBy(col("_s")).orderBy(col("_b").asc)
    val withLocal = totals.withColumn("_loff",
      coalesce(sum(col("_cnt")).over(
        wSuper.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val superOffsets = totals.groupBy(col("_s")).agg(sum(col("_cnt")).as("_scnt"))
      .withColumn("_soff",
        coalesce(sum(col("_scnt")).over(
          Window.orderBy(col("_s").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_s"), col("_soff"))
    val offsets = withLocal.join(broadcast(superOffsets), "_s")
      .select(col("_b"), (col("_soff") + col("_loff")).as("_off"))
    val w = Window.partitionBy(col("_b")).orderBy(col(keyCol).asc)
    // no forced broadcast of `offsets` (its row count is the bucket count,
    // unbounded on the ':' branch) -- AQE promotes the join to broadcast
    // when the runtime size allows
    withB.join(offsets, "_b")
      .withColumn(idCol, (col("_off") + row_number().over(w) - 1).cast("long"))
      .drop("_b", "_off")
  }
}
