package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 0-based rank ids in ascending key order, web-scale-safe.
  *
  * `row_number().over(Window.orderBy(key))` funnels the WHOLE relation
  * through one task (Spark plans an unpartitioned window as a single
  * partition) -- a guaranteed OOM for a 10^9-term vocabulary or a 10^12-doc
  * corpus. This instead range-partitions the sort (parallel external sort)
  * and assigns id = partition offset + local index via RDD zipWithIndex,
  * whose only extra cost is one per-partition count job over already
  * shuffled data. Ids are identical to the window formulation: dense,
  * 0-based, ascending key order.
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
}
