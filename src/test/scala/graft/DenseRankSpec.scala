package graft

import graft.core.DenseRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dense-id assignment must equal the (scale-unsafe) single-window
  * formulation for every key shape, including high-cardinality ':'
  * namespaces whose buckets reach into the value (the hierarchical
  * prefix-sum path).
  */
class DenseRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("prefix-bucket ids == window row_number ids, plain + ':' keys") {
    val keys =
      (1 to 500).map(i => f"term$i%04d") ++
        // high-cardinality ordering namespace: bucket = prefix reaching the
        // value, ~one bucket per distinct value -- exercises the two-level sum
        (1 to 500).map(i => f":ordering:price:$i%012d") ++
        Seq(":facet:source:web", ":facet:source:news", "zebra", "aachen")
    val df = keys.toDF("term")
    val got = DenseRank.withDenseIdByPrefix(df, "term", "term_id")
      .select("term", "term_id").as[(String, Long)].collect().toMap
    val want = df
      .withColumn("term_id", row_number().over(Window.orderBy(col("term"))).cast("long") - 1)
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }
}
