package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k against a broadcast query vector --
  * computed per-row with zip_with + aggregate (codegen'd higher-order
  * functions, no explode shuffle). Scale path: sign-LSH bucketing (axis
  * hyperplanes) so the candidate join runs per bucket; at 100 TB the
  * bucket id becomes the shuffle/partition key and brute force runs only
  * within buckets.
  */
object Similarity {

  /** Sequential-fold dot product of an array column with a literal vector. */
  def dotLit(emb: Column, q: Array[Double]): Column =
    aggregate(
      zip_with(emb, lit(q), (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(emb: Column): Column =
    sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Brute-force cosine top-k vs the embedding of `queryId`.
    * Returns (vec_id, cos) ordered cos desc, vec_id asc.
    */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long").as("vec_id"),
        round(dotLit(col("embedding"), q) / (norm(col("embedding")) * lit(qn)), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-LSH bucket: bit j = (embedding[j] > 0) for the first `planes`
    * dimensions (axis-aligned hyperplanes -- deterministic, engine-neutral).
    */
  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame = {
    val bucket = (0 until planes).map { j =>
      when(element_at(col("embedding"), j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.select(col("vec_id").cast("long").as("vec_id"), bucket.as("bucket"))
  }

  /** Bucketed near-neighbor pairs: same sign-LSH bucket AND cosine >= tau.
    * The quadratic join is confined to buckets (the 100 TB-safe shape).
    */
  def lshPairs(embeddings: DataFrame, planes: Int = 8, tau: Double = 0.3): DataFrame = {
    val withB = lshBuckets(embeddings, planes)
      .join(embeddings.select(col("vec_id").cast("long").as("vec_id"), col("embedding")), "vec_id")
    val a = withB.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"))
    val b = withB.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(b, "bucket")
      .filter(col("a") < col("b"))
      .withColumn("dot", aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("cos", round(col("dot") / (norm(col("ea")) * norm(col("eb"))), 4))
      .filter(col("cos") >= tau)
      .select(col("a"), col("b"), col("cos"))
      .orderBy(col("a"), col("b"))
  }

  /** Embedding-cosine near-duplicate doc pairs -- dedup flavor of lshPairs
    * with a high threshold.
    */
  def embeddingNearDups(embeddings: DataFrame, tau: Double = 0.95): DataFrame =
    lshPairs(embeddings, planes = 8, tau = tau)
}
