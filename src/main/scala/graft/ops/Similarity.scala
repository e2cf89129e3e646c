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
  private def bucketExpr(planes: Int): Column =
    (0 until planes).map { j =>
      when(element_at(col("embedding"), j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"), bucketExpr(planes).as("bucket"))

  /** Bucketed near-neighbor pairs: same sign-LSH bucket AND cosine >= tau.
    * The quadratic join is confined to buckets (the 100 TB-safe shape).
    * The bucket is computed inline on the scan (no re-join against the
    * source to fetch the embedding back) and each row's norm is computed
    * once before the bucket join, not once per candidate pair.
    */
  def lshPairs(embeddings: DataFrame, planes: Int = 8, tau: Double = 0.3): DataFrame = {
    val withB = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"), bucketExpr(planes).as("bucket"), norm(col("embedding")).as("nrm"))
    val a = withB.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = withB.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, "bucket")
      .filter(col("a") < col("b"))
      .withColumn("dot", aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("cos", round(col("dot") / (col("na") * col("nb")), 4))
      .filter(col("cos") >= tau)
      .select(col("a"), col("b"), col("cos"))
      .orderBy(col("a"), col("b"))
  }

  /** Embedding-cosine near-duplicate doc pairs -- dedup flavor of lshPairs
    * with a high threshold.
    */
  def embeddingNearDups(embeddings: DataFrame, tau: Double = 0.95): DataFrame =
    lshPairs(embeddings, planes = 8, tau = tau)

  // ---- IVF (inverted-file) ANN: the second scale path besides sign-LSH ----

  /** The `nCells` smallest vec_ids, as a 1-column (vec_id) relation --
    * a deterministic rank (TakeOrdered over ids), NOT a `vec_id < nCells`
    * value filter: sparse or offset id spaces silently yield fewer (or
    * zero) centroids under a value filter.
    */
  private def centroidIds(embeddings: DataFrame, nCells: Int): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"))
      .orderBy(col("vec_id").asc).limit(nCells)

  /** IVF cell assignment with a DETERMINISTIC coarse quantizer: the
    * centroids are the first `nCells` vectors by vec_id rank (engine-
    * neutral, no iterative k-means -- [[kmeansCentroids]] is the trained
    * alternative). Assignment = argmax cosine, ties by centroid id;
    * cosine rounded to 6dp so float-sum ordering can't flip the argmax
    * across engines. Array form throughout ([[argmaxCosineArr]]): a
    * broadcast crossJoin with the nCells-row centroid relation + one
    * (vec_id)-keyed aggregation -- no explode, no per-key window.
    */
  def ivfAssign(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val vecs = vecArr(embeddings)
    val cents = withCnrm(vecs
      .join(broadcast(centroidIds(embeddings, nCells)), "vec_id")
      .select(col("vec_id").as("cid"), col("varr").as("yarr")))
    argmaxCosineArr(vecs, cents).select(col("vec_id"), col("cid").as("cell"))
  }

  /** TRAINED coarse quantizer for IVF: Lloyd's k-means over the embedding
    * corpus, deterministic end to end (init = the first k vectors by
    * vec_id rank; every cosine and every centroid component rounded to 6dp
    * so the result is engine-reproducible). Returns the centroid relation
    * (cid, i, y) — the same shape `ivfAssign`'s deterministic quantizer
    * uses, so trained centroids drop straight into the IVF plan.
    *
    * Scale shape per iteration (see [[kmeansCentroidsArr]]): one broadcast
    * crossJoin with the k-row centroid relation + one (vec_id) aggregation
    * + one (cid) aggregation over `dim` fixed-arity mean columns -- two
    * bounded shuffles, no explode, no driver state beyond the LIMIT-1 dim
    * probe, and LINEAR lineage (no per-iteration checkpoint needed: the
    * centroid relation is referenced once per iteration).
    */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val vecs = vecArrCached(embeddings)
    kmeansCentroidsArr(vecs, embeddings, k, iters)
      .select(col("cid"), posexplode(col("yarr")).as(Seq("i0", "y")))
      .select(col("cid"), col("i0").cast("integer").as("i"), col("y"))
  }

  /** Embeddings in ARRAY form (vec_id, varr, nrm) -- the whole-row shape
    * cosine math consumes (PLANS §22: per-group fixed-arity state belongs
    * in columns, not exploded rows).
    */
  private def vecArr(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("varr"))
      .withColumn("nrm", sqrt(aggregate(col("varr"), lit(0.0), (a, x) => a + x * x)))

  /** [[vecArr]] persisted: every Lloyd iteration references it twice
    * (assignment + mean update), so an uncached relation re-scans the
    * corpus 2*iters+1 times per training run.
    */
  private def vecArrCached(embeddings: DataFrame): DataFrame =
    vecArr(embeddings).cache()

  /** Argmax-cosine against ARRAY-form centroids (cid, yarr, cnrm): a
    * crossJoin with the broadcast k-row centroid relation, the dot
    * product inside the row (zip_with + aggregate, whole-stage codegen),
    * ONE (vec_id)-keyed aggregation. Cosine rounded to 6dp (so float-sum
    * ordering can't flip the argmax across engines), ties to the lowest
    * cid, via max_by over the (cos, -cid) struct -- ONE keyed
    * aggregation, not a row_number window. (Physically a SortAggregate:
    * max_by's struct ordering buffer is not hash-aggregable, and packing
    * (cos, -cid) into one fixed-width key can't be done safely for
    * arbitrary 64-bit cids; the partial aggregate still reduces to one
    * row per (partition, vec_id) before the exchange.)
    */
  private def argmaxCosineArr(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(aggregate(zip_with(col("varr"), col("yarr"), (x, y) => x * y),
          lit(0.0), (a, p) => a + p) / (col("nrm") * col("cnrm")), 6).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cos"), (-col("cid")).as("nc"))).as("cid"))

  private def withCnrm(c: DataFrame): DataFrame =
    c.withColumn("cnrm", sqrt(aggregate(col("yarr"), lit(0.0), (a, y) => a + y * y)))

  /** Lloyd iterations over the array form. Per iteration: one broadcast
    * crossJoin + one (vec_id) aggregation (assignment) + one equi-join +
    * one (cid) aggregation with `dim` fixed-arity avg columns (means) --
    * two bounded shuffles, no explode, no driver state. The centroid
    * relation is referenced ONCE per iteration (its norm is a column, not
    * a derived relation), so lineage is LINEAR in iters and needs no
    * per-iteration checkpoint; a lineage valve every 8 iterations keeps
    * very long trainings plannable.
    */
  private def kmeansCentroidsArr(vecs: DataFrame, embeddings: DataFrame,
                                 k: Int, iters: Int): DataFrame = {
    // dim from one row (LIMIT 1 -- bounded driver round-trip); dims are
    // uniform by the embedding-column contract
    val dim = vecs.select(size(col("varr"))).limit(1).head().getInt(0)
    val init = withCnrm(vecs
      .join(broadcast(centroidIds(embeddings, k)), "vec_id")
      .select(col("vec_id").as("cid"),
        transform(col("varr"), x => round(x, 6)).as("yarr")))
    (1 to iters).foldLeft(init) { (cent, it) =>
      val assign = argmaxCosineArr(vecs, cent)
      val means = vecs.join(assign, "vec_id")
        .groupBy(col("cid"))
        .agg(round(avg(element_at(col("varr"), 1)), 6).as("y0"),
          (2 to dim).map(i =>
            round(avg(element_at(col("varr"), i)), 6).as(s"y${i - 1}")): _*)
        .select(col("cid"),
          array((0 until dim).map(i => col(s"y$i")): _*).as("yarr"))
      val next = withCnrm(means)
      if (it % 8 == 0 && it < iters) next.localCheckpoint(true) else next
    }
  }

  /** Cell assignment under the k-means-trained quantizer: (vec_id, cell).
    * Empty cells (centroids that lost all members during training) simply
    * stop existing, exactly as in any IVF build.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val vecs = vecArrCached(embeddings)
    argmaxCosineArr(vecs, kmeansCentroidsArr(vecs, embeddings, k, iters))
      .select(col("vec_id"), col("cid").as("cell"))
  }

  /** IVF top-k: probe the `nProbe` cells nearest to the query vector and
    * brute-force only their members. Approximate by construction; the gate
    * checks the exact IVF semantics, not equality with exhaustive search.
    */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val assign = ivfAssign(embeddings, nCells)
    // query vector to the driver once (1-row LIMIT fetch -- the same
    // bounded round-trip cosineTopK pays), so probe + exact cosine are
    // map-only literal folds instead of dimension-keyed joins
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    // cells to probe: by the query's cosine to each centroid
    val probed = embeddings
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .join(broadcast(centroidIds(embeddings, nCells)), "vec_id")
      .select(col("vec_id").as("cid"),
        round(dotLit(col("embedding"), q) / (norm(col("embedding")) * lit(qn)), 6).as("cos"))
      .orderBy(col("cos").desc, col("cid").asc)
      .limit(nProbe)
      .select(col("cid").as("cell"))
    val candidates = assign.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= queryId)
    // exact cosine on the candidates only
    embeddings.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .join(candidates.select(col("vec_id")), "vec_id")
      .select(col("vec_id"),
        round(dotLit(col("embedding"), q) / (norm(col("embedding")) * lit(qn)), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
