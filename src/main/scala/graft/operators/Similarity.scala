package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k — the exact baseline; one broadcast of the
  *    (small) query set against the corpus, no corpus shuffle at all;
  *  - seeded-hyperplane LSH ANN — bucket = sign bits of the embedding's dot
  *    products with `planes` pseudo-random ±1 hyperplanes. The weights are
  *    deterministic constants (md5 parity of "hp:<seed>:<plane>:<dim>"),
  *    folded into the plan as array literals, so buckets are de-correlated
  *    across dimensions (unlike raw component signs, which collapse after
  *    normalization) and bit-reproducible in any engine. Candidate pairs
  *    only form within a bucket, and oversized buckets are dropped by the
  *    `maxBucket` guard — the same explicit skew cap as
  *    [[Dedup.ngramJaccardPairs]]: without it one degenerate bucket turns
  *    the pair space quadratic. An IVF variant would swap the bucket key
  *    for a centroid id — same join shape.
  *
  * All arithmetic is `zip_with`/`aggregate` over array columns (codegen'd);
  * values are cast to double before the dot product and folded in index
  * order so results are bit-reproducible across engines.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row, the k nearest corpus rows
    * (excluding itself). `queries` is expected to be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Seeded ±1 hyperplane weights: +1 when the top bit of
    * md5("hp:<seed>:<plane>:<j>") is set, else -1. Pure deterministic
    * constants — the DuckDB oracle inlines the identical values. */
  def hyperplaneWeights(plane: Int, dim: Int, seed: Int = 42): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val h = md.digest(s"hp:$seed:$plane:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** LSH bucket key: bit `i` set iff dot(emb, hyperplane_i) > 0. The
    * hyperplanes ride along as array literals (no shuffle, no UDF). */
  def hyperplaneBucket(emb: Column, planes: Int, dim: Int, seed: Int = 42): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, i) =>
      val w = array(hyperplaneWeights(i, dim, seed).map(lit): _*)
      acc.bitwiseOR(when(dot(emb, w) > 0d, shiftleft(lit(1L), i)).otherwise(0L))
    }

  /** Drop rows whose bucket holds more than `maxBucket` members — the
    * explicit cap that keeps the within-bucket self-join sub-quadratic even
    * on a skew-sign corpus (e.g. all-positive embeddings after ReLU). */
  private def capBuckets(b: DataFrame, maxBucket: Int): DataFrame = {
    val sizes = b.groupBy("bucket").count().filter(col("count") <= maxBucket)
    b.join(sizes.select("bucket"), Seq("bucket"), "left_semi")
  }

  /** LSH-bucketed ANN: candidate neighbours share the hyperplane bucket;
    * top-k by cosine within bucket. Recall < 1 by design; the bench compares
    * its speed and overlap against [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, k: Int, planes: Int = 8, dim: Int = 64,
              seed: Int = 42, maxBucket: Int = 10000): DataFrame = {
    val b = capBuckets(
      corpus.select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), planes, dim, seed).as("bucket")),
      maxBucket)
    val l = b.select(col("bucket"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val r = b.select(col("bucket"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = l.join(r, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** IVF cell id: argmax-cosine over a SMALL centroid table folded into the
    * plan as array literals — the assignment is a narrow, shuffle-free
    * per-row fold (ties -> smallest cell id). A production system would
    * k-means the centroids; the join shape is identical. */
  def ivfCell(emb: Column, centroids: Seq[(Int, Array[Double])]): Column =
    centroids.foldLeft(struct(lit(Double.MinValue).as("s"), lit(-1).as("c"))) {
      case (acc, (cid, v)) =>
        val sim = cosine(emb, array(v.map(lit): _*))
        when(sim > acc.getField("s"), struct(sim.as("s"), lit(cid).as("c")))
          .otherwise(acc)
    }.getField("c")

  /** IVF (inverted-file) ANN: the corpus partitions into cells by nearest
    * centroid; each query probes ONLY its own cell (nProbe=1) — candidate
    * pairs form within a cell, the same bounded-join shape as
    * [[lshTopK]] but with data-adaptive regions instead of hyperplane
    * buckets. Recall < 1 by design (cell-boundary neighbours are missed);
    * the centroid count trades cell size against recall. */
  def ivfTopK(corpus: DataFrame, queryFilter: Column, k: Int,
              centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val cells = corpus.select(col("vec_id"), col("embedding"),
      ivfCell(col("embedding"), centroids).as("cell"))
    val q = cells.filter(queryFilter)
      .select(col("cell"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val n = cells.select(col("cell"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = q.join(n, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs, blocked by the seeded
    * hyperplane bucket (no label column needed — real corpora have none)
    * and capped by `maxBucket`. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         planes: Int = 4, dim: Int = 64, seed: Int = 42,
                         maxBucket: Int = 10000): DataFrame = {
    val b = capBuckets(
      embeddings.select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), planes, dim, seed).as("bucket")),
      maxBucket)
    val l = b.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"))
    val r = b.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
  }
}
