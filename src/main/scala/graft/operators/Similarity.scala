package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k — the exact baseline; one broadcast of the
  *    (small) query set against the corpus, no corpus shuffle at all;
  *  - sign-LSH bucketed ANN — random-hyperplane-free: buckets are the signs
  *    of the first `planes` components (deterministic, reproducible in any
  *    engine); candidate pairs only form within a bucket, turning the
  *    quadratic pair space into per-bucket blocks. An IVF variant would
  *    swap the bucket key for a centroid id — same join shape.
  *
  * All arithmetic is `zip_with`/`aggregate` over array columns (codegen'd);
  * values are cast to double before the dot product so results are
  * bit-reproducible across engines.
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

  /** Deterministic sign-LSH bucket key: the sign bits of the first `planes`
    * embedding components packed into a long. */
  def signBucket(emb: Column, planes: Int): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(when(element_at(emb, i + 1) > 0f, shiftleft(lit(1L), i)).otherwise(0L))
    }

  /** LSH-bucketed ANN: candidate neighbours share the sign-bucket; top-k by
    * cosine within bucket. Recall < 1 by design; the bench compares its
    * speed and overlap against [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), planes).as("bucket"))
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

  /** Embedding-cosine near-duplicate pairs (blocked by label or bucket). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         blockCol: String = "label"): DataFrame = {
    val l = embeddings.select(col(blockCol).as("blk"), col("vec_id").as("a"),
      col("embedding").as("ea"))
    val r = embeddings.select(col(blockCol).as("blk"), col("vec_id").as("b"),
      col("embedding").as("eb"))
    l.join(r, Seq("blk"))
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
  }
}
