package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One scored candidate pair (typed hot-path row). */
final case class ScoredPair(q_id: Long, n_id: Long, sim: Double)

/** Corpus row with its assigned cell/bucket (typed hot-path row). */
final case class CellRow(vec_id: Long, embedding: Seq[Float], cell: Int)

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k — the exact baseline; one broadcast of the
  *    (small) query set against the corpus, no corpus shuffle at all;
  *  - seeded-hyperplane LSH ANN — bucket = sign bits of the embedding's dot
  *    products with `planes` pseudo-random ±1 hyperplanes. The weights are
  *    deterministic constants (md5 parity of "hp:<seed>:<plane>:<dim>"), so
  *    buckets are de-correlated across dimensions and bit-reproducible in
  *    any engine. Candidate pairs only form within a bucket, and oversized
  *    buckets are dropped by the `maxBucket` guard — the same explicit skew
  *    cap as [[Dedup.ngramJaccardPairs]];
  *  - IVF ANN — data-adaptive centroid cells from a deterministic
  *    driver-side k-means over a bounded sample ([[kmeansCentroids]]),
  *    optional multi-cell probing (`nProbe`).
  *
  * HOT-PATH SHAPE: joins, windows and filters stay declarative DataFrame
  * ops (Catalyst plans the exchanges), but all per-row vector arithmetic
  * (dot products, bucket sign bits, cell argmax) runs in typed
  * `mapPartitions` loops. Spark's higher-order array functions
  * (`aggregate`/`zip_with`) are CodegenFallback — interpreted, one closure
  * + boxed Double per element — and profiling showed them as the dominant
  * cost of every ANN query (the same pathology TypedExtractor fixed for
  * extraction). The Scala loops fold in index order over doubles, so
  * results stay bit-identical to the Column forms (TypedSimilaritySpec)
  * and to the DuckDB oracle's explicit index-ordered SQL sums.
  */
object Similarity {

  // --- Column forms (kept for equivalence tests; NOT the hot path) -------

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // --- typed scalar kernels ----------------------------------------------

  /** Index-ordered double-fold cosine — bit-identical to [[cosine]]. */
  def cosineScala(a: Seq[Float], b: Seq[Float]): Double = {
    val n = a.length
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** cosine(float vector, double centroid) with the same fold order. */
  def cosineScala(a: Seq[Float], b: Array[Double]): Double = {
    val n = a.length
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Typed scoring of candidate pairs: input must have columns
    * (q_id, q_emb, n_id, n_emb); returns (q_id, n_id, sim). The join that
    * produced the pairs stays Catalyst; only the arithmetic is typed. */
  private[operators] def scorePairs(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("q_id").cast("long"), col("q_emb"),
        col("n_id").cast("long"), col("n_emb"))
      .as[(Long, Seq[Float], Long, Seq[Float])]
      .mapPartitions(_.map { case (q, qe, nId, ne) =>
        ScoredPair(q, nId, cosineScala(qe, ne))
      })
      .toDF()
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Brute-force cosine top-k: for each query row, the k nearest corpus rows
    * (excluding itself). `queries` is expected to be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val pairs = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
    topK(scorePairs(pairs), k)
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

  /** Column form of the LSH bucket key (equivalence-test reference). */
  private[operators] def hyperplaneBucket(emb: Column, planes: Int, dim: Int,
                                          seed: Int = 42): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, i) =>
      val w = array(hyperplaneWeights(i, dim, seed).map(lit): _*)
      acc.bitwiseOR(when(dot(emb, w) > 0d, shiftleft(lit(1L), i)).otherwise(0L))
    }

  /** Typed bucket assignment: bit `i` of `bucket` set iff
    * dot(emb, hyperplane_i) > 0 — one fused loop over the planes. */
  private[operators] def withBucket(corpus: DataFrame, planes: Int, dim: Int, seed: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ws: Array[Array[Double]] =
      Array.tabulate(planes)(i => hyperplaneWeights(i, dim, seed))
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, emb) =>
        var bucket = 0L
        var i = 0
        while (i < planes) {
          val w = ws(i)
          var d = 0.0; var j = 0
          val n = math.min(emb.length, w.length)
          while (j < n) { d += emb(j).toDouble * w(j); j += 1 }
          if (d > 0d) bucket |= (1L << i)
          i += 1
        }
        (id, emb, bucket)
      })
      .toDF("vec_id", "embedding", "bucket")
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
    val b = capBuckets(withBucket(corpus, planes, dim, seed), maxBucket)
    val l = b.select(col("bucket"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val r = b.select(col("bucket"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val pairs = l.join(r, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "q_emb", "n_id", "n_emb")
    topK(scorePairs(pairs), k)
  }

  /** Deterministic seeded k-means for IVF centroids: Lloyd iterations over
    * a BOUNDED driver-side sample (the standard IVF recipe — centroids come
    * from a sample pass, never the full corpus; at 10^12 rows the sample is
    * the only tractable training set). Deterministic AND unbiased: sample =
    * first `sampleSize` rows by xxhash64(vec_id) (a distributed top-k over
    * a uniform pseudo-random order — ordering by raw vec_id would model
    * only the HEAD of the corpus, since ids correlate with crawl order /
    * domain at real scale), init = evenly spaced sample points, assignment
    * ties -> smallest cell. Empty cells keep their previous centroid. */
  def kmeansCentroids(corpus: DataFrame, k: Int, sampleSize: Int = 1024,
                      iters: Int = 5): Seq[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] =
      corpus.select(col("vec_id").cast("long"), col("embedding"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleSize)
        .as[(Long, Seq[Float])]
        .collect().map(_._2.toArray)
    require(sample.nonEmpty, "kmeansCentroids: empty corpus")
    val dim = sample(0).length
    val kk = math.min(k, sample.length)
    var cents: Array[Array[Double]] =
      Array.tabulate(kk)(i => sample((i * sample.length) / kk).map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Long](kk)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < kk) {
          val s = cosineScala(v, cents(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (cnts(c) == 0) cents(c)
        else { val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(c)(j) / cnts(c); j += 1 }
          m }
      }
      it += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
  }

  /** Typed cell assignment: each row's `nProbe` nearest centroids by cosine
    * (ties -> smallest cell id), emitted as one row per probed cell. The
    * centroid table rides along as a closure constant (task-broadcast) —
    * for thousands of centroids pass it through `sparkContext.broadcast`
    * upstream; the loop shape is identical. */
  def cellAssign(corpus: DataFrame, centroids: Seq[(Int, Array[Double])],
                 nProbe: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroids.sortBy(_._1).toArray
    val np = math.min(math.max(nProbe, 1), cents.length)
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, emb) =>
          val scored = cents.map { case (cid, v) => (cosineScala(emb, v), cid) }
          // sims descending, ties -> smallest cid (deterministic)
          val top = scored.sortBy { case (s, cid) => (-s, cid) }.take(np)
          top.map { case (_, cid) => CellRow(id, emb, cid) }
        }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** IVF (inverted-file) ANN: the corpus partitions into cells by nearest
    * centroid; each query probes its `nProbe` nearest cells — candidate
    * pairs form within a cell, the same bounded-join shape as [[lshTopK]]
    * but with data-adaptive regions. Recall < 1 by design (cell-boundary
    * neighbours are missed); centroid count and nProbe trade cell size
    * against recall — the bench reports measured recall vs
    * [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queryFilter: Column, k: Int,
              centroids: Seq[(Int, Array[Double])], nProbe: Int = 1): DataFrame = {
    val cells = cellAssign(corpus, centroids, 1)
    val q = (if (nProbe == 1) cells
             else cellAssign(corpus.filter(queryFilter), centroids, nProbe))
      .filter(queryFilter)
      .select(col("cell"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val n = cells.select(col("cell"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val pairs = q.join(n, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "q_emb", "n_id", "n_emb")
    topK(scorePairs(pairs), k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked by the seeded
    * hyperplane bucket (no label column needed — real corpora have none)
    * and capped by `maxBucket`. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         planes: Int = 4, dim: Int = 64, seed: Int = 42,
                         maxBucket: Int = 10000): DataFrame = {
    val b = capBuckets(withBucket(embeddings, planes, dim, seed), maxBucket)
    val l = b.select(col("bucket"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val r = b.select(col("bucket"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val pairs = l.join(r, Seq("bucket"))
      .filter(col("q_id") < col("n_id"))
      .select("q_id", "q_emb", "n_id", "n_emb")
    scorePairs(pairs)
      .filter(col("sim") >= threshold)
      .select(col("q_id").as("a"), col("n_id").as("b"), round(col("sim"), 4).as("sim"))
  }
}
