package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic CLUSTERED embedding corpus (mixture of Gaussians on the
  * unit sphere) for ANN quality evidence.
  *
  * The driver's `embeddings.parquet` is iid-random — pairwise cosines
  * concentrate near 0, there is no cluster structure, and any
  * partition-based ANN (IVF/LSH) can only recall the probed FRACTION of the
  * corpus: the measurement cannot distinguish a good index from a useless
  * one. Real web-scale embedding corpora cluster heavily (near-duplicate
  * pages, template families, topic manifolds) — the regime IVF exists for.
  * This generator synthesizes that regime deterministically (no external
  * data, per round-5 contract): `centers` spherical Gaussian clusters with
  * per-point noise `sigma`, every value derived from seeded `java.util
  * .Random` streams keyed by (seed, cluster) / (seed, point id), so the
  * corpus is bit-identical across runs, partitionings, and parallelism
  * levels.
  *
  * Schema matches the driver table: (vec_id long, embedding array<float>,
  * label int) with label = true cluster id.
  */
object EmbedGen {

  /** Stafford-variant mix so adjacent ids seed uncorrelated streams. */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def gaussians(seed: Long, n: Int): Array[Double] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(r.nextGaussian())
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(math.max(s, 1e-12))
    v.map(_ * inv)
  }

  /** Unit-norm cluster centers; in dim >= 32 random unit vectors are
    * near-orthogonal, so clusters are well separated by construction. */
  def centers(nCenters: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nCenters)(c => normalize(gaussians(mix(seed, -1L - c), dim)))

  /** n rows, evenly assigned round-robin to clusters. Point = unit-normalized
    * (center + sigma * gaussian noise). sigma=0.15 gives noise norm
    * ~sigma*sqrt(dim)=1.2 — clusters dominate but their boundaries LEAK
    * (a minority of points sit nearer a foreign center), so a recall curve
    * over nProbe has a real ramp instead of saturating trivially at 1.
    * Distributed and order-independent: each row is a pure function of its
    * id. */
  def clustered(spark: SparkSession, n: Long, dim: Int = 64, nCenters: Int = 32,
                sigma: Double = 0.15, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val cents = centers(nCenters, dim, seed) // small closure constant
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val cluster = (id % nCenters).toInt
        val noise = gaussians(mix(seed, id), dim)
        val c = cents(cluster)
        val v = normalize(Array.tabulate(dim)(j => c(j) + sigma * noise(j)))
        (id, v.map(_.toFloat).toSeq, cluster)
      }
    }.toDF("vec_id", "embedding", "label")
  }
}
