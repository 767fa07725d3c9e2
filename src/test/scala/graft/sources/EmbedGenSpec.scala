package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

class EmbedGenSpec extends GraftSpec {

  test("clustered corpus is deterministic, unit-norm, evenly labeled") {
    val a = EmbedGen.clustered(spark, 200, dim = 16, nCenters = 8)
    val b = EmbedGen.clustered(spark, 200, dim = 16, nCenters = 8)
      .repartition(7) // partitioning must not change values
    assert(a.count() == 200)
    // bit-identical across runs and partitionings
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // unit norm (within float tolerance)
    val norms = a.select(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x * x).as("n2")).agg(min("n2"), max("n2")).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-3)
    // round-robin labels: every cluster gets n/nCenters rows
    val sizes = a.groupBy("label").count().select("count")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    assert(sizes.length == 8 && sizes.forall(_ == 25))
  }

  test("IVF on the clustered corpus: recall >= 0.9 at probe fraction <= 1/4") {
    import graft.operators.Similarity
    val e = EmbedGen.clustered(spark, 500).cache()
    val qf = col("vec_id") < 50
    val brute = Similarity.bruteForceTopK(e, e.filter(qf), 3)
      .select("q_id", "n_id").cache()
    val denom = brute.count().toDouble
    assert(denom == 150.0)
    val cents = Similarity.kmeansCentroids(e, k = 16, sampleSize = 256, iters = 5)
    def recall(np: Int): Double =
      Similarity.ivfTopK(e, qf, 3, cents, nProbe = np)
        .select("q_id", "n_id").intersect(brute).count() / denom
    val r1 = recall(1); val r4 = recall(4)
    // the clustered regime IVF exists for: a small probe fraction recovers
    // nearly all true neighbours (the iid table can never show this)
    assert(r4 >= 0.9, s"clustered recall at nProbe=4/k=16 was $r4")
    assert(r4 >= r1, s"recall must not degrade with more probes: p1=$r1 p4=$r4")
    // and the corpus is NOT trivially separable: probing 1/16 of it must
    // leave some boundary neighbours unrecovered, so the curve has a ramp
    assert(r1 < 1.0, s"corpus too easy: recall already 1.0 at nProbe=1")
    brute.unpersist(); e.unpersist()
  }
}
