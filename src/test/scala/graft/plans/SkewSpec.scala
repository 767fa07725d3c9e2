package graft.plans

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Adversarial-skew probe (north rule: "skew handled explicitly"): a
  * zipf-like subject distribution with ONE hub owning ~10% of all edges,
  * driven through the two operators whose naive formulations die on hubs —
  * adjacency materialization (a collect_list would buffer the hub's whole
  * edge set in one aggregation buffer) and connected components (an
  * unsalted min-join would route every hub edge through one task).
  * graft.Micro's SKEW_STRESS mode runs the same corpus at >=10^6 edges for
  * the BENCH.md numbers; this spec pins the invariants at suite-friendly
  * size. */
class SkewSpec extends GraftSpec {
  import spark.implicits._

  private def zipfEdges(nEdges: Long) =
    graft.sources.EdgeGen.zipfEdges(spark, nEdges)

  test("adjacency pages: a 10%-of-corpus hub stays bounded at pageSize") {
    val n = 200000L
    val pageSize = 512
    val edges = zipfEdges(n).select(col("s"), col("d").as("e"))
    val pages = GraphMaterialize.adjacencyPages(edges, numBuckets = 16,
      pageSize = pageSize).cache()
    // the invariant that keeps task memory bounded: NO page exceeds pageSize
    val maxDeg = pages.agg(max("degree")).head().getInt(0)
    assert(maxDeg <= pageSize, s"page of $maxDeg edges exceeds bound $pageSize")
    // nothing lost: page degrees reconstruct the full edge multiset
    val total = pages.agg(sum("degree")).head().getLong(0)
    assert(total == n, s"edge count drifted: $total != $n")
    // the hub fans out into exactly ceil(hubEdges / pageSize) pages
    val hubEdges = n / 10
    val hubPages = pages.filter(col("s") === "hub0").count()
    assert(hubPages == (hubEdges + pageSize - 1) / pageSize,
      s"hub pages $hubPages != ceil($hubEdges/$pageSize)")
    // and its pages are dense except the last
    val nonFull = pages.filter(col("s") === "hub0")
      .filter(col("degree") =!= pageSize).count()
    assert(nonFull <= 1, s"$nonFull partial hub pages (streaming cut broken)")
    pages.unpersist()
  }

  test("distributed CC labels a 20k-edge hub star correctly (salted min-joins)") {
    val n = 200000L
    val edges = zipfEdges(n).toDF("src", "dst")
    // force the distributed star-contraction path (no driver fast path)
    val labels = graft.canon.ConnectedComponents
      .run(spark, edges, smallGraphCutoff = 0).cache()
    // the hub star is one component labeled by its min id ("hub0" < "hv...")
    val hubComp = labels.filter(col("component") === "hub0").count()
    assert(hubComp == n / 10 + 1,
      s"hub component has $hubComp members, expected ${n / 10 + 1}")
    // every hub-star member resolved to the hub label, none leaked elsewhere
    val leaked = labels.filter(col("id").startsWith("hv"))
      .filter(col("component") =!= "hub0").count()
    assert(leaked == 0, s"$leaked hub neighbours mislabeled")
    labels.unpersist()
  }
}
