package graft.publish

import graft.GraftSpec
import graft.sources.PageGen
import graft.streaming.QuadLogPipeline
import org.apache.spark.sql.functions._

class PublishSpec extends GraftSpec {
  import spark.implicits._

  test("manifest inventories committed patch files with md5/length/lastmod") {
    val root = tmpDir("publish1")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4,
      canonicalize = false, maxq = 40)
    val r = pipe.bootstrap(PageGen.snapshot(spark, 30, 0), "e1", "00000000000000")
    val manifest = ManifestBuilder.build(spark, s"$root/patches/batch_0", filesPerBatch = 3)
    assert(manifest.count() == r.files)
    val row = manifest.orderBy("resource").head()
    assert(row.getAs[String]("md5").length == 32)
    assert(row.getAs[Long]("length") > 0)
    assert(row.getAs[String]("graph_b64").nonEmpty)
    // window packaging: all but at most one batch complete
    val summary = ManifestBuilder.batchSummary(manifest).collect()
    assert(summary.count(!_.getAs[Boolean]("is_complete")) <= 1)
  }

  test("end-part republish only when content changed (J3 anti-join)") {
    val root = tmpDir("publish2")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4,
      canonicalize = false, maxq = 40)
    pipe.bootstrap(PageGen.snapshot(spark, 30, 0), "e1", "00000000000000")
    val m1 = ManifestBuilder.build(spark, s"$root/patches/batch_0", 3).cache()
    // unchanged republish -> empty delta
    assert(ManifestBuilder.changedEndPart(m1, m1).count() == 0)
    // vs empty old manifest -> the whole provisional window
    val none = m1.limit(0)
    val endSize = m1.filter(!col("is_complete")).count()
    assert(ManifestBuilder.changedEndPart(m1, none).count() == endSize)
  }
}
