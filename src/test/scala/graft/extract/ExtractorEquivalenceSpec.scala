package graft.extract

import graft.GraftSpec
import graft.sources.PageGen
import org.apache.spark.sql.functions._

/** The fused shuffle-free extractor must produce EXACTLY the quads of the
  * modular typed path (MentionDetector -> EntityLinker) — same detection,
  * same argmax tie-breaks, same per-page dedup. */
class ExtractorEquivalenceSpec extends GraftSpec {
  import spark.implicits._

  test("rowwise fused extractor == modular typed path, quad for quad") {
    val pages = PageGen.snapshot(spark, 250, 0).toDF().cache()
    val surfaces = MentionDetector.surfaceDim(spark)
    val mentions = MentionDetector.detect(pages, surfaces)
    val links = EntityLinker.link(mentions, pages, surfaces)
    val modular = EntityLinker.toQuadsAttributed(links, pages)
    val fused = RowwiseExtractor.pageQuads(pages)

    val cols = Seq("url", "s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
    val m = modular.select(cols.map(col): _*).as[(String, String, String, String, Int, String, String, String)].collect().toSet
    val f = fused.select(cols.map(col): _*).as[(String, String, String, String, Int, String, String, String)].collect().toSet
    val onlyM = m diff f
    val onlyF = f diff m
    assert(onlyM.isEmpty && onlyF.isEmpty,
      s"onlyModular=${onlyM.take(3)} onlyFused=${onlyF.take(3)}")
    pages.unpersist()
  }
}
