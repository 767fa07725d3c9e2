package graft.streaming

import graft.GraftSpec
import graft.plans.QuadDiff
import graft.sources.PageGen
import org.apache.spark.sql.functions._

/** Streaming ingestion must land in exactly the state the equivalent batch
  * sequence produces (same engine under foreachBatch). */
class StreamSpec extends GraftSpec {
  import spark.implicits._

  test("availableNow stream of page drops == batch incremental sequence") {
    val root = tmpDir("stream_root")
    val inDir = tmpDir("stream_in")
    val cpDir = tmpDir("stream_cp")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = false)

    val s0 = PageGen.snapshot(spark, 60, 0)
    pipe.bootstrap(s0, "e1", "00000000000000")

    // snapshot 1 changes as a CDC-style drop: changed pages + tombstones
    val s1 = PageGen.snapshot(spark, 60, 1)
    val prev = s0.collect().map(p => p.url -> p).toMap
    val curMap = s1.collect().map(p => p.url -> p).toMap
    val changed = s1.filter(p => !prev.contains(p.url) || prev(p.url).text != p.text)
    val tombstones = prev.keys.filterNot(curMap.contains).toSeq
      .map(u => graft.model.Page(u, new java.sql.Timestamp(0), Array.emptyByteArray, null, null))
    changed.toDF().unionByName(spark.createDataset(tombstones).toDF())
      .coalesce(1).write.mode("append").parquet(inDir)

    val n = new StreamRunner(spark, pipe).runAvailableNow(inDir, cpDir, startBatchId = 1)
    assert(n >= 1)

    // state must equal the full re-extraction of snapshot 1
    val expected = pipe.extractedQuads(s1)
    assert(QuadDiff.diff(pipe.currentQuads, expected).count() == 0)
  }
}
