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

    // and the whole streamed changelog publishes end-to-end: zips + the
    // ResourceSync metadata set over every committed batch dir, fanned out
    // by the pipeline's graph index (three reference stages glued)
    val sink = tmpDir("stream_sink")
    val zips = graft.publish.ZipPublisher.publish(spark, s"$root/patches", sink,
      filesPerZip = 5, graphIndex = Some(pipe.graphIndex))
    assert(zips.nonEmpty)
    assert(new java.io.File(s"$sink/.well-known/resourcesync").exists())
    val pubGraphs = zips.map(_.graph_b64).toSet
    val idxGraphs = pipe.graphIndex.select("g_b64").collect().map(_.getString(0)).toSet
    assert(pubGraphs.subsetOf(idxGraphs))
    // reconciliation (A7): published resources == committed patch files
    val published = zips.map(_.nResources).sum
    val onDisk = new java.io.File(s"$root/patches").listFiles().flatMap(b =>
      b.listFiles().filter(_.isDirectory).flatMap(_.listFiles()))
      .count(f => f.getName.startsWith("rdf_out_")) // not hadoop .crc sidecars
    assert(published == onDisk)
  }
}
