package graft

import graft.sources.{ExpectedKg, PageGen}
import graft.streaming.QuadLogPipeline

/** Multi-batch soak: emitted patches == the ExpectedKg closed form for
  * every batch of a 3-snapshot run. The full {60,120,200}x{1,2,3} grid was
  * run once this round (all 9 cells exact, 130-474 patches per cell —
  * BENCH.md); the suite keeps the middle size so the 3-deep canonical-map
  * evolution stays under regression watch without tripling suite time. */
class SoakSpec extends GraftSpec {
  import spark.implicits._

  test("soak: pipeline patches == ExpectedKg closed form across 3 batches") {
    soak(maxDeltas = 4) // default chain: batches 1-3 stay merge-on-read
  }

  test("soak with maxDeltas=1: every batch folds the delta chain to a new base") {
    // forces the compaction path (fold-to-base) inside live incremental
    // commits — the default cell never crosses the chain bound
    soak(maxDeltas = 1)
  }

  private def soak(maxDeltas: Int): Unit = {
    for (n <- Seq(120L)) {
      val root = tmpDir(s"soak_${n}_d$maxDeltas")
      val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = true,
        maxDeltas = maxDeltas)
      pipe.bootstrap(PageGen.snapshot(spark, n, 0), "e1", "00000000000000")
      for (snap <- 1 to 3) {
        val changed = spark.createDataset(
          ExpectedKg.changedIndices(n, snap).map(PageGen.pageFor(_, snap)))
        val deleted = spark.createDataset(
          ExpectedKg.deletedIndices(n, snap).map(PageGen.urlFor))
        pipe.incremental(snap.toLong, f"2024010${snap + 1}%d000000", changed, deleted)
        val emitted = spark.read.option("recursiveFileLookup", "true")
          .textFile(s"$root/patches/batch_$snap")
          .flatMap(l => graft.rdf.NTriplesParser.parseLine(l, "").map(pl =>
            (pl.op, pl.quad.s, pl.quad.p, pl.quad.oLex, pl.quad.oKind,
              pl.quad.oDtype, pl.quad.oLang, pl.quad.g)))
          .collect().toSet
        val expected = ExpectedKg.incrementalPatches(n, snap)
          .map(q => (q.op, q.s, q.p, q.oLex, q.oKind, q.oDtype, q.oLang, q.g)).toSet
        assert(emitted == expected,
          s"n=$n snap=$snap diverged: extra=${(emitted -- expected).take(3)} " +
            s"missing=${(expected -- emitted).take(3)}")
        println(s"SOAK OK n=$n snap=$snap patches=${expected.size}")
      }
    }
  }
}
