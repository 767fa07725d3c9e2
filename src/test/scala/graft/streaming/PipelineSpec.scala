package graft.streaming

import graft.GraftSpec
import graft.plans.QuadDiff
import graft.sources.PageGen
import graft.extract.TextExtractor
import org.apache.spark.sql.functions._

/** End-to-end: bootstrap dump -> incremental batches over evolving page
  * snapshots; verifies the reference's core invariants (SURVEY.md §5):
  * reconciliation (A7), diff correctness (J1), idempotent re-run (T8),
  * resume-from-checkpoint equals single-run output (T2). */
class PipelineSpec extends GraftSpec {
  import spark.implicits._

  private val N = 120L

  test("byte-identical text extraction per url (input_hint invariant)") {
    val pages = PageGen.snapshot(spark, 200, 0)
    val checked = TextExtractor.withExtracted(pages.toDF())
    assert(checked.filter(!col("text_ok")).count() == 0)
    // scala mirror == column form
    val p = PageGen.pageFor(7, 0)
    assert(TextExtractor.extractText(p.html) == p.text)
  }

  test("bootstrap + two incremental batches keep state == full re-extraction") {
    val root = tmpDir("graft_e2e")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = false)
    val s0 = PageGen.snapshot(spark, N, 0)
    val r0 = pipe.bootstrap(s0, epoch = "e1", checkpoint = "00000000000000")
    assert(r0.added > 0 && r0.files > 0)

    // invariant after bootstrap: facts == extraction of snapshot 0
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(s0)).count() == 0)

    for (snap <- 1 to 2) {
      val prev = PageGen.snapshot(spark, N, snap - 1).collect().map(p => p.url -> p).toMap
      val cur = PageGen.snapshot(spark, N, snap)
      val curMap = cur.collect().map(p => p.url -> p).toMap
      val changed = cur.filter(p =>
        !prev.contains(p.url) || prev(p.url).text != p.text)
      val deleted = spark.createDataset(
        prev.keys.filterNot(curMap.contains).toSeq)
      val r = pipe.incremental(snap.toLong, f"2024010${snap + 1}%s000000", changed, deleted)
      // reconciliation: incremental state == full extraction of current snapshot
      val expected = pipe.extractedQuads(cur)
      val drift = QuadDiff.diff(pipe.currentQuads, expected)
      assert(drift.count() == 0, s"state drift at snapshot $snap")
      assert(r.added + r.deleted > 0, "synthetic churn should produce patches")
    }

    // idempotent re-run of an already-committed batch is a no-op (T8)
    val again = pipe.incremental(2L, "20240103000000",
      PageGen.snapshot(spark, N, 2).limit(5), spark.emptyDataset[String])
    assert(again.added == 0 && again.deleted == 0)
  }

  test("patch files parse back and reconcile with lineage counts") {
    val root = tmpDir("graft_patches")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = false, maxq = 50)
    val s0 = PageGen.snapshot(spark, 40, 0)
    val r0 = pipe.bootstrap(s0, "e1", "00000000000000")
    val lines = spark.read.textFile(s"$root/patches/batch_0/*")
    val bodies = lines.filter(l => l.startsWith("+") || l.startsWith("-"))
    assert(bodies.count() == r0.added)
    // headers present, one per FILE, with the reference's exact label
    // padding (vql_print_graph: values start at column 18) and each file's
    // own '# amount' equal to its body-line count, body <= maxq
    assert(lines.filter(_.startsWith("# at checkpoint  ")).count() > 0)
    val fsDir = new java.io.File(s"$root/patches/batch_0")
    fsDir.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.startsWith("rdf_out_")).foreach { f =>
        val ls = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
        assert(ls(0).startsWith("# at checkpoint  "))
        assert(ls(1).startsWith("# graph          "))
        assert(ls(2).startsWith("# base64         "))
        assert(ls(3).startsWith("# amount         "))
        val amount = ls(3).substring("# amount         ".length).trim.toLong
        val body = ls.drop(4)
        assert(body.forall(l => l.startsWith("+") || l.startsWith("-")))
        assert(body.size == amount && body.size <= 50)
      }
    // every body line round-trips through the parser
    val parsed = bodies.map(l => graft.rdf.NTriplesParser.parseLine(l, "x").isDefined)
    assert(parsed.filter(b => !b).count() == 0)
    // file naming follows rdf_out_<cp14>-<serial14>
    val fs = new java.io.File(s"$root/patches/batch_0")
    val files = fs.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .map(_.getName).filter(!_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.matches("rdf_out_00000000000000-\\d{14}")))
    // dump-report trailer file (dump_nquads.sql:58-83 / sample fixture):
    // five '#' lines, values at column 18, quad/file counts reconciled
    val report = new java.io.File(
      s"$root/patches/batch_0/rdf_out_00000000000000-99999999999998")
    assert(report.exists())
    val rl = scala.io.Source.fromFile(report, "UTF-8").getLines().toVector
    assert(rl(0) == "# at checkpoint  00000000000000")
    assert(rl(1).startsWith("# dump started   "))
    assert(rl(2).startsWith("# dump completed "))
    assert(rl(3) == s"# quad count     ${r0.added}")
    assert(rl(4) == s"# file count     ${r0.files}")
    // lineage recorded per bucket with counts
    val lin = pipe.lineage
    assert(lin.filter(col("batchId") === 0).agg(max("added")).head().getLong(0) == r0.added)
  }

  test("incremental reconciliation with canonicalize=true over alias-bearing input") {
    // PageGen corpus now genuinely carries coreferent aliases: hosts ending
    // "3.example.org" reference entities under /alt/. Incremental state must
    // keep reconciling with re-derivation through the SAME persisted map.
    val root = tmpDir("graft_canon_e2e")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = true)
    val s0 = PageGen.snapshot(spark, N, 0)
    pipe.bootstrap(s0, "e1", "00000000000000")
    assert(pipe.canon.latest.contains(0L), "canonical map must be persisted state")
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(s0)).count() == 0)

    for (snap <- 1 to 2) {
      val prev = PageGen.snapshot(spark, N, snap - 1).collect().map(p => p.url -> p).toMap
      val cur = PageGen.snapshot(spark, N, snap)
      val curMap = cur.collect().map(p => p.url -> p).toMap
      val changed = cur.filter(p => !prev.contains(p.url) || prev(p.url).text != p.text)
      val deleted = spark.createDataset(prev.keys.filterNot(curMap.contains).toSeq)
      pipe.incremental(snap.toLong, f"2024010${snap + 1}%s000000", changed, deleted)
      val drift = QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(cur))
      assert(drift.count() == 0, s"canonicalized state drift at snapshot $snap")
    }
  }

  test("emitted incremental patches == ExpectedKg closed form (incl. cluster merge)") {
    // the oracle rows q_pipeline_incremental / q_pipeline_remap certify this
    // against DuckDB; this spec pins the same agreement inside sbt test at
    // the n=40 corpus where batch 2 carries a natural cluster-merge remap
    import graft.sources.ExpectedKg
    val n = 40L
    val root = tmpDir("graft_expected_incr")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = true)
    pipe.bootstrap(PageGen.snapshot(spark, n, 0), "e1", "00000000000000")
    for (snap <- 1 to 2) {
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
      assert(emitted == expected, s"batch $snap patch set != closed form " +
        s"(extra=${(emitted -- expected).take(3)}, missing=${(expected -- emitted).take(3)})")
    }
    // the pinned merge event: batch 2 retracts rows under the superseded
    // /entity/ representative and re-adds them under /alt/
    val b2 = ExpectedKg.incrementalPatches(n, 2)
    val adds = b2.filter(_.op == "+").map(q => (q.s, q.p)).toSet
    assert(b2.exists(q => q.op == "-" && q.s.contains("/entity/") &&
      adds.contains((q.s.replace("/entity/", "/alt/"), q.p))),
      "n=40 batch 2 must contain the cluster-merge remap rows")
  }

  test("canonical cluster merge across batches remaps stored facts via -/+ patches") {
    import graft.model.Page
    val root = tmpDir("graft_remap")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = true)
    def page(host: String, id: String, text: String): Page = {
      val url = s"https://$host.example.org/page/$id"
      Page(url, new java.sql.Timestamp(1704067200000L),
        PageGen.htmlFor(url, text, "en"), text, "en")
    }
    // batch 0: only the /entity/ namespace exists (normal host)
    val p0 = page("host1", "a", "rembrandt painter art museum")
    pipe.bootstrap(spark.createDataset(Seq(p0)), "e1", "00000000000000")
    val entityIri = "http://kg.example.org/entity/Rembrandt"
    val altIri = "http://kg.example.org/alt/Rembrandt"
    assert(pipe.currentQuads.filter(col("oLex") === entityIri).count() > 0)

    // batch 1: an alias site mentions the same entity -> /alt/ IRI appears,
    // LSH merges the two namespaces, and the component min (the /alt/ IRI)
    // supersedes the stored representative -> stored facts remapped
    val p1 = page("host3", "b", "rembrandt painter art museum")
    val r1 = pipe.incremental(1L, "20240102000000",
      spark.createDataset(Seq(p1)), spark.emptyDataset[String])
    assert(r1.added > 0 && r1.deleted > 0, "remap must surface as -/+ patches")
    // plan shape: the remap scan must be BUCKET-PRUNED via contrib's term
    // blooms (the one stored url's bucket, not the full store) — the last
    // store-sized read in any incremental path is gone
    assert(pipe.lastRemapBuckets.exists(bs => bs.nonEmpty && bs.size < pipe.contrib.numBuckets),
      s"remap batch planned an unpruned scan: ${pipe.lastRemapBuckets}")

    val cur = pipe.currentQuads
    assert(cur.filter(col("s") === entityIri || col("oLex") === entityIri).count() == 0,
      "superseded representative must be gone from state")
    assert(cur.filter(col("oLex") === altIri).count() > 0)
    // the patch files of batch 1 record the retraction of the old rep
    val lines = spark.read.textFile(s"$root/patches/batch_1/*")
    assert(lines.filter(l => l.startsWith("-") && l.contains(entityIri)).count() > 0)
    // and the state reconciles with re-derivation through the persisted map
    val all = spark.createDataset(Seq(p0, p1))
    assert(QuadDiff.diff(cur, pipe.extractedQuads(all)).count() == 0)
  }

  test("one-exchange supportCounts == groupBy support aggregation") {
    val root = tmpDir("graft_supp")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = false)
    // adversarial key content: nulls, empties, duplicates across many urls,
    // and near-identical quads differing in one slot
    val rows = (0 until 500).map { i =>
      ("u" + (i % 37), "s" + (i % 11), "p" + (i % 3),
        if (i % 7 == 0) null else "o" + (i % 5),
        i % 2, if (i % 5 == 0) "" else "dt" + (i % 4),
        if (i % 3 == 0) null else "ln", "g" + (i % 6))
    }
    val df = rows.toDF("url", "s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
    val fast = pipe.supportCounts(df)
      .select("s", "p", "oLex", "oKind", "oDtype", "oLang", "g", "support", "bucket")
      .collect().map(_.toSeq).toSet
    val slow = df.groupBy(QuadDiff.quadCols.map(col): _*)
      .agg(count(lit(1)).as("support"))
      .withColumn("bucket", pipe.facts.bucketCol(QuadDiff.quadCols.map(col): _*))
      .select("s", "p", "oLex", "oKind", "oDtype", "oLang", "g", "support", "bucket")
      .collect().map(_.toSeq).toSet
    assert(fast == slow, s"supportCounts diverged: only-fast=${(fast -- slow).take(3)} " +
      s"only-slow=${(slow -- fast).take(3)}")
  }

  test("canon-map reads are bucket-pruned via term-bloom sidecars") {
    import graft.model.Page
    val root = tmpDir("graft_canonprune")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 8, canonicalize = true)
    def page(host: String, id: String, text: String): Page = {
      val url = s"https://$host.example.org/page/$id"
      Page(url, new java.sql.Timestamp(1704067200000L),
        PageGen.htmlFor(url, text, "en"), text, "en")
    }
    // bootstrap mentions MANY entities -> the canon store's ids spread
    // over its buckets (8 entity + class IRIs over 8 buckets)
    val texts = Seq(
      "web internet browser page", "amsterdam city canal netherlands",
      "rembrandt painter art museum", "mercury planet orbit solar",
      "mercury metal chemical toxic", "spark cluster query shuffle",
      "tulip flower garden bulb", "erasmus scholar philosophy rotterdam")
    val p0 = texts.zipWithIndex.map { case (t, i) => page("host1", s"p$i", t) }
    pipe.bootstrap(spark.createDataset(p0), "e1", "00000000000000")

    // incremental batch touches ONE entity -> its candidate IRI set is two
    // terms (entity + class), so the canon-map read must plan a PROPER
    // SUBSET of the store's buckets (sidecar bloom probe), never the full
    // accumulated map — the map analogue of the remap-scan assertion above
    val p1 = page("host1", "px", "rembrandt painter art museum")
    val r1 = pipe.incremental(1L, "20240102000000",
      spark.createDataset(Seq(p1)), spark.emptyDataset[String])
    assert(pipe.lastCanonBuckets.exists(bs => bs.nonEmpty && bs.size < pipe.canon.numBuckets),
      s"canon batch planned an unpruned map read: ${pipe.lastCanonBuckets}")

    // and the state still reconciles with full re-derivation
    val all = spark.createDataset(p0 :+ p1)
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(all)).count() == 0)

    // persisted-signature contract: every canon store row (bootstrap full
    // write AND the incremental delta) carries a `sig` equal to the
    // write-side expression recomputed from the id — the invariant that
    // lets extendChangedGivenFresh skip the accumulated-domain signature
    // pass (verifiedPairsStored)
    val st = pipe.canon.read().get
    assert(st.columns.contains("sig"), st.columns.mkString(","))
    assert(st.filter(!(col("sig") <=>
        graft.canon.IriCanonicalizer.signatureColumn(col("id")))).isEmpty,
      "stored sig diverges from the write-side recompute")
  }

  test("crash between store finalizes is repaired from the commit marker") {
    val root = tmpDir("graft_crash")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = false)
    val s0 = PageGen.snapshot(spark, 40, 0)
    val s1 = PageGen.snapshot(spark, 40, 1)
    val prev = s0.collect().map(p => p.url -> p).toMap
    val curMap = s1.collect().map(p => p.url -> p).toMap
    val changed = s1.filter(p => !prev.contains(p.url) || prev(p.url).text != p.text)
    val deleted = spark.createDataset(prev.keys.filterNot(curMap.contains).toSeq)
    pipe.bootstrap(s0, "e1", "00000000000000")
    pipe.incremental(1L, "20240102000000", changed, deleted)
    val want = pipe.currentQuads.collect().toSet

    // simulate the crash window: marker written, facts finalized, contrib
    // pointer still at the previous snapshot (the ADVICE scenario)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/contrib/_latest"), "0")
    // raw write bypasses Hadoop's checksum sidecar — drop the stale .crc
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/contrib/._latest.crc"))
    val resumed = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = false)
    // recovery runs at batch entry; the re-run is then a committed no-op
    val again = resumed.incremental(1L, "20240102000000", changed, deleted)
    assert(again.added == 0 && again.deleted == 0)
    assert(resumed.contrib.latest.contains(1L), "contrib pointer must be replayed")
    assert(resumed.currentQuads.collect().toSet == want)
    // and contrib state matches a fresh derivation (not one batch stale)
    assert(QuadDiff.diff(resumed.currentQuads,
      resumed.extractedQuads(s1)).count() == 0)
  }

  test("degenerate batch shapes: no-op, pure-delete, pure-add all reconcile") {
    val root = tmpDir("graft_soak")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = true)
    val s0 = PageGen.snapshot(spark, 40, 0)
    pipe.bootstrap(s0, "e1", "00000000000000")

    // batch 1: NOTHING changed — must commit as an explicit empty batch
    val r1 = pipe.incremental(1L, "20240102000000",
      s0.limit(0), spark.emptyDataset[String])
    assert(r1.added == 0 && r1.deleted == 0)
    assert(pipe.facts.latest.contains(1L), "empty batches still advance the store")
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(s0)).count() == 0)

    // batch 2: PURE DELETE of a third of the corpus
    val dropped = s0.collect().map(_.url).sorted.take(13).toSeq
    val kept = s0.filter(p => !dropped.contains(p.url))
    val r2 = pipe.incremental(2L, "20240103000000",
      s0.limit(0), spark.createDataset(dropped))
    assert(r2.deleted > 0 && r2.added == 0)
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(kept)).count() == 0)

    // batch 3: PURE ADD of brand-new pages (urls outside the snapshot)
    val added = PageGen.snapshot(spark, 60, 0)
      .filter(p => p.url.substring(p.url.lastIndexOf('/') + 1).toLong >= 40L)
    val r3 = pipe.incremental(3L, "20240104000000", added, spark.emptyDataset[String])
    assert(r3.added > 0)
    val want = kept.union(added)
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(want)).count() == 0)

    // idempotent re-run of the final batch
    val again = pipe.incremental(3L, "20240104000000", added, spark.emptyDataset[String])
    assert(again.added == 0 && again.deleted == 0)
  }

  test("canon store moves with the commit marker (three-store crash replay)") {
    import graft.model.Page
    val root = tmpDir("graft_canon_crash")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = true)
    def page(host: String, id: String, text: String): Page = {
      val url = s"https://$host.example.org/page/$id"
      Page(url, new java.sql.Timestamp(1704067200000L),
        PageGen.htmlFor(url, text, "en"), text, "en")
    }
    val p0 = page("host1", "a", "rembrandt painter art museum")
    val p1 = page("host3", "b", "rembrandt painter art museum") // alias site
    pipe.bootstrap(spark.createDataset(Seq(p0)), "e1", "00000000000000")
    pipe.incremental(1L, "20240102000000",
      spark.createDataset(Seq(p1)), spark.emptyDataset[String])
    val want = pipe.currentQuads.collect().toSet
    assert(pipe.canon.latest.contains(1L))

    // crash window: marker written (it is), NO store finalized — roll all
    // three pointers back; the staged snap_1 data + manifests stay on disk
    for (store <- Seq("canon", "facts", "contrib")) {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/$store/_latest"), "0")
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$root/$store/._latest.crc"))
    }
    val resumed = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = true)
    val again = resumed.incremental(1L, "20240102000000",
      spark.createDataset(Seq(p1)), spark.emptyDataset[String])
    assert(again.added == 0 && again.deleted == 0, "replay then no-op")
    assert(resumed.canon.latest.contains(1L), "canon pointer must replay with the marker")
    assert(resumed.currentQuads.collect().toSet == want)
    // facts state and the replayed canonical map still reconcile
    assert(QuadDiff.diff(resumed.currentQuads,
      resumed.extractedQuads(spark.createDataset(Seq(p0, p1)))).count() == 0)
  }

  test("epoch reset (T6): new epoch wipes and re-derives downstream state") {
    val root = tmpDir("graft_epoch")
    val pipe = new QuadLogPipeline(spark, root, numBuckets = 4, canonicalize = false)
    pipe.bootstrap(PageGen.snapshot(spark, 30, 0), "epoch-1", "00000000000000")
    assert(pipe.facts.epoch.contains("epoch-1"))
    val s1 = PageGen.snapshot(spark, 30, 1)
    pipe.bootstrap(s1, "epoch-2", "00000000000001") // cascading reset
    assert(pipe.facts.epoch.contains("epoch-2"))
    assert(QuadDiff.diff(pipe.currentQuads, pipe.extractedQuads(s1)).count() == 0)
  }

  test("resume: re-running from committed state equals single-run output") {
    val rootA = tmpDir("graft_resumeA")
    val rootB = tmpDir("graft_resumeB")
    val a = new QuadLogPipeline(spark, rootA, numBuckets = 4, canonicalize = false)
    val b = new QuadLogPipeline(spark, rootB, numBuckets = 4, canonicalize = false)
    val s0 = PageGen.snapshot(spark, 60, 0)
    val s1 = PageGen.snapshot(spark, 60, 1)
    val prev = s0.collect().map(p => p.url -> p).toMap
    val curMap = s1.collect().map(p => p.url -> p).toMap
    val changed = s1.filter(p => !prev.contains(p.url) || prev(p.url).text != p.text)
    val deleted = spark.createDataset(prev.keys.filterNot(curMap.contains).toSeq)

    a.bootstrap(s0, "e1", "00000000000000")
    a.incremental(1, "20240102000000", changed, deleted)

    b.bootstrap(s0, "e1", "00000000000000")
    // simulate crash-and-resume: a NEW pipeline object over the same root
    val b2 = new QuadLogPipeline(spark, rootB, numBuckets = 4, canonicalize = false)
    b2.incremental(1, "20240102000000", changed, deleted)

    assert(QuadDiff.diff(a.currentQuads, b2.currentQuads).count() == 0)
  }
}
