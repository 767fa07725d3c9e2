package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Page
import graft.canon.IriCanonicalizer
import graft.plans.{PatchWriter, QuadDiff}
import graft.state.SnapshotStore

/** The end-to-end KG changelog pipeline — the Spark re-expression of the
  * reference's three chained components (quad-logger -> graph-splitter ->
  * resourcesync-generator) as one incremental batch job over page snapshots.
  *
  * State layout (all four stores are [[SnapshotStore]]s: bucketed,
  * atomically committed; contrib, facts, canon AND the graph index commit
  * MERGE-ON-READ deltas per batch — O(batch) writes with bounded chains,
  * folded bucket-locally — NO store-sized write exists in any per-batch
  * path; full commits happen only at bootstrap):
  *
  *  - `contrib`  — per-PAGE quad contributions, bucketed by xxhash64(url).
  *                 The unit of incremental work: a batch only ever touches
  *                 the buckets of pages that changed.
  *  - `facts`    — global quad support counts, bucketed by xxhash64(quad).
  *                 A fact is IN the graph while support > 0; patches are the
  *                 0 <-> >0 transitions ([[QuadDiff.supportTransition]]).
  *                 This is what makes shared facts (e.g. `entity rdf:type T`
  *                 supported by millions of pages) diff correctly without
  *                 recomputing the world.
  *  - `canon`    — the ACCUMULATED entity-canonicalization map (id ->
  *                 canonical), extended monotonically per batch. Without
  *                 persistence a component's representative could differ
  *                 across batches (each batch only sees its own IRIs) and
  *                 the facts store would hold one real-world fact under
  *                 several representatives. When a new alias BRIDGES two
  *                 existing clusters the losing representative's stored
  *                 facts are rewritten and the change surfaces as ordinary
  *                 -/+ patches (remap flow in [[incremental]]).
  *
  * Per batch, work is proportional to |changed pages|, not |table|:
  *   changed pages -> extract+link -> new contributions
  *   old contributions of exactly those urls (bucket-pruned read)
  *   signed per-quad delta -> support transition vs facts store
  *   -> RDF-patch files + facts/contrib merges + lineage append.
  *
  * Checkpoint/resume (reference T2, vql_lastlogsuffix.txt): the lineage
  * table records per-bucket url ranges, the batch watermark and counts; a
  * re-run of an already-committed batch is a no-op (idempotent, T8).
  *
  * Crash atomicity across the two data stores (the facts/contrib pair must
  * move together): merges are STAGED (data + manifest, no pointer flip),
  * then a single `_commit` marker is written, then both pointers flip.
  * [[recoverPartialCommit]] replays the flips from the marker, so a crash
  * between the two finalizes can no longer leave contrib one batch behind
  * facts with re-runs silently no-oping against stale contributions.
  */
final class QuadLogPipeline(
    spark: SparkSession,
    root: String,
    numBuckets: Int = 64,
    maxq: Int = 100000,
    canonicalize: Boolean = true,
    maxDeltas: Int = 4) {

  import spark.implicits._

  graft.Preflight.assertSession(spark) // refuse to run misconfigured

  // contrib/facts take MERGE-ON-READ deltas per batch (O(batch) commit
  // writes; see SnapshotStore scaladoc — bucket-granularity COW rewrote the
  // whole store every batch because touched urls hash into every bucket).
  // Delete keys: contrib rows belong to a url; facts rows to a quad.
  // contrib records per-bucket TermBloom sidecars over the IRI slots a
  // remap lookup probes (s, and oLex when the object is an IRI): a
  // cluster-merge batch plans a bucket-pruned scan via candidateBuckets
  // instead of the full store read — at 10^12 contributions a remap
  // otherwise paid a complete store pass (the last store-sized read in
  // any incremental path).
  val contrib = new SnapshotStore(spark, s"$root/contrib", numBuckets,
    deleteKeys = Seq("url"), maxDeltas = maxDeltas,
    termExpr = Some(array(col("s"),
      when(col("oKind") === graft.model.TermKind.Iri, col("oLex")))))
  val facts = new SnapshotStore(spark, s"$root/facts", numBuckets,
    deleteKeys = QuadDiff.quadCols, maxDeltas = maxDeltas)
  // canon is MOR too: the accumulated map is O(all IRIs ever seen) — a
  // full rewrite per batch (the old stageFull) is the same unbounded-write
  // defect the contrib/facts COW had. Delta = the extendMapParts changed
  // rows; tombstones = their ids. Per-bucket TermBloom sidecars over `id`
  // (the store's own bucket key) let a batch plan BUCKET-PRUNED map reads:
  // the fresh-id check and the rewrite view probe candidateBuckets with
  // the batch's IRIs instead of reading the accumulated map (see
  // extendedCanonMap — the map analogue of contrib's remap-scan pruning).
  val canon = new SnapshotStore(spark, s"$root/canon", math.min(numBuckets, 8),
    deleteKeys = Seq("id"), maxDeltas = maxDeltas,
    termExpr = Some(array(col("id"))))
  /** A8 — first-seen graph dimension (split-graphs.sh:99-102's
    * vql_graph_folder.csv): (g, g_b64, firstBatch), insert-if-absent per
    * batch; the publish stage's per-graph fan-out reads it. MERGE-ON-READ
    * like every other store: a batch commits only its NEW graphs as a
    * delta (most batches: none — a metadata-only manifest), never a
    * rewrite of the accumulated dimension. At thousands of graphs the old
    * read+commitFull was invisible; at the millions the per-domain graph
    * model implies, it was the last O(accumulated) write in a batch. */
  val graphIdx = new SnapshotStore(spark, s"$root/graphidx", 1,
    deleteKeys = Seq("g"), maxDeltas = maxDeltas)
  private val lineageDir = s"$root/lineage"
  private val quadCols = QuadDiff.quadCols

  /** The accumulated graph-folder index (empty DataFrame before bootstrap). */
  def graphIndex: DataFrame =
    graphIdx.read().map(_.select("g", "g_b64", "firstBatch"))
      .getOrElse(spark.emptyDataFrame)

  private def graphDim(withG: DataFrame, batchId: Long): DataFrame =
    withG.select(col("g")).distinct()
      .withColumn("g_b64", base64(col("g").cast("binary")))
      .withColumn("firstBatch", lit(batchId))
      .withColumn("bucket", lit(0))

  /** Bootstrap-only: the initial full write of the graph dimension. */
  private def bootstrapGraphIndex(withG: DataFrame): Unit =
    graphIdx.commitFull(graphDim(withG, 0L), 0L)

  /** Per-batch insert-if-absent as a MOR delta: additions = graphs first
    * seen this batch (anti-joined against the accumulated index — a READ
    * of the small dimension, never a rewrite); tombstones = the same keys
    * (the coverage contract; they match nothing, being new). A batch with
    * no new graphs commits a metadata-only manifest (empty-delta skip). */
  private def appendGraphIndex(withG: DataFrame, batchId: Long): Unit = {
    val gs = graphDim(withG, batchId)
    val existing = graphIdx.read().map(_.select("g"))
      .getOrElse(sys.error("graph index missing: bootstrap first"))
    val fresh = gs.join(existing, Seq("g"), "left_anti").localCheckpoint()
    graphIdx.commitDelta(fresh, fresh.select("g", "bucket"), batchId)
  }

  // --- extraction front-end ------------------------------------------------

  /** pages -> canonicalized quad SET (set semantics, no attribution).
    * Canonicalization reads the PERSISTED map state extended with these
    * pages' IRIs (it does not persist) — so re-deriving the corpus through
    * this function reconciles exactly with incrementally accumulated state. */
  def extractedQuads(pages: Dataset[Page]): DataFrame =
    pageContributions(pages).drop("url", "bucket")
      .dropDuplicates(quadCols)

  /** Candidate entity IRIs of a quad batch: one scan, s and IRI-objects
    * exploded together (a union of two projections would extract twice). */
  private def candidateIris(quads: DataFrame): DataFrame =
    quads.select(explode(array(col("s"),
        when(col("oKind") === graft.model.TermKind.Iri, col("oLex")))).as("id"))
      .filter(col("id").isNotNull && col("id").startsWith("http://kg.example.org/"))
      .distinct()

  /** Extend the persisted canonical map with this batch's IRIs.
    *
    * Returns (view, viewRows, remapped, changed):
    *  - `view`    = the EXTENDED map restricted to (a superset of) the
    *    batch's candidate IRIs — everything the batch rewrite can match.
    *    Churn-sized at ANY accumulated map size, so the rewrite join
    *    stays a BROADCAST at target scale (the old path handed the full
    *    map to the rewrite and fell back to a store-sized shuffle join
    *    the moment the map outgrew broadcastRowLimit — i.e. at billions
    *    of IRIs, every batch).
    *  - `changed` = exactly the rows that differ from the stored map
    *    (fresh ids + members of clusters a new edge touched) — the canon
    *    store's merge-on-read delta. At bootstrap (empty store) it is the
    *    whole new map.
    *  - `remapped` = (oldRep -> newRep) pairs for superseded
    *    representatives, derived from `changed` (rep changes are a subset
    *    of changed ids), so the comparison join is churn-sized.
    *
    * The stored-map reads are TWO-TIER pruned, mirroring the contrib
    * remap scan: (1) when the batch's IRI set is driver-collectable, the
    * canon store's per-bucket TermBloom sidecars prune which buckets are
    * read at all ([[SnapshotStore.candidateBuckets]]); (2) a broadcast
    * Bloom filter over the batch IRIs, probed by the codegen'd
    * BloomProbe predicate INSIDE the scan, prunes rows — the result
    * (`oldPruned`) is ~batch-sized. Both tiers are conservative
    * (sidecars never exclude a term's true bucket; the bloom has no
    * false negatives), so the fresh-id anti-join against `oldPruned` is
    * EXACT — completeness additionally needs only the store-map
    * invariant that every canonical value is also an id row, which every
    * map this pipeline writes satisfies (see extendChangedGivenFresh).
    * False positives only widen `view`/`oldPruned` by harmless rows that
    * match nothing in the batch. */
  private[graft] def extendedCanonMap(rawQuads: DataFrame)
      : (DataFrame, Long, DataFrame, DataFrame) = {
    import spark.implicits._
    val iris = timed("canon.iris")(candidateIris(rawQuads).localCheckpoint())
    val old = canon.read()
    old match {
      case None =>
        val cm = timed("canonicalMap")(
          IriCanonicalizer.canonicalMap(spark, iris).localCheckpoint())
        lastCanonBuckets = None
        (cm, cm.count(), cm.limit(0), cm)
      case Some(full) =>
        val o0 = full.select("id", "canonical")
        // Persisted signatures (`sig` column, written by every canon
        // commit): a LAZY narrow (id, sig) view of the same fold, only
        // evaluated when the batch brings fresh ids — it routes
        // extendChangedGivenFresh through verifiedPairsStored, so no
        // shingle/signature pass over the accumulated domain ever runs
        // per batch. Stores written before the column existed fall back
        // to the recompute path (None).
        val storedSigs: Option[DataFrame] =
          if (full.columns.contains("sig")) Some(full.select("id", "sig")) else None
        lastCanonHasSig = storedSigs.isDefined
        // Small stores: checkpoint the folded map once — the domain union,
        // the touched-cluster splits and the remap join all scan it, and
        // each lazy scan re-runs the merge-on-read fold. Past the byte
        // gate the scans go to the store lazily: a per-batch O(map)
        // materialization is exactly the cost this path exists to shed.
        val o = if (canon.approxDataBytes <= canonCheckpointBytes)
          timed("canon.readOld")(o0.localCheckpoint()) else o0
        val nIris = iris.count()
        // tier 1 — sidecar bucket pruning (collect gate mirrors the remap
        // scan's: 100k strings ≈ a few MB on the driver)
        val oldView: DataFrame =
          if (nIris <= canonProbeLimit) {
            canon.candidateBuckets(iris.as[String].collect().toSeq) match {
              case Some(bs) =>
                lastCanonBuckets = Some(bs)
                canon.readBuckets(bs).map(_.select("id", "canonical"))
                  .getOrElse(o.limit(0))
              case None => lastCanonBuckets = None; o
            }
          } else { lastCanonBuckets = None; o }
        // tier 2 — bloom row pruning inside the scan (codegen predicate)
        val irisBloom = spark.sparkContext.broadcast(
          graft.functions.BloomProbe.build(
            iris.select(xxhash64(col("id"))), nIris, factsPruneBloomMaxBits))
        val oldPruned = timed("canon.oldPruned")(
          oldView.filter(graft.functions.BloomProbe(irisBloom, xxhash64(col("id"))))
            .localCheckpoint())
        irisBloom.unpersist()
        val fresh = iris.join(oldPruned.select("id"), Seq("id"), "left_anti")
          .localCheckpoint()
        val changed = timed("canonicalMap")(
          (if (fresh.isEmpty) o.limit(0)
           else IriCanonicalizer.extendChangedGivenFresh(spark, o, fresh,
             storedSigs = storedSigs))
            .localCheckpoint())
        // rewrite view: pruned old rows minus the ones `changed` replaces,
        // plus the changed rows the batch can actually reference
        val view = timed("canon.view")(
          oldPruned.join(changed.select("id"), Seq("id"), "left_anti")
            .unionByName(changed.join(iris, Seq("id"), "left_semi"))
            .localCheckpoint())
        val remapped = o
          .join(changed.withColumnRenamed("canonical", "rep2"), Seq("id"))
          .filter(col("canonical") =!= col("rep2"))
          .select(col("canonical").as("id"), col("rep2").as("canonical"))
          .distinct()
        (view, view.count(), remapped, changed)
    }
  }

  /** Canon-map probe gate (same rationale and size as
    * [[remapIdProbeLimit]]): above this many batch IRIs the sidecar
    * bucket-prune skips the driver collect and tier 2 alone prunes. */
  private val canonProbeLimit: Long = 100000L

  /** Byte gate under which the folded canon map is still materialized once
    * per batch (several consumers, and at small sizes the checkpoint costs
    * the same as ONE fold scan). Past it the consumers re-scan the store
    * lazily — narrow columnar reads — because a per-batch O(map) block-
    * store materialization is the unbounded cost this path removes. */
  private val canonCheckpointBytes: Long = 256L << 20

  /** Buckets the last canon-map prune planned (None = full read or empty
    * store) — observable plan-shape evidence for specs/benchmarks. */
  @volatile private[graft] var lastCanonBuckets: Option[Seq[Int]] = None

  /** Whether the last canon-map read carried persisted signatures. Gates
    * the incremental delta's sig attachment: a pre-sig store (written by
    * an older binary) stays consistently sig-less — the read-side fold
    * would drop a mixed-in column anyway (common-schema projection), so
    * writing it would only burn kernel time and delta bytes forever.
    * Migration is the next bootstrap/epoch reset, which always signs. */
  @volatile private var lastCanonHasSig: Boolean = true

  /** Exact per-page contributions: quads tagged with the url that supports
    * them (a quad may appear under many urls; support = distinct urls).
    * Uses the fused shuffle-free extractor (see RowwiseExtractor scaladoc);
    * the modular MentionDetector/EntityLinker path computes identical quads
    * (verified by ExtractorEquivalenceSpec). Pure — does not advance state. */
  def pageContributions(pages: Dataset[Page]): DataFrame = {
    // NOT cached: extraction is a narrow, CPU-bound, re-runnable pass; RAM-
    // caching 10^6+ deserialized rows costs more (alloc + GC bandwidth) than
    // recomputing, and at real scale caching the corpus is impossible anyway.
    val quads = graft.extract.TypedExtractor.pageQuads(pages.toDF())
    val out =
      if (!canonicalize) quads
      else {
        val (view, viewRows, _, _) = extendedCanonMap(quads)
        rewriteIfNonTrivial(quads, view, viewRows)
      }
    out.withColumn("bucket", contrib.bucketCol(col("url")))
  }

  /** identity view -> skip the rewrite joins AND the per-page re-dedup.
    * `view` is the batch-restricted rewrite view from [[extendedCanonMap]]
    * (checkpointed, churn-sized), so both the triviality check and the
    * broadcast gate read the PRUNED size — at target scale the full map is
    * billions of rows (see IriCanonicalizer.broadcastRowLimit) but the
    * view stays batch-sized and the rewrite stays a broadcast join. */
  private def rewriteIfNonTrivial(quads: DataFrame, view: DataFrame,
                                  viewRows: Long): DataFrame = {
    val nonTrivial = viewRows > 0 &&
      !view.filter(col("id") =!= col("canonical")).isEmpty
    // every caller feeds extraction output (url-grouped within partitions),
    // so the broadcast path deduplicates with the narrow streaming pass
    if (nonTrivial) IriCanonicalizer.canonicalizeAttributed(quads, view, viewRows,
      urlGrouped = true)
    else quads
  }

  /** Raw extraction for one batch — deliberately LAZY (re-evaluated by each
    * consumer: IRI distinct, delta aggregation, store merge). Measured on
    * this box: the typed extractor is pure compute and SCALES with cores,
    * while materializing its output to scratch parquet costs a multi-GB
    * write + re-reads on the one resource that does NOT scale here
    * (concurrent file IO). Recomputing is the cheaper, scale-correct side
    * of that trade; at 100 TB a RAM/disk cache of the corpus is impossible
    * regardless. */
  private def rawQuads(pages: Dataset[Page]): DataFrame =
    graft.extract.TypedExtractor.pageQuads(pages.toDF())

  // --- batches ---------------------------------------------------------------

  /** Bootstrap dump (reference lifecycle 3.1): full extraction, all '+',
    * checkpoint serial 00000000000000-style ts.
    *
    * One-pass materialization discipline: extraction is evaluated exactly
    * once into the contrib store; every downstream consumer reads committed
    * parquet back (columnar, splittable) instead of a RAM cache — at bench
    * scale the deserialized-row cache was the memory-bandwidth bottleneck,
    * and at target scale caching the corpus is impossible regardless. */
  def bootstrap(pages: Dataset[Page], epoch: String, checkpoint: String): BatchResult = {
    val startedAtMs = System.currentTimeMillis()
    contrib.reset(); facts.reset(); canon.reset(); graphIdx.reset()
    if (hfs.exists(markerPath)) hfs.delete(markerPath, false)
    // A4 (vql_check_trx, dump_nquads.sql:75-78, 98-143): fingerprint the
    // input snapshot at the START of the dump; re-checked before the
    // completion trailer — a drifting source (concurrent inserts/deletes
    // during the multi-pass dump) invalidates the dump loudly. The
    // fingerprint COMPLETES before any extraction job is submitted: were it
    // concurrent, drift landing during the fingerprint scan could be seen
    // by both fp0 and the end-of-dump re-check while extraction had already
    // read pre-drift rows — a torn snapshot would pass. The reference's
    // vql_check_trx window covers the whole dump with no such blind spot;
    // the small serial column-pruned scan is the price of that guarantee.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = sinkEc
    val fp0 = timed("bootstrap.fingerprint")(snapshotFingerprint(pages))
    val raw = rawQuads(pages)
    val contribData =
      if (!canonicalize) raw
      else {
        // empty store: `changed` IS the whole new map (and equals the view).
        // `sig` is persisted at write time (a deterministic function of the
        // id string) so no later batch ever recomputes signatures over the
        // accumulated domain — see extendedCanonMap / verifiedPairsStored.
        val (view, viewRows, _, changed) = extendedCanonMap(raw)
        canon.commitFull(IriCanonicalizer.withSignatures(changed)
          .withColumn("bucket", canon.bucketCol(col("id"))), 0L)
        rewriteIfNonTrivial(raw, view, viewRows)
      }
    timed("bootstrap.commitContrib") {
      // sidecar DEFERRED: its build (one column-pruned re-read of the just
      // written parquet) is independent of the facts aggregation below, so
      // it runs as an overlapped future instead of serializing the chain;
      // absent-sidecar windows are the safe conservative fallback.
      contrib.commitFull(contribData.withColumn("bucket", contrib.bucketCol(col("url"))), 0L,
        deferSidecar = true)
      contrib.setEpoch(epoch)
    }
    val fContribSidecar = Future(timed("bootstrap.contribSidecar") {
      contrib.buildSidecarForLatest()
    })
    val cBack = contrib.read().get
    timed("bootstrap.commitFacts") {
      facts.commitFull(supportCounts(cBack), 0L, assumePartitioned = true)
      facts.setEpoch(epoch)
    }
    // Patches dump from the COMMITTED facts parquet (cheap columnar scans —
    // measured: sourcing it from the `supports` plan re-ran the whole
    // support aggregation once per PatchWriter pass), overlapped with the
    // graph-index commit: independent sinks, different directories, so one
    // sink's serialized write syscalls run under the other's compute
    // (sequential phases left the other cores idle during each write — the
    // measured scaling residual in BENCH.md §Scaling).
    val sBack = facts.read().get
    val patches = sBack.select((lit("+").as("op") +: quadCols.map(col)): _*)
    val fFiles = Future(timed("bootstrap.patchFiles") {
      PatchWriter.write(spark, patches, s"$root/patches/batch_0", checkpoint, maxq)
    })
    val fIdx = Future(bootstrapGraphIndex(sBack))
    // A4: the fingerprint re-check and the metadata count are independent
    // read-only jobs over inputs the sinks never touch — submit them WITH
    // the sinks (two more overlapped small jobs) but AWAIT them before the
    // trailer below, which is the externally visible completion artifact
    // (dump_nquads.sql:75-78 invalidates before declaring complete). A
    // torn snapshot still raises while the trailer and lineage are absent;
    // the store commits above are internal state a re-run overwrites.
    val fAdded = Future(timed("bootstrap.addedCount")(sBack.count())) // parquet metadata count
    val fRecheck = Future(timed("bootstrap.recheckFp")(assertSnapshotStable(pages, fp0)))
    val (rFiles, rIdx, rAdded, rRecheck, rSidecar) =
      (scala.util.Try(Await.result(fFiles, Duration.Inf)),
        scala.util.Try(Await.result(fIdx, Duration.Inf)),
        scala.util.Try(Await.result(fAdded, Duration.Inf)),
        scala.util.Try(Await.result(fRecheck, Duration.Inf)),
        scala.util.Try(Await.result(fContribSidecar, Duration.Inf)))
    Seq(rRecheck, rFiles, rIdx, rAdded, rSidecar)
      .collectFirst { case scala.util.Failure(e) => throw e }
    val files = rFiles.get
    val added = rAdded.get
    // dump-report trailer file (dump_nquads.sql:58-83 / sample fixture)
    val isoNow = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    PatchWriter.writeDumpReport(spark, s"$root/patches/batch_0", checkpoint,
      started = isoNow.format(java.time.Instant.ofEpochMilli(startedAtMs)),
      completed = isoNow.format(java.time.Instant.now()),
      quadCount = added, fileCount = files)
    timed("bootstrap.lineage")(writeLineage(epoch, 0L, pages, added, 0L, files))
    BatchResult(0L, added, 0L, files)
  }

  /** (count, order-independent xxhash64 signature) of a page snapshot —
    * cheap relative to extraction (one column-pruned pass). */
  private[graft] def snapshotFingerprint(pages: Dataset[Page]): (Long, Long) = {
    val r = pages.toDF().select("url", "warc_ts", "text")
      .agg(count(lit(1)), bit_xor(xxhash64(col("url"), col("warc_ts"), col("text"))))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** A4's actual safety net: the dump is only valid if the source it read
    * was immutable for the dump's whole duration. Mirrors the reference's
    * dump invalidation (dump_nquads.sql:75-78: a transaction count change
    * during the dump raises and scraps the dump). */
  private[graft] def assertSnapshotStable(pages: Dataset[Page], fp0: (Long, Long)): Unit = {
    val fp1 = snapshotFingerprint(pages)
    if (fp1 != fp0)
      sys.error(s"bootstrap dump INVALID: input snapshot changed during the " +
        s"dump (fingerprint $fp0 -> $fp1); re-run against an immutable snapshot " +
        s"(reference vql_check_trx invalidation, dump_nquads.sql:75-78)")
  }

  /** Incremental batch (lifecycle 3.2). `changed` = pages whose current
    * revision is new since the watermark (adds + updates); `deletedUrls` =
    * pages removed from the source. Work scales with |changed|+|deleted|
    * (+ the rare remap rewrite set when canonical clusters merge). */
  def incremental(batchId: Long, checkpoint: String,
                  changed: Dataset[Page], deletedUrls: Dataset[String]): BatchResult = {
    val epoch = contrib.epoch.getOrElse(sys.error("bootstrap first"))
    recoverPartialCommit()
    if (alreadyCommitted(batchId)) return BatchResult(batchId, 0, 0, 0) // idempotent re-run

    // CHANGED-page extraction materialized ONCE: both the canon IRI pass
    // and the contribution rewrite consume it, and lazily each re-ran the
    // extraction kernel. Unlike bootstrap (corpus-sized — deliberately
    // recomputed, see rawQuads), this is O(batch) rows in the block store,
    // the same bound as newSide below.
    val rawNew = timed("incr.rawNew")(rawQuads(changed).localCheckpoint())
    val (newContrib0, remapPairs) =
      if (!canonicalize)
        (rawNew, rawNew.limit(0).select(col("s").as("id"), col("s").as("canonical")))
      else {
        val (view, viewRows, remapped, canonChanged) = extendedCanonMap(rawNew)
        // STAGED, not committed: the extended map must move atomically with
        // the facts/contrib stores. A crash after an early canon commit but
        // before the batch marker would make the re-run derive remapPairs
        // against the already-extended map (empty remap set) — stored rows
        // under superseded representatives would silently never be
        // rewritten. Staging keeps canon.read() on the OLD snapshot until
        // the single marker-guarded finalize below flips all three.
        // MOR delta: only the CHANGED rows land (tombstones = their ids) —
        // the old stageFull rewrote the whole accumulated map per batch.
        timed("incr.canonStage")(
          canon.stageDelta(
            additions = (if (lastCanonHasSig)
                IriCanonicalizer.withSignatures(canonChanged) else canonChanged)
              .withColumn("bucket", canon.bucketCol(col("id"))),
            tombstones = canonChanged.select(col("id"))
              .withColumn("bucket", canon.bucketCol(col("id"))),
            id = batchId,
            tombstonesDistinct = true)) // one map row per id by construction
        (rewriteIfNonTrivial(rawNew, view, viewRows), remapped)
      }
    val newContrib = newContrib0.withColumn("bucket", contrib.bucketCol(col("url")))

    // remap flow: stored rows recorded under superseded representatives are
    // rewritten and their urls treated as touched — their -old/+new falls
    // out of the ordinary signed-delta machinery below. Cluster merges are
    // rare so the pair set is usually tiny, but it stays DISTRIBUTED: a
    // semi-join against it (auto-broadcast when small) instead of a driver
    // collect + isin literals, which one alias-heavy batch could blow up.
    // Only its count comes back to the driver. The scan is column-pruned
    // to (url, s, oKind, oLex).
    val remapPairsC = remapPairs.localCheckpoint()
    val nRemap = remapPairsC.count()
    val changedUrls = changed.toDF().select(col("url"))
    val remapUrls: DataFrame =
      if (nRemap == 0) changedUrls.limit(0)
      else {
        timed("incr.remapScan") {
          // BUCKET-PRUNED scan: the superseded representatives are a tiny
          // driver-known set (cluster merges are rare), so probe contrib's
          // per-bucket TermBloom sidecars and read only buckets that can
          // mention one — IO ∝ candidate buckets, not store size. Falls
          // back to the full read only when the remap set is too large to
          // collect (pathological) — bloom false positives already degrade
          // gracefully toward more buckets, never wrong rows.
          val storedOpt: Option[DataFrame] =
            if (nRemap <= remapIdProbeLimit) {
              val ids = remapPairsC.select("id").as[String].collect().toSeq
              contrib.candidateBuckets(ids) match {
                case Some(bs) => lastRemapBuckets = Some(bs); contrib.readBuckets(bs)
                case None     => lastRemapBuckets = None; contrib.read()
              }
            } else { lastRemapBuckets = None; contrib.read() }
          storedOpt.fold(changedUrls.limit(0)) { stored =>
            val byS = stored
              .join(remapPairsC.select(col("id").as("s")), Seq("s"), "left_semi")
              .select(col("url"))
            val byO = stored
              .filter(col("oKind") === graft.model.TermKind.Iri)
              .join(remapPairsC.select(col("id").as("oLex")), Seq("oLex"), "left_semi")
              .select(col("url"))
            byS.union(byO).distinct()
              .join(changedUrls, Seq("url"), "left_anti") // changed pages re-extract anyway
              .join(deletedUrls.toDF("url"), Seq("url"), "left_anti")
              .localCheckpoint()
          }
        }
      }

    val touchedUrls = changedUrls
      .union(deletedUrls.toDF("url")).union(remapUrls).distinct()
      .withColumn("bucket", contrib.bucketCol(col("url"))).cache()
    // ONE action yields both the bucket list and the url count the
    // two-tier prune gate needs below (these were two separate jobs; the
    // driver receives <= numBuckets rows either way)
    val urlBucketCounts = timed("incr.affectedBuckets") {
      touchedUrls.groupBy("bucket").agg(count(lit(1)).as("n"))
        .as[(Int, Long)].collect()
    }
    val affectedBuckets = urlBucketCounts.map(_._1).toSeq.sorted

    val oldInBuckets = contrib.readBuckets(affectedBuckets)
      .getOrElse(spark.emptyDataFrame)
    // On a REMAP batch the touched-old rows feed TWO consumers (the signed
    // delta and the remap rewrite), and each lazy consumption re-ran the
    // bucket-pruned merge-on-read fold over the store. Checkpoint the
    // CHURN-SIZED semi-join result once (O(touched urls' rows), never
    // O(store)) and derive both from it — one fold scan per batch. On the
    // common no-remap batch there is exactly one consumer, so no
    // materialization is added.
    //
    // The url restriction is TWO-TIER, cliff-free in both directions.
    // Small churn (the common batch): an EXPLICITLY broadcast-hinted exact
    // semi join — the hint matters, because Spark's own size estimate for
    // the cached url set crosses the 10 MB auto-broadcast line long before
    // the broadcast is actually a hazard, and the silent fallback
    // sort-merge-joined the ENTIRE store scan. Large churn: a bloom
    // PRE-filter (O(bits) broadcast, one extra small build job — which is
    // why it is not tier one: at the common batch size the build's fixed
    // job latency exceeds what it saves) followed by the exact semi,
    // unhinted — post-prune the store side is ~churn-sized, so whatever
    // strategy Spark picks moves ~churn rows, never the store. The bloom
    // alone can never replace this join: a false positive would put an
    // untouched url's rows on the -1 side of the signed delta with no +1
    // partner — a fabricated deletion.
    val nTouched = urlBucketCounts.map(_._2).sum // from the affectedBuckets job
    val urlBloom =
      if (nTouched <= urlBroadcastKeyLimit || oldInBuckets.columns.isEmpty) None
      else Some(spark.sparkContext.broadcast(
        graft.functions.BloomProbe.build(
          touchedUrls.select(xxhash64(col("url"))), nTouched,
          factsPruneBloomMaxBits)))
    val oldContrib =
      if (oldInBuckets.columns.isEmpty) newContrib.limit(0)
      else {
        val urls = touchedUrls.select("url")
        val touched = urlBloom match {
          case None => oldInBuckets.join(broadcast(urls), Seq("url"), "left_semi")
          case Some(b) => oldInBuckets
            .filter(graft.functions.BloomProbe(b, xxhash64(col("url"))))
            .join(urls, Seq("url"), "left_semi")
        }
        if (nRemap == 0) touched
        else timed("incr.oldTouched")(touched.localCheckpoint())
      }

    // rewritten state of remap-affected urls = their stored rows passed
    // through the (oldRep -> newRep) map. remapUrls ⊆ touchedUrls, so the
    // checkpointed oldContrib already holds these rows.
    val rewrittenOld =
      if (nRemap == 0) newContrib.limit(0)
      else IriCanonicalizer.canonicalizeAttributed(
          oldContrib.join(remapUrls, Seq("url"), "left_semi").drop("bucket"),
          remapPairsC, nRemap)
        .withColumn("bucket", contrib.bucketCol(col("url")))
    // Materialize the batch's new contributions ONCE: both the signed delta
    // and the contrib merge consume them, and lazily each consumer re-ran
    // the changed-page extraction + canonical rewrite (measured ~2x the
    // batch's extraction compute — the 8-core level pays it serially while
    // 32 cores hide it under the concurrent sink writes, i.e. pure ratio
    // padding). O(batch) rows in the block store, never O(corpus) — the
    // corpus-sized materialization stays parquet-backed by design.
    val newSide = timed("incr.newSide") {
      newContrib.unionByName(rewrittenOld).localCheckpoint()
    }

    // signed support delta per quad from the touched pages only. ONE
    // quad-key aggregation: contrib rows are distinct per (url, quad) by
    // construction, so summing ±1 directly per quad equals
    // support_new - support_old — the earlier per-(url, quad) pre-stage
    // computed the same net and cost a second full shuffle of the
    // churn-sized union for nothing (map-side partial combine already
    // collapses each side's contribution per quad).
    val d = oldContrib.select(quadKey: _*).withColumn("w", lit(-1L))
      .unionByName(newSide.select(quadKey: _*).withColumn("w", lit(1L)))
      .groupBy(quadKey: _*)
      .agg(sum("w").as("d"))
      .filter(col("d") =!= 0L)
      .withColumn("bucket", facts.bucketCol(quadKey: _*))
    val dC = timed("incr.delta") {
      d.localCheckpoint() // small net-delta set; cuts the extraction lineage
    }
    urlBloom.foreach(_.unpersist()) // oldContrib consumers are materialized

    // one action for the bucket list AND the churn count the prune-tier
    // gate reads below (was two jobs over the same checkpointed delta)
    val deltaBucketCounts = timed("incr.factBuckets") {
      dC.groupBy("bucket").agg(count(lit(1)).as("n")).as[(Int, Long)].collect()
    }
    val factBuckets = deltaBucketCounts.map(_._1).toSeq.sorted
    // PRUNE the old-facts side to the changed quads before the transition
    // join: unchanged rows contribute no patch and no new state, and under
    // merge-on-read they are carried forward by the base, untouched. The
    // prune is TWO-TIER on the churn's xxhash64 quad keys, and BOTH tiers
    // are a narrow pass over the store — no store-sized exchange exists at
    // any churn size:
    //
    //  - small churn (the common batch): exact semi against the EXPLICITLY
    //    broadcast 8-byte key set. Byte-safe under the gate (~32 B/key
    //    resident), and cheaper than tier two because it adds no build job.
    //  - large churn: a broadcast BLOOM FILTER probed by a codegen'd
    //    predicate inside the scan's whole-stage span — no join at all.
    //    10 bits/key (4M keys ≈ 5 MB vs ~128 MB hashed), capped at 64 MB =
    //    53M keys at ~1% FPR; past the cap it saturates GRACEFULLY (FPR
    //    rises, the pruned set widens, nothing shuffles, nothing breaks).
    //
    // The predecessor's single gate fell back to a shuffle semi past its
    // byte bound — a cliff measured at +60s on a 40M-quad store the moment
    // churn crossed it (BENCH.md round 6). Bloom false positives (and hash
    // collisions, both tiers) are harmless by construction: the row passes
    // the prune, the transition join finds no delta partner, marks it
    // d-null, and supportTransitionDelta drops it from both patches and
    // additions — correctness never depends on the filter. The pruned
    // result is churn-sized; checkpoint it once so the transition join
    // (two churn-sized sides) feeds both the patch set and the delta
    // additions without re-running the scan per sink.
    val nDelta = deltaBucketCounts.map(_._2).sum // from the factBuckets job
    val pruneKeys: DataFrame => DataFrame =
      if (nDelta <= broadcastKeyLimit) {
        // small churn: exact broadcast semi on the 8-byte hash — cheaper
        // than a bloom build's extra job at this size, and byte-safe
        // (~32 B/key resident => <= 32 MB at the gate)
        val dKeysH = dC.select(xxhash64(quadKey: _*).as("_qh")).distinct()
        df => df.withColumn("_qh", xxhash64(quadKey: _*))
          .join(broadcast(dKeysH), Seq("_qh"), "left_semi")
          .drop("_qh")
      } else {
        // large churn: bloom probe inside the scan — O(bits) broadcast,
        // saturates gracefully, no plan-shape change at any size
        val churnBloom = spark.sparkContext.broadcast(
          graft.functions.BloomProbe.build(
            dC.select(xxhash64(quadKey: _*)), nDelta, factsPruneBloomMaxBits))
        df => df.filter(
          graft.functions.BloomProbe(churnBloom, xxhash64(quadKey: _*)))
      }
    val oldFacts = timed("incr.oldFactsScan") {
      pruneKeys(
        facts.readBuckets(factBuckets)
          .getOrElse(dC.limit(0).drop("d").withColumn("support", lit(0L)))
          .drop("bucket"))
        .localCheckpoint()
    }
    val (patches0, newFactRows) = QuadDiff.supportTransitionDelta(
      oldFacts, dC.drop("bucket"))
    val patchesC = patches0.localCheckpoint() // small; read by write + tally

    // The four sink writes below are INDEPENDENT jobs over already-
    // checkpointed/committed inputs and different directories — submitted
    // concurrently so the stage that is IO-bound (patch files) overlaps the
    // ones that are compute-bound (the contrib merge re-runs extraction).
    // On a single box the kernel serializes the final write syscalls, but
    // the compute under them proceeds in parallel (BENCH.md §Scaling
    // residual: sequential `timed` phases wasted the idle cores).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = sinkEc
    val fFiles = Future(timed("incr.patchFiles") {
      PatchWriter.write(spark, patchesC, s"$root/patches/batch_$batchId", checkpoint, maxq)
    })
    // new graphs can only arrive with '+' patches — patchesC is checkpointed
    // and tiny, so the index merge costs no extra extraction pass
    val fIdx = Future(appendGraphIndex(patchesC, batchId))
    // MERGE-ON-READ commits: O(batch) additions + tombstones, never a
    // store-sized rewrite (SnapshotStore folds on read; every `maxDeltas`
    // batches the chain folds into a fresh base). Tombstone coverage
    // contract holds by construction: every newFactRows quad is in dC, and
    // every newSide url is in touchedUrls.
    val fFacts = Future(timed("incr.mergeFacts") {
      facts.stageDelta(
        additions = newFactRows.withColumn("bucket", facts.bucketCol(quadKey: _*)),
        tombstones = dC.select((quadKey :+ col("bucket")): _*),
        id = batchId,
        tombstonesDistinct = true) // dC is a per-quad aggregation output
    })
    val fContrib = Future(timed("incr.mergeContrib") {
      contrib.stageDelta(
        additions = newSide.join(deletedUrls.toDF("url"), Seq("url"), "left_anti"),
        tombstones = touchedUrls,
        id = batchId,
        tombstonesDistinct = true) // touchedUrls is a union-distinct
    })
    // Await EVERY sink to settle before surfacing any failure: a rethrow
    // while sibling futures still run would let their zombie write jobs
    // race an immediate same-batchId retry's staging dirs and patch files.
    // Each Await below blocks until that future settles (success or
    // failure), so by the time the first failure is rethrown no sink job
    // from this attempt is still in flight.
    val rFiles = scala.util.Try(Await.result(fFiles, Duration.Inf))
    val rIdx = scala.util.Try(Await.result(fIdx, Duration.Inf))
    val rFacts = scala.util.Try(Await.result(fFacts, Duration.Inf))
    val rContrib = scala.util.Try(Await.result(fContrib, Duration.Inf))
    Seq(rFiles, rIdx, rFacts, rContrib)
      .collectFirst { case scala.util.Failure(e) => throw e }
    val files = rFiles.get

    // one job for both tallies (checkpointed patches)
    val tallies = timed("incr.tallies")(patchesC.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    val added = tallies.getOrElse("+", 0L)
    val deleted = tallies.getOrElse("-", 0L)
    // lineage BEFORE the marker: a crash before the marker recomputes the
    // batch (duplicate lineage rows are harmless — readers aggregate);
    // after the marker, recovery replays the pointer flips below.
    // The marker-guarded finalize flips ALL staged stores (canon included —
    // it moves atomically with the data it canonicalizes).
    timed("incr.lineage")(writeLineage(epoch, batchId, changed, added, deleted, files))
    writeCommitMarker(batchId)
    if (canonicalize) canon.finalizeCommit(batchId)
    facts.finalizeCommit(batchId)
    contrib.finalizeCommit(batchId)
    // expire snapshots the just-finalized commits unreferenced (folded
    // bases, superseded full rewrites) — disk stays O(live state), not
    // O(history). Single writer, everything finalized: safe window.
    Seq(canon, facts, contrib, graphIdx).foreach(_.vacuum())

    touchedUrls.unpersist()
    BatchResult(batchId, added, deleted, files)
  }

  /** Pool for concurrent sink-write job submission (Spark job submission is
    * thread-safe; local-mode tasks all run on the shared executor anyway —
    * this only overlaps the per-job driver-side planning + IO waits). */
  private lazy val sinkEc: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-sink"); t.setDaemon(true); t
      }))

  /** Step timing, printed when GRAFT_TIMING=1 (perf triage aid). */
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (sys.env.get("GRAFT_TIMING").contains("1"))
      println(f"[graft-timing] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  /** Quad-identity bucket key: the columns themselves — bucketCol hashes
    * them variadically (xxhash64(s,p,...)), never a concatenated string. */
  private def quadKey = quadCols.map(col)

  /** Bootstrap support counts with ONE corpus-sized exchange instead of
    * two. The aggregation's group key DETERMINES the facts-store bucket
    * (bucket = xxhash64(quad) % n), so a `groupBy(quad)` exchange followed
    * by the store's `repartition(bucket)` exchange shuffles the corpus
    * twice for one placement. Instead: partition ONCE by bucket (every
    * quad group lands whole in one partition), Tungsten-sort within the
    * partition, and count consecutive identical keys in a streaming typed
    * pass — O(one group) memory, and the external sort spills gracefully
    * at any bucket size (a per-bucket hash map would not). The output is
    * already placed for the store write (commitFull assumePartitioned).
    * Plan: 2 Exchange -> 1 on the bootstrap's biggest shuffle.
    *
    * support = count(1), NOT count_distinct(url): contrib rows are
    * distinct per (url, quad) BY CONSTRUCTION (per-page dedup in every
    * extractor path and after every canonical rewrite).
    * PipelineSpec asserts equality with the groupBy formulation, nulls
    * and empty strings included. */
  private[graft] def supportCounts(cBack: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val keyed = cBack.select(quadCols.map(col): _*)
      .withColumn("bucket", facts.bucketCol(quadKey: _*))
    val sorted = keyed
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(quadCols.map(col): _*)
    val outSchema = StructType(
      sorted.schema.fields.filter(_.name != "bucket") ++
        Seq(StructField("support", LongType, nullable = false),
          StructField("bucket", IntegerType, nullable = false)))
    val nKey = quadCols.length
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): org.apache.spark.sql.Row = {
          val head = buf.next()
          var support = 1L
          def sameKey(r: org.apache.spark.sql.Row): Boolean = {
            var i = 0
            while (i < nKey) {
              if (!java.util.Objects.equals(r.get(i), head.get(i))) return false
              i += 1
            }
            true
          }
          while (buf.hasNext && sameKey(buf.head)) { buf.next(); support += 1 }
          org.apache.spark.sql.Row.fromSeq(
            (0 until nKey).map(head.get) ++
              Seq[Any](support, head.getInt(nKey))) // NOT Seq(l, i): it widens the Int
        }
      }
    }(enc)
  }

  /** Remap-id collect gate: above this many superseded representatives the
    * remap scan skips the driver-side bloom probe and reads the full store
    * (collecting millions of IRI strings to the driver would be the real
    * scale hazard; the probe exists for the rare-but-recurring small-merge
    * case). 100k strings ≈ a few MB — safely collectable. */
  private val remapIdProbeLimit: Long = 100000L

  /** Buckets the last remap scan planned (None = full-store fallback or no
    * remap yet) — observable plan-shape evidence for specs/benchmarks. */
  @volatile private[graft] var lastRemapBuckets: Option[Seq[Int]] = None

  /** Tier boundary for the churn prunes: up to this many keys the exact
    * 8-byte-key broadcast semi is both byte-safe (~32 B/key resident =>
    * <= 32 MB hashed relation) and CHEAPER than a bloom (no extra build
    * job — measured ~1-2 s of fixed per-batch latency at the driver-bench
    * shape); above it the bloom path takes over. Crucially this is a
    * tier boundary between two safe plans, not a gate with a shuffle
    * fallback — there is no churn size at which the store scan gets
    * exchanged. */
  private val broadcastKeyLimit: Long = 1000000L

  /** Separate, lower tier boundary for the url-STRING keyed prune: the
    * 1M-key gate's "~32 B/key resident" sizing only holds for the 8-byte
    * hash tier — a url string is ~100-200 B plus hashed-relation overhead,
    * so 1M urls hinted into a broadcast is a few hundred MB forced past
    * Spark's own estimator. 200k urls ≈ 200k x ~250 B ≈ 50 MB resident —
    * byte-safe; above it the bloom pre-filter tier takes over (same
    * cliff-free two-tier shape, just a boundary matched to the key WIDTH). */
  private val urlBroadcastKeyLimit: Long = 200000L

  /** Bloom-tier cap, BYTE-derived like every other bound in the repo
    * (tombMax 64 MB file-gated, canon 5M rows): 2^29 bits = 64 MB of
    * broadcast — at ~10 bits/key that is 53M churn keys at ~1% FPR. This
    * is a SATURATION point, not a cliff: a bigger churn just raises the
    * false-positive rate (at 100M keys ≈ 5.4 bits/key the FPR is ~11% —
    * the prune still drops ~89% of unchanged rows), it never switches
    * plan shape. The predecessors both had cliffs: a broadcast hashed
    * key-set costs ~32 B/key resident, so any byte-sane gate caps at ~2M
    * keys, and past the gate the fallback shuffle semi-join dragged the
    * whole store scan through an exchange (measured +60 s on a 40M-quad
    * store at the 3.2M-page point, BENCH.md round 6). */
  private val factsPruneBloomMaxBits: Long = 1L << 29

  // --- commit marker / recovery ---------------------------------------------

  private def markerPath = new Path(root, "_commit")
  private def hfs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeCommitMarker(batchId: Long): Unit = {
    val tmp = new Path(root, s"_commit.tmp${System.nanoTime()}")
    val out = hfs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (hfs.exists(markerPath)) hfs.delete(markerPath, false)
    if (!hfs.rename(tmp, markerPath)) sys.error(s"marker rename failed for batch $batchId")
  }

  private def commitMarker: Option[Long] = {
    if (!hfs.exists(markerPath)) None
    else {
      val in = hfs.open(markerPath)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Replay pointer flips for a batch whose marker was written but whose
    * stores were not all finalized (crash between the flips). Canon is part
    * of the protocol: it stages with the batch and flips with it. The
    * marker proves single-writer ownership of the root, so any `_lease`
    * the crashed predecessor abandoned on a store being replayed is broken
    * here — a restarted driver (fresh writerId) must not be locked out of
    * its own store for the lease timeout. */
  def recoverPartialCommit(): Unit = commitMarker.foreach { m =>
    Seq(canon, facts, contrib).foreach { s =>
      if (s.isStagedNotFinal(m)) { s.breakLease(); s.finalizeCommit(m) }
    }
  }

  private def alreadyCommitted(batchId: Long): Boolean =
    facts.latest.exists(_ >= batchId) && contrib.latest.exists(_ >= batchId)

  // --- lineage / checkpoint --------------------------------------------------

  /** Per-bucket lineage rows (BASELINE.json: url range, warc_ts watermark,
    * quad counts per partition). */
  private def writeLineage(epoch: String, batchId: Long,
                           pages: Dataset[Page], added: Long, deleted: Long,
                           files: Long): Unit = {
    val perBucket = pages.toDF()
      .withColumn("bucket", contrib.bucketCol(col("url")))
      .groupBy("bucket")
      .agg(min("url").as("urlLo"), max("url").as("urlHi"),
        max("warc_ts").as("watermark"))
      .withColumn("epoch", lit(epoch))
      .withColumn("batchId", lit(batchId))
      .withColumn("added", lit(added))
      .withColumn("deleted", lit(deleted))
      .withColumn("files", lit(files))
      .withColumnRenamed("bucket", "partitionId")
    // compacted-append layout: one tiny file per batch would otherwise
    // accumulate forever and every watermark/prune read would list and
    // open thousands of files (the reference's counts files are O(1))
    graft.state.CompactedAppendTable.append(spark, lineageDir, perBucket)
  }

  def lineage: DataFrame =
    graft.state.CompactedAppendTable.read(spark, lineageDir)
      .getOrElse(sys.error(s"no lineage at $lineageDir"))

  def watermark: Option[java.sql.Timestamp] = {
    if (!graft.state.CompactedAppendTable.exists(spark, lineageDir)) return None
    val r = lineage.agg(max("watermark")).head()
    if (r.isNullAt(0)) None else Some(r.getTimestamp(0))
  }

  /** Current graph state as quads (for verification / reconciliation A7). */
  def currentQuads: DataFrame =
    facts.read().map(_.filter(col("support") > 0).select(quadCols.map(col): _*))
      .getOrElse(spark.emptyDataFrame)
}

final case class BatchResult(batchId: Long, added: Long, deleted: Long, files: Long)
