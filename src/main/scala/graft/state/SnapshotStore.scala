package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Iceberg-lite bucketed table with atomic snapshot commits, copy-on-write
  * full/bucket rewrites AND merge-on-read delta commits.
  *
  * No Iceberg jar ships in /opt/spark/jars, so we emulate the behaviors the
  * pipeline needs (SURVEY.md §7.3) behind this interface:
  *
  *  1. snapshot isolation / atomic visibility — data lands under
  *     `snap_<id>/bucket=<b>/`, then a manifest file and finally the
  *     `_latest` pointer are atomically renamed into place. Readers resolve
  *     `_latest` -> manifest -> per-bucket paths; a crashed writer leaves
  *     only unreferenced files. This replaces the reference's sham-file /
  *     skip-last visibility protocol (generate-rdfpatch.sh:54, 259-261).
  *  2. MERGE INTO — two physical strategies, as in a real lakehouse:
  *     copy-on-write ([[stageMerge]]: rewrite whole touched buckets) and
  *     merge-on-read ([[stageDelta]]: append O(batch) addition + tombstone
  *     files; readers fold the chain). MOR is what makes incremental
  *     batches O(batch): with a uniformly hash-bucketed key, ANY touched
  *     url set hits every bucket, so bucket-granularity COW degenerates to
  *     rewriting the entire store each batch — measured as over half the
  *     incremental wall time, and at 10^12-document scale simply
  *     impossible. Delta chains are bounded by `maxDeltas`: the commit
  *     that would exceed it folds the chain into a fresh full base
  *     (amortized O(store/maxDeltas) per batch).
  *  3. incremental reads — `readBuckets` loads (and folds) only named
  *     buckets; per-bucket parquet keeps min/max stats so pushed filters
  *     prune files.
  *
  * Delta-commit contract: a batch's tombstones must cover its own
  * additions' `deleteKeys` (the natural MERGE shape — you delete the old
  * versions of exactly the keys you rewrite). Under that contract the fold
  * is associative and implemented as ONE join: a row (tagged with its
  * writing snapshot) survives iff no strictly-later delta tombstones its
  * key.
  *
  * Rename is atomic on HDFS-like filesystems (and the local FS used here);
  * an object-store deployment would swap this class for a real catalog —
  * the pipeline only sees the trait-like API.
  *
  * The table is hash-bucketed by a caller-chosen key column:
  * `bucket = pmod(xxhash64(key), numBuckets)` — uniform by construction, so
  * no bucket-level skew regardless of key skew.
  *
  * Chain folds are BUCKET-LOCAL (Iceberg-style partial compaction): when
  * the chain bound trips, only buckets whose accumulated delta bytes
  * crossed `foldBucketBytes` are folded into a fresh base; the quiet
  * buckets' chain data — small by definition — is consolidated into ONE
  * bucket-scoped delta, so the chain bound holds without rewriting store
  * bytes that barely changed. The old behavior (full fold-to-base every
  * `maxDeltas` batches) paid an O(store) rewrite regardless of churn —
  * amortized O(store/maxDeltas) per batch, the exact write-amplification
  * shape MOR was introduced to kill.
  *
  * @param deleteKeys columns identifying rows for MOR tombstones (empty =
  *                   store is COW-only; stageDelta refuses)
  * @param maxDeltas  delta-chain length that triggers a (partial) fold
  * @param foldBucketBytes per-bucket accumulated-delta-byte threshold above
  *                   which a fold event rewrites that bucket's base (0 =
  *                   always fold every data-bearing bucket, the old full
  *                   fold). Deployment guidance: set proportional to the
  *                   acceptable write amplification — a base bucket of B
  *                   bytes is rewritten only after >= foldBucketBytes of
  *                   delta volume accumulates in it.
  * @param termExpr   optional ARRAY column (over the store schema) whose
  *                   non-null elements are the "terms" of a row. When set,
  *                   every data write records a per-bucket [[TermBloom]]
  *                   sidecar, and [[candidateBuckets]] answers "which
  *                   buckets can contain rows mentioning term X?" without
  *                   touching data — the index behind bucket-pruned point
  *                   lookups (the pipeline's remap scan).
  * @param tombBroadcastBytes on-disk tombstone size up to which the read
  *                   fold broadcasts the tombstone side outright (one
  *                   narrow pass); past it the fold bloom-splits the row
  *                   stream instead of shuffling it (see [[assemble]]).
  *                   Exposed mainly so specs can force the bloom path.
  */
final class SnapshotStore(spark: SparkSession, root: String, val numBuckets: Int,
                          val deleteKeys: Seq[String] = Seq.empty,
                          val maxDeltas: Int = 4,
                          val foldBucketBytes: Long = 8L << 20,
                          val termExpr: Option[org.apache.spark.sql.Column] = None,
                          val tombBroadcastBytes: Long = 64L << 20) {

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

  /** Step timing, printed when GRAFT_TIMING=1 (perf triage aid). */
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (sys.env.get("GRAFT_TIMING").contains("1"))
      println(f"[graft-timing]   store.$label%-29s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  // --- single-writer lease (guard rail, not a distributed lock) ------------

  /** This instance's writer identity for the `_lease` guard. */
  val writerId: String = java.util.UUID.randomUUID().toString

  /** Foreign leases older than this are presumed crashed and taken over. */
  val leaseTimeoutMs: Long = 30L * 60 * 1000

  private def leasePath = new Path(root, "_lease")

  private def readLease: Option[String] = {
    if (!fs.exists(leasePath)) None
    else {
      val in = fs.open(leasePath)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim)
      catch { case _: java.io.IOException => None }
      finally in.close()
    }
  }

  /** Claim the writer lease for a mutating data operation. The store
    * assumes a SINGLE writer (vacuum, fold and manifest writes are not
    * concurrency-safe); this makes a second concurrent writer FAIL LOUDLY
    * instead of silently corrupting manifests. The claim itself is ATOMIC:
    * `fs.create(path, overwrite=false)` lets the filesystem arbitrate
    * racing claimants (exactly one create succeeds on HDFS-like and local
    * filesystems) — the previous check-then-write had a window where two
    * sanely-interleaved writers could both conclude the lease was free.
    * A lease left by a crashed writer expires after [[leaseTimeoutMs]]
    * (or [[breakLease]] forces it). Re-claiming one's own lease always
    * succeeds, so a retry after a failed stage is never blocked. */
  /** Atomic create-exclusive of the lease file. On `file:` schemes Hadoop's
    * `create(path, overwrite=false)` is itself check-then-act (racing
    * creators can all pass the exists probe — the StoreSpec race test
    * catches exactly this), so the local path goes through the OS-level
    * O_CREAT|O_EXCL via `Files.createFile`; HDFS-like schemes keep
    * `fs.create`, whose namenode arbitration is atomic. The writerId body
    * lands right after the claim — a reader in that window sees an empty
    * holder, which is treated as a foreign in-progress claim (safe). */
  private def atomicCreateLease(): Boolean = {
    if ("file".equalsIgnoreCase(Option(fs.getUri.getScheme).getOrElse("file"))) {
      try {
        val p = java.nio.file.Paths.get(leasePath.toUri.getPath)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.createFile(p) // O_CREAT|O_EXCL
        java.nio.file.Files.write(p, writerId.getBytes(StandardCharsets.UTF_8))
        true
      } catch { case _: java.io.IOException => false } // incl. FileAlreadyExists
    } else {
      try {
        val out = fs.create(leasePath, false) // atomic on HDFS-like schemes
        try out.write(writerId.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  private[state] def claimLease(): Unit = {
    var attempts = 0
    while (true) {
      attempts += 1
      if (atomicCreateLease()) return
      // lease file exists (or a transient FS failure): inspect the holder
      readLease match {
        case Some(holder) if holder == writerId => return // ours (retry path)
        case Some(holder) =>
          val age = try {
            System.currentTimeMillis() - fs.getFileStatus(leasePath).getModificationTime
          } catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry
          if (age < leaseTimeoutMs)
            sys.error(s"concurrent writer on $root: lease held by $holder " +
              s"(age ${age / 1000}s < ${leaseTimeoutMs / 1000}s). A second " +
              "writer would corrupt manifests; if the holder crashed, wait out " +
              "the lease or call breakLease() after verifying it is dead.")
          // stale: presumed crashed — remove and retry the ATOMIC claim (a
          // racing taker also deleting is fine; create arbitrates the winner)
          fs.delete(leasePath, false)
        case None => // disappeared between create and read — retry the claim
      }
      if (attempts > 5) sys.error(s"lease-claim livelock on $root (attempts=$attempts)")
    }
  }

  /** Release the lease if this writer holds it (stage completion). */
  private[state] def releaseLease(): Unit =
    if (readLease.contains(writerId)) fs.delete(leasePath, false)

  /** Run `body` under the writer lease, releasing it even when a Spark job
    * inside fails — a thrown stage previously left `_lease` behind, and a
    * RESTARTED driver (fresh writerId) was locked out for up to
    * [[leaseTimeoutMs]] by its own predecessor's abandoned lease. */
  private def withLease[T](body: => T): T = {
    claimLease()
    try body finally releaseLease()
  }

  /** Operator override: force-remove the lease of a verified-dead writer. */
  def breakLease(): Unit = if (fs.exists(leasePath)) fs.delete(leasePath, false)

  /** Bucket id from one or more key columns. xxhash64 is variadic — hashing
    * the columns directly avoids materializing a concatenated key string per
    * row (the row/string allocation the 8->32 scaling profile blamed). */
  def bucketCol(keys: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    pmod(xxhash64(keys: _*), lit(numBuckets)).cast("int")

  // --- pointer / manifest ------------------------------------------------

  def latest: Option[Long] = {
    val p = new Path(root, "_latest")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writeAtomic(path: Path, content: String): Unit = {
    val tmp = new Path(path.getParent, path.getName + ".tmp" + System.nanoTime())
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path)) sys.error(s"atomic rename failed: $tmp -> $path")
  }

  private def manifestPath(id: Long) = new Path(root, f"manifest_$id%014d.txt")

  import SnapshotStore.DeltaRef

  /** Manifest: one `bucket<TAB>path` line per base bucket, plus zero or
    * more ordered delta lines — `D<TAB>tag<TAB>dir<TAB>scope` (scope `*`
    * = all buckets, else comma-separated bucket ids). The legacy 2-field
    * form `D<TAB>snapId` (dir derived from the id, unscoped) still reads. */
  private def readManifest(id: Long): (Map[Int, String], Seq[DeltaRef]) = {
    val in = fs.open(manifestPath(id))
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8) finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val base = lines.filterNot(_.startsWith("D\t")).map { l =>
      val Array(b, p) = l.split("\t", 2); b.toInt -> p
    }.toMap
    val deltas = lines.filter(_.startsWith("D\t")).map { l =>
      // split with -1: String.split's default drops TRAILING empty fields,
      // so a 4-field delta line with an empty scope would silently parse
      // as the 3-field shape (see the write-side require in manifestText)
      l.split("\t", -1) match {
        case Array(_, t) =>
          val tag = t.trim.toLong
          DeltaRef(tag, s"$root/${f"snap_$tag%014d"}", None)
        case Array(_, t, dir, scope) =>
          if (scope.trim.isEmpty)
            sys.error(s"bad manifest delta line (empty scope): $l")
          DeltaRef(t.trim.toLong, dir,
            if (scope.trim == "*") None
            else Some(scope.split(",").iterator.map(_.trim).filter(_.nonEmpty)
              .map(_.toInt).toSet))
        case other => sys.error(s"bad manifest delta line: ${other.mkString("\t")}")
      }
    }.toSeq
    (base, deltas)
  }

  private def manifestText(base: Map[Int, String], deltas: Seq[DeltaRef]): String =
    ((0 until numBuckets).map(b => s"$b\t${base.getOrElse(b, "")}") ++
      deltas.map { d =>
        // a Some(empty) scope would serialize as a trailing empty field —
        // unparseable (and semantically a no-op delta no caller produces)
        require(d.scope.forall(_.nonEmpty),
          s"delta ref with empty scope set: tag=${d.tag} dir=${d.dir}")
        s"D\t${d.tag}\t${d.dir}\t" + d.scope.fold("*")(_.toSeq.sorted.mkString(","))
      }).mkString("\n")

  // --- commits -------------------------------------------------------------

  /** Full (bootstrap) commit: writes every bucket. `df` must already carry
    * an int `bucket` column. `deferSidecar = true` skips the term-bloom
    * sidecar build (one extra column-pruned read of the written data) —
    * the caller overlaps it with other work via [[buildSidecarForLatest]];
    * an absent sidecar is always the safe conservative fallback
    * (candidateBuckets includes the whole dir), so a crash in the window
    * costs pruning, never correctness. */
  def commitFull(df: DataFrame, id: Long, deferSidecar: Boolean = false,
                 assumePartitioned: Boolean = false): Unit = {
    stageFull(df, id, deferSidecar, assumePartitioned)
    finalizeCommit(id)
  }

  /** Stage a full snapshot: data + manifest land on disk but `_latest` is
    * NOT flipped — readers still see the previous snapshot. A coordinator
    * that writes several stores atomically stages each, writes its own
    * commit marker, then [[finalizeCommit]]s all of them; a crash in
    * between is repaired by replaying the finalize (metadata-only).
    *
    * `assumePartitioned = true` skips the bucket exchange: the caller
    * asserts `df` is ALREADY partitioned such that each physical partition
    * holds complete bucket values (e.g. it was repartitioned by an
    * expression the bucket is a function of — the pipeline's support
    * aggregation). The `partitionBy` writer splits dirs correctly either
    * way; skipping the exchange just avoids re-shuffling a store-sized
    * stream that is already where it needs to be (guide §2.4: two
    * operations keyed the same way share one exchange). */
  def stageFull(df: DataFrame, id: Long, deferSidecar: Boolean = false,
                assumePartitioned: Boolean = false): Unit = withLease {
    val dataDir = new Path(root, f"snap_$id%014d").toString
    val placed = if (assumePartitioned) df else df.repartition(numBuckets, col("bucket"))
    timed("full.write")(placed
      .write.mode("overwrite").partitionBy("bucket").parquet(dataDir))
    if (!deferSidecar) timed("full.sidecar")(writeTermSidecar(dataDir, dataDir))
    val base = (0 until numBuckets).map(b => b -> s"$dataDir/bucket=$b").toMap
    writeAtomic(manifestPath(id), manifestText(base, Seq.empty))
  }

  /** Build the term-bloom sidecars for the LATEST snapshot's base dirs —
    * the deferred half of `commitFull(deferSidecar = true)`. Idempotent
    * (rewrites the sidecar from the committed parquet); safe after the
    * pointer flip because a snap dir referenced by the latest manifest is
    * never vacuumed and readers treat a missing sidecar conservatively. */
  def buildSidecarForLatest(): Unit = latest.foreach { id => withLease {
    val (base, _) = readManifest(id)
    val dirs: Set[String] = base.values.filter(_.nonEmpty)
      .map(p => new Path(p).getParent.toString).toSet
    dirs.foreach(dir => timed("full.sidecar")(writeTermSidecar(dir, dir)))
  } }

  /** Stage a MERGE-ON-READ delta commit: O(batch) writes regardless of
    * store size. `additions` must carry the store schema incl. `bucket`;
    * `tombstones` must carry `deleteKeys` + `bucket` and COVER the
    * additions' keys (see class doc). When the chain would exceed
    * `maxDeltas` the fold runs — bucket-local, see [[foldChain]].
    *
    * `tombstonesDistinct = true` asserts the caller's tombstone set is
    * already distinct per (deleteKeys, bucket) — an aggregation output or
    * an explicit union-distinct — and skips the defensive dedup exchange
    * here (measured as a third of the facts merge wall at bench shape:
    * the distinct re-shuffled a set the caller had just aggregated).
    * Duplicate tombstone keys with the flag wrongly set would only fold
    * redundantly (the fold aggregates tombstones by key anyway), never
    * corrupt, but the default stays defensive. */
  def stageDelta(additions: DataFrame, tombstones: DataFrame, id: Long,
                 tombstonesDistinct: Boolean = false): Unit = withLease {
    require(deleteKeys.nonEmpty, s"stageDelta on a COW-only store: $root")
    val prevId = latest.getOrElse(sys.error("stageDelta on empty store"))
    val (base, deltas) = readManifest(prevId)
    // A no-op batch must not grow the chain: maxDeltas empty deltas would
    // trip a fold — the store-sized work MOR exists to avoid — for doing
    // nothing. Carry the previous base + chain forward under the new id
    // (metadata-only), keeping the stage/finalize protocol uniform. Under
    // the coverage contract empty tombstones imply empty additions; the
    // require turns a violation (additions that would otherwise be
    // silently dropped here) into a loud error. One tiny job on the
    // common path — callers pass checkpointed/cached tombstone sets.
    if (tombstones.isEmpty) {
      require(additions.isEmpty,
        s"stageDelta contract violated: additions without covering tombstones: $root")
      writeAtomic(manifestPath(id), manifestText(base, deltas))
      return // withLease's finally releases
    }
    val snapDir = new Path(root, f"snap_$id%014d").toString
    // one exchange keyed by bucket -> ~one file per bucket per delta
    // (additions are O(batch); a fixed fan-out would write tiny files)
    timed("delta.add")(additions.repartition(numBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$snapDir/add"))
    // same bucket-keyed exchange as additions: ~one file per bucket, and
    // a 10^9-key tombstone set never funnels through one task (the
    // earlier repartition(1) was a single-task write — fine for a bench
    // batch, a bottleneck at target scale)
    val tombRows = tombstones.select((deleteKeys :+ "bucket").map(col): _*)
    timed("delta.tomb")((if (tombstonesDistinct) tombRows else tombRows.distinct())
      .repartition(numBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$snapDir/tomb"))
    timed("delta.sidecar")(writeTermSidecar(s"$snapDir/add", snapDir))
    val chain = deltas :+ DeltaRef(id, snapDir, None)
    if (chain.size <= maxDeltas)
      writeAtomic(manifestPath(id), manifestText(base, chain))
    else
      timed("delta.fold")(foldChain(base, chain, id))
  }

  /** Cap on distinct snap dirs the base may fragment across: each distinct
    * dir is one parquet relation per read (driver-side listing + footer
    * inference — the round-5 non-scaling-latency lesson, StoreSpec guard),
    * so partial folds escalate to a full fold past this bound. */
  val maxBaseDirs: Int = 4

  /** Bound-tripped chain compaction, BUCKET-LOCAL (Iceberg-style partial
    * compaction). `chain` already includes the incoming delta (last, tag
    * `id`). Buckets whose accumulated delta bytes crossed
    * [[foldBucketBytes]] ("hot") fold — base + applicable chain data —
    * into a fresh base dir `snap_<id>B`; the quiet buckets' chain data is
    * consolidated into ONE scoped delta at `snap_<id>C` (surviving adds =
    * the chain folded with no base; tombs = the union of applicable
    * tombstone keys, still needed to mask base rows). Consolidation is
    * small by the definition of quiet (< foldBucketBytes per bucket), so
    * the chain bound holds without any store-sized write. Escalates to a
    * FULL fold when every data-bearing bucket is hot or when the base
    * would fragment past [[maxBaseDirs]] dirs.
    *
    * Single-tag consolidation is correct under the stageDelta contract:
    * every surviving add's key is covered by some chain tombstone, all of
    * which collapse to the consolidated tag, and `wtag >= ttag` (equal)
    * keeps exactly the adds that survived the original chain; base rows
    * (tag -1) stay masked by the union of tombstone keys. */
  private def foldChain(base: Map[Int, String], chain: Seq[DeltaRef], id: Long): Unit = {
    val bytesPerBucket: Map[Int, Long] =
      chain.flatMap { d =>
        Seq("add", "tomb").flatMap { sub =>
          val p = new Path(s"${d.dir}/$sub")
          if (!fs.exists(p)) Seq.empty[(Int, Long)]
          else fs.listStatus(p).toSeq
            .filter(_.getPath.getName.startsWith("bucket="))
            .map(s => s.getPath.getName.stripPrefix("bucket=").toInt ->
              fs.getContentSummary(s.getPath).getLength)
            .filter { case (b, _) => d.scope.forall(_.contains(b)) }
        }
      }.groupMapReduce(_._1)(_._2)(_ + _)
    val withData = bytesPerBucket.keySet
    val hot = withData.filter(b => bytesPerBucket(b) >= foldBucketBytes)
    val quiet = withData -- hot
    val carriedDirs = base.collect {
      case (b, p) if p.nonEmpty && !hot.contains(b) => new Path(p).getParent.toString
    }.toSet
    val baseDir = new Path(root, f"snap_$id%014d" + "B").toString
    if (quiet.isEmpty || carriedDirs.size + 1 > maxBaseDirs) {
      // full fold: every bucket's base advances to one fresh dir
      val folded = assemble(base, chain, None)
        .getOrElse(sys.error(s"empty store under non-empty manifest: $root"))
      val written = writeBase(folded, baseDir, numBuckets)
      val newBase = (0 until numBuckets)
        .map(b => b -> (if (written(b)) s"$baseDir/bucket=$b" else "")).toMap
      writeAtomic(manifestPath(id), manifestText(newBase, Seq.empty))
    } else {
      val hotSorted = hot.toSeq.sorted
      val written: Set[Int] =
        if (hotSorted.isEmpty) Set.empty
        else assemble(base, chain, Some(hotSorted)) match {
          case None => Set.empty
          case Some(df) => writeBase(df, baseDir, hotSorted.size)
        }
      val quietSorted = quiet.toSeq.sorted
      val consDir = new Path(root, f"snap_$id%014d" + "C").toString
      assemble(Map.empty, chain, Some(quietSorted)).foreach { adds =>
        adds.repartition(math.max(quietSorted.size, 1), col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$consDir/add")
      }
      writeTermSidecar(s"$consDir/add", consDir)
      val tombParts = chain.flatMap(d => loadDelta(s"${d.dir}/tomb", Some(quietSorted), d.scope))
      if (tombParts.nonEmpty) {
        tombParts.map(_.select((deleteKeys :+ "bucket").map(col): _*))
          .reduce(_ unionByName _)
          .distinct()
          .repartition(math.max(quietSorted.size, 1), col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$consDir/tomb")
      }
      val newBase = (0 until numBuckets).map { b =>
        b -> (if (written(b)) s"$baseDir/bucket=$b"
              else if (hot.contains(b)) "" // hot bucket emptied by its tombstones
              else base.getOrElse(b, ""))
      }.toMap
      writeAtomic(manifestPath(id),
        manifestText(newBase, Seq(DeltaRef(id, consDir, Some(quiet)))))
    }
  }

  /** Write base rows partitioned by bucket; returns the bucket ids that
    * actually materialized (a bucket emptied by tombstones writes none). */
  private def writeBase(df: DataFrame, dataDir: String, parts: Int): Set[Int] = {
    df.repartition(math.max(parts, 1), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dataDir)
    writeTermSidecar(dataDir, dataDir)
    val d = new Path(dataDir)
    if (!fs.exists(d)) Set.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt).toSet
  }

  // --- term-membership summaries (bucket-pruned point lookups) -------------

  private def sidecarName = "_terms.bloom"

  /** Upper bound on terms a single row's [[termExpr]] array yields — sizes
    * the per-bucket blooms from footer row counts. Oversizing is cheap
    * (bits), undersizing raises FPR; 2 fits the IRI-slot arrays the
    * pipeline indexes. */
  private val termsPerRowHint = 2

  /** Per-bucket row counts from parquet FOOTERS — driver-side metadata
    * reads (one open per file, no Spark job). */
  private def footerRowCounts(dataDir: Path): Map[Int, Long] =
    fs.listStatus(dataDir).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("bucket="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix("bucket=").toInt
        val n = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, hconf))
            try r.getRecordCount finally r.close()
          }.sum
        b -> n
      }.toMap

  /** Build per-bucket [[TermBloom]]s from the parquet just written at
    * `dataDir` and land them at `<sidecarAt>/_terms.bloom` (the `_` prefix
    * keeps parquet listings blind to it). ONE column-pruned pass over the
    * written data: filters are pre-sized from parquet footer row counts
    * (driver-side metadata, no job), then the hash pass runs with map-side
    * partial blooms OR-reduced per bucket — the shuffle moves
    * numPartitions x numBuckets filters, never row data.
    *
    * A write with NO data (delete-only delta) still lands an EMPTY sidecar:
    * the sidecar's presence means "authoritative for this dir" — a
    * tombstone-only delta can never introduce a term, so an empty summary
    * (no candidate buckets) is exact, while an absent one would force
    * [[candidateBuckets]] to conservatively include the delta's whole
    * scope. No-op when [[termExpr]] is unset. */
  private def writeTermSidecar(dataDir: String, sidecarAt: String): Unit =
    termExpr.foreach { te =>
      val p = new Path(dataDir)
      val hasData = fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket="))
      val blooms: Map[Int, TermBloom] =
        if (!hasData) Map.empty
        else {
          val counts = footerRowCounts(p).view
            .mapValues(n => math.max(n, 1L) * termsPerRowHint).toMap
          val termsDf = spark.read.parquet(dataDir)
            .select(col("bucket"), explode(te).as("_t"))
            .filter(col("_t").isNotNull)
            .select(col("bucket").cast("int"), col("_t").cast("string"))
          termsDf
            .as(org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.STRING))
            .rdd
            .mapPartitions { it =>
              val acc = scala.collection.mutable.HashMap.empty[Int, TermBloom]
              it.foreach { case (b, t) =>
                acc.getOrElseUpdate(b, TermBloom.sized(counts.getOrElse(b, 1024L)))
                  .put(TermBloom.hash(t))
              }
              acc.iterator
            }
            .reduceByKey(_ orWith _)
            .collect().toMap
        }
      TermBloom.write(fs, new Path(sidecarAt, sidecarName), blooms)
    }

  /** Buckets that CAN contain rows mentioning any of `terms` — the union,
    * over the base dirs and the delta chain's ADD sides, of buckets whose
    * membership summary probes true. Tombstone files never contribute: a
    * tombstone only suppresses rows, so it cannot make a term appear in a
    * bucket the adds/base did not put it in. A dir with no/unreadable
    * sidecar contributes all its buckets (conservative: pruning must never
    * lose a row); within an existing sidecar a bucket with no summary row
    * had no terms at write time and is excluded. None when the store has
    * no snapshot or summaries are not enabled. */
  def candidateBuckets(terms: Iterable[String]): Option[Seq[Int]] = {
    if (termExpr.isEmpty) return None
    latest.map { id =>
      val (base, deltas) = readManifest(id)
      val hs = terms.map(TermBloom.hash).toArray
      def probe(blooms: Map[Int, TermBloom], b: Int): Boolean =
        blooms.get(b).exists(bl => hs.exists(bl.mightContain))
      val cand = scala.collection.mutable.SortedSet.empty[Int]
      // NOTE: go through Seq — a Map-shaped collect would key by parent dir
      // and silently drop all but one bucket per dir from the candidates
      base.toSeq.collect { case (b, p) if p.nonEmpty => (new Path(p).getParent.toString, b) }
        .groupBy(_._1).foreach { case (dir, entries) =>
          TermBloom.read(fs, new Path(dir, sidecarName)) match {
            case None         => cand ++= entries.map(_._2)
            case Some(blooms) => cand ++= entries.map(_._2).filter(probe(blooms, _))
          }
        }
      deltas.foreach { d =>
        val scope = d.scope.getOrElse((0 until numBuckets).toSet)
        TermBloom.read(fs, new Path(d.dir, sidecarName)) match {
          case None         => cand ++= scope
          case Some(blooms) => cand ++= scope.filter(probe(blooms, _))
        }
      }
      cand.toSeq
    }
  }

  /** Approximate on-disk data bytes of the latest snapshot (base dirs +
    * delta add dirs) — driver-side fs metadata only, never a Spark job.
    * 0 for an empty store. Callers use it as a byte-derived gate for
    * "is this store small enough to materialize per batch". */
  def approxDataBytes: Long = latest.map { id =>
    val (base, deltas) = readManifest(id)
    val dirs = base.values.filter(_.nonEmpty)
      .map(p => new Path(p).getParent).toSet ++
      deltas.map(d => new Path(s"${d.dir}/add"))
    dirs.toSeq.map(p =>
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L).sum
  }.getOrElse(0L)

  /** [[stageDelta]] + pointer flip. */
  def commitDelta(additions: DataFrame, tombstones: DataFrame, id: Long): Unit = {
    stageDelta(additions, tombstones, id)
    finalizeCommit(id)
  }

  /** Flip `_latest` to a previously staged snapshot (idempotent). */
  def finalizeCommit(id: Long): Unit = {
    require(fs.exists(manifestPath(id)), s"finalize of unstaged snapshot $id")
    writeAtomic(new Path(root, "_latest"), id.toString)
  }

  /** True iff snapshot `id` is staged (manifest exists) but not yet latest. */
  def isStagedNotFinal(id: Long): Boolean =
    fs.exists(manifestPath(id)) && !latest.exists(_ >= id)

  /** Copy-on-write merge: replace ONLY `affected` buckets with the rows of
    * `newBucketData` (which must contain exactly those buckets, with the
    * `bucket` column set); all other buckets are carried forward by
    * reference in the new manifest. */
  def mergeBuckets(newBucketData: DataFrame, affected: Seq[Int], id: Long): Unit = {
    stageMerge(newBucketData, affected, id)
    finalizeCommit(id)
  }

  /** [[mergeBuckets]] without the `_latest` flip (see [[stageFull]]).
    * COW path: requires an empty delta chain (a bucket rewrite would
    * silently orphan chained deltas of other buckets) — delta-committing
    * callers use [[stageDelta]], whose fold restores chain-free state. */
  def stageMerge(newBucketData: DataFrame, affected: Seq[Int], id: Long): Unit = withLease {
    val prevId = latest.getOrElse(sys.error("mergeBuckets on empty store"))
    val (prev, chain) = readManifest(prevId)
    require(chain.isEmpty,
      s"stageMerge over a non-empty delta chain (${chain.size} deltas): $root")
    val dataDir = new Path(root, f"snap_$id%014d").toString
    if (affected.nonEmpty) {
      newBucketData
        .repartition(math.max(affected.size, 1), col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(dataDir)
      writeTermSidecar(dataDir, dataDir)
    }
    // a bucket can become empty: parquet partitionBy writes no dir for it,
    // so point such buckets at an empty marker dir
    val written: Set[Int] =
      if (affected.isEmpty) Set.empty
      else {
        val d = new Path(dataDir)
        if (fs.exists(d))
          fs.listStatus(d).map(_.getPath.getName)
            .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt).toSet
        else Set.empty
      }
    val entries = (0 until numBuckets).map { b =>
      val path =
        if (written.contains(b)) s"$dataDir/bucket=$b"
        else if (affected.contains(b)) "" // emptied bucket
        else prev.getOrElse(b, "")
      s"$b\t$path"
    }.mkString("\n")
    writeAtomic(manifestPath(id), entries)
  }

  // --- reads ---------------------------------------------------------------

  private def load(paths: Seq[(Int, String)]): Option[DataFrame] = {
    val nonEmpty = paths.filter(_._2.nonEmpty).filter { case (_, p) => fs.exists(new Path(p)) }
    if (nonEmpty.isEmpty) None
    else {
      // ONE relation per distinct snapshot dir, not one per bucket: a
      // per-bucket `spark.read.parquet` union planned 32 separate file
      // listings + footer schema inferences on the driver for EVERY store
      // read — measured as seconds of non-scaling latency per batch. With
      // `basePath` at the snap dir, partition discovery returns the
      // `bucket` column (int) and path-level pruning to exactly the
      // requested bucket dirs. After a merge-on-read fold or a full
      // commit all buckets share one snap dir, so this is ONE relation.
      val byDir: Map[String, Seq[String]] = nonEmpty
        .map { case (_, p) => new Path(p) }
        .groupBy(p => p.getParent.toString)
        .map { case (dir, ps) => dir -> ps.map(_.toString).toSeq }
      val dfs = byDir.toSeq.sortBy(_._1).map { case (dir, leafs) =>
        spark.read.option("basePath", dir).parquet(leafs: _*)
      }
      Some(dfs.reduce(_ unionByName _))
    }
  }

  /** Bucket-pruned read of one delta dir (None when absent/empty, or when
    * the requested buckets miss the delta's `scope` entirely). The
    * `bucket` partition column comes back from the directory layout, so
    * the isin filter prunes whole subdirs at planning time. */
  private def loadDelta(dir: String, buckets: Option[Seq[Int]],
                        scope: Option[Set[Int]] = None): Option[DataFrame] = {
    val eff: Option[Seq[Int]] = (buckets, scope) match {
      case (None, None)         => None
      case (Some(bs), None)     => Some(bs)
      case (None, Some(s))      => Some(s.toSeq.sorted)
      case (Some(bs), Some(s))  => Some(bs.filter(s.contains))
    }
    if (eff.exists(_.isEmpty)) return None
    val p = new Path(dir)
    if (!fs.exists(p) || !fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket=")))
      None
    else {
      val df = spark.read.parquet(dir)
      Some(eff.fold(df)(bs => df.filter(col("bucket").isin(bs.map(Integer.valueOf): _*))))
    }
  }

  /** Fold base + delta chain into the current logical content. One join:
    * every row is tagged with the snapshot that wrote it (base = -1), all
    * tombstones aggregate to (key -> latest tombstoning snapshot), and a
    * row survives iff written at-or-after that snapshot — correct under
    * the stageDelta contract (a delta's tombstones cover its own
    * additions). The tombstone side is churn-sized, never store-sized, so
    * the join broadcasts at sane scales and AQE picks the strategy. */
  private def assemble(base: Map[Int, String], deltas: Seq[DeltaRef],
                       buckets: Option[Seq[Int]]): Option[DataFrame] = {
    val basePaths: Seq[(Int, String)] = buckets match {
      case None => (0 until numBuckets).map(b => b -> base.getOrElse(b, ""))
      case Some(bs) => bs.distinct.sorted.map(b => b -> base.getOrElse(b, ""))
    }
    val baseDf = load(basePaths)
    if (deltas.isEmpty) return baseDf
    val adds = deltas.flatMap { d =>
      loadDelta(s"${d.dir}/add", buckets, d.scope).map(df => d.tag -> df)
    }
    val tombs = deltas.flatMap { d =>
      loadDelta(s"${d.dir}/tomb", buckets, d.scope).map(df => d.tag -> df)
    }
    val tagged = (baseDf.map(df => -1L -> df).toSeq ++ adds).map { case (tag, df) =>
      df.withColumn("_wtag", lit(tag))
    }
    if (tagged.isEmpty) return None
    // COMMON-schema projection (head's column order): a store whose chain
    // mixes schema generations — a base written before a column existed
    // under deltas that carry it, or the reverse after a binary rollback —
    // folds to the columns EVERY generation has instead of crashing on the
    // head's superset (readers of evolved columns treat absence as "not
    // available" and fall back; the canon `sig` column is the live case).
    // Key columns stay loud: deleteKeys/bucket are contractual in every
    // generation, so a genuinely malformed delta still fails below.
    val cols = tagged.map(_.columns.toSeq).reduce((a, b) => a.filter(b.contains))
    val rows = tagged.map(_.select(cols.map(col): _*)).reduce(_ unionByName _)
    if (tombs.isEmpty) return Some(rows.drop("_wtag"))
    val tombMax = tombs.map { case (tag, df) =>
      df.select(deleteKeys.map(col): _*).withColumn("_ttag", lit(tag))
    }.reduce(_ unionByName _)
      .groupBy(deleteKeys.map(col): _*).agg(max("_ttag").as("_ttag"))
    // tombstone side is churn-sized; broadcast it EXPLICITLY while its
    // on-disk footprint is small (file-length sum — no extra job) so the
    // fold join stays a narrow pass over the store-sized stream.
    val tombBytes = deltas.map { d =>
      val p = new Path(s"${d.dir}/tomb")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
    if (tombBytes <= tombBroadcastBytes)
      Some(rows.join(broadcast(tombMax), deleteKeys, "left")
        .filter(col("_ttag").isNull || col("_wtag") >= col("_ttag"))
        .drop("_wtag", "_ttag"))
    else {
      // Past the gate, do NOT shuffle the store-sized row stream (the old
      // fallback dragged the whole base through an exchange). Bloom-split
      // it instead: rows whose key fails a bloom over the tombstone keys
      // provably have no tombstone — they bypass the join entirely on a
      // second narrow scan; only the bloom-hit subset (~tombstones + FPR)
      // takes the exact join, so whatever strategy it picks moves
      // ~tombstone-sized data. Two narrow scans of the store, zero
      // store-sized exchange, at ANY tombstone volume. The bloom is sized
      // from the on-disk byte count (parquet key rows compress to well
      // over 16 B each, so bytes/16 over-counts keys — an oversized
      // filter, capped at 64 MB of bits where it saturates gracefully).
      val keyHash = xxhash64(deleteKeys.map(col): _*)
      val bloomB = spark.sparkContext.broadcast(
        graft.functions.BloomProbe.build(
          tombMax.select(xxhash64(deleteKeys.map(col): _*)),
          math.max(tombBytes / 16, 1L), maxBits = 1L << 29))
      val pred = graft.functions.BloomProbe(bloomB, keyHash)
      val cold = rows.filter(!pred).drop("_wtag")
      val hot = rows.filter(pred)
        .join(tombMax, deleteKeys, "left")
        .filter(col("_ttag").isNull || col("_wtag") >= col("_ttag"))
        .drop("_wtag", "_ttag")
      Some(cold.unionByName(hot))
    }
  }

  /** Read the full latest snapshot (None if store empty or all buckets
    * emptied). Folds any merge-on-read delta chain. */
  def read(): Option[DataFrame] = latest.flatMap { id =>
    val (base, deltas) = readManifest(id)
    assemble(base, deltas, None)
  }

  /** Read only the given buckets of the latest snapshot — the incremental-
    * read path: IO ∝ touched buckets (base AND deltas are bucket-pruned),
    * not table size. */
  def readBuckets(buckets: Seq[Int]): Option[DataFrame] = latest.flatMap { id =>
    val (base, deltas) = readManifest(id)
    assemble(base, deltas, Some(buckets))
  }

  /** Expire unreferenced snapshots (Iceberg's expire_snapshots analogue):
    * delete every `snap_<k>` dir with k <= latest that the LATEST manifest
    * references neither as a base bucket path nor as a chained delta, and
    * every older manifest file. Without this, each fold-to-base strands a
    * full dead base + chain on disk. Call only from the single writer,
    * after all staged snapshots are finalized (dirs of snapshots NEWER
    * than latest are never touched, so a staged-not-yet-final commit is
    * safe). Crash mid-vacuum leaves garbage, never damage — only
    * unreferenced dirs are deleted. */
  def vacuum(): Unit = latest.foreach { id => withLease {
    val (base, deltas) = readManifest(id)
    val live: Set[String] =
      base.values.filter(_.nonEmpty).map(p => new Path(p).getParent.getName).toSet ++
        deltas.map(d => new Path(d.dir).getName).toSet
    // fold-output dirs carry a letter suffix (snap_<id>B / snap_<id>C) —
    // parse the digit prefix; a name with none is never deleted
    def numOf(name: String, prefix: String, suffix: String): Long = {
      val digits = name.stripPrefix(prefix).stripSuffix(suffix).takeWhile(_.isDigit)
      if (digits.isEmpty) Long.MaxValue else digits.toLong
    }
    val entries = fs.listStatus(new Path(root))
    entries.filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("snap_") &&
          numOf(p.getName, "snap_", "") <= id && !live.contains(p.getName)
      }
      .foreach(p => fs.delete(p, true))
    entries.filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest_") &&
        numOf(p.getName, "manifest_", ".txt") < id)
      .foreach(p => fs.delete(p, false))
  } }

  /** Epoch handshake (reference vql_started_at.txt, T6 cascading reset). */
  def epoch: Option[String] = {
    val p = new Path(root, "_epoch")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }
  def setEpoch(e: String): Unit = writeAtomic(new Path(root, "_epoch"), e)

  /** Wipe the store (epoch-mismatch reset — split-graphs.sh:171's `rm -Rf`,
    * but only ever invoked on explicit epoch change). */
  def reset(): Unit = { if (fs.exists(new Path(root))) fs.delete(new Path(root), true) }
}

object SnapshotStore {
  /** One merge-on-read delta in the chain: `tag` orders the fold join
    * (rows written by later snapshots beat earlier tombstones), `dir`
    * holds the delta's `add/` and `tomb/` parquet, and `scope` is the
    * bucket set it applies to (None = every bucket). Scoped refs come
    * from partial folds: hot buckets leave the chain into a new base,
    * quiet buckets' consolidated data stays behind, scoped to them. */
  private[state] final case class DeltaRef(tag: Long, dir: String, scope: Option[Set[Int]])
}
