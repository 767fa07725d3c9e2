package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Iceberg-lite bucketed copy-on-write table with atomic snapshot commits.
  *
  * No Iceberg jar ships in /opt/spark/jars, so we emulate the three Iceberg
  * behaviors the pipeline needs (SURVEY.md §7.3) behind this interface:
  *
  *  1. snapshot isolation / atomic visibility — data lands under
  *     `snap_<id>/bucket=<b>/`, then a manifest file and finally the
  *     `_latest` pointer are atomically renamed into place. Readers resolve
  *     `_latest` -> manifest -> per-bucket paths; a crashed writer leaves
  *     only unreferenced files. This replaces the reference's sham-file /
  *     skip-last visibility protocol (generate-rdfpatch.sh:54, 259-261).
  *  2. MERGE INTO at bucket granularity — a commit rewrites only the buckets
  *     it touches; the manifest carries every other bucket's path forward
  *     unchanged (copy-on-write without copying the unchanged 99%).
  *  3. incremental reads — `readBuckets` loads only named buckets, and the
  *     per-bucket parquet keeps min/max stats so pushed filters prune files.
  *
  * Rename is atomic on HDFS-like filesystems (and the local FS used here);
  * an object-store deployment would swap this class for a real catalog —
  * the pipeline only sees the trait-like API.
  *
  * The table is hash-bucketed by a caller-chosen key column:
  * `bucket = pmod(xxhash64(key), numBuckets)` — uniform by construction, so
  * no bucket-level skew regardless of key skew.
  */
final class SnapshotStore(spark: SparkSession, root: String, val numBuckets: Int) {

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

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

  /** manifest: one `bucket<TAB>path` line per bucket. */
  private def readManifest(id: Long): Map[Int, String] = {
    val in = fs.open(manifestPath(id))
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8) finally in.close()
    text.split("\n").filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split("\t", 2); b.toInt -> p
    }.toMap
  }

  // --- commits -------------------------------------------------------------

  /** Full (bootstrap) commit: writes every bucket. `df` must already carry
    * an int `bucket` column. */
  def commitFull(df: DataFrame, id: Long): Unit = {
    stageFull(df, id)
    finalizeCommit(id)
  }

  /** Stage a full snapshot: data + manifest land on disk but `_latest` is
    * NOT flipped — readers still see the previous snapshot. A coordinator
    * that writes several stores atomically stages each, writes its own
    * commit marker, then [[finalizeCommit]]s all of them; a crash in
    * between is repaired by replaying the finalize (metadata-only). */
  def stageFull(df: DataFrame, id: Long): Unit = {
    val dataDir = new Path(root, f"snap_$id%014d").toString
    df.repartition(numBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dataDir)
    val entries = (0 until numBuckets)
      .map(b => s"$b\t$dataDir/bucket=$b").mkString("\n")
    writeAtomic(manifestPath(id), entries)
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

  /** [[mergeBuckets]] without the `_latest` flip (see [[stageFull]]). */
  def stageMerge(newBucketData: DataFrame, affected: Seq[Int], id: Long): Unit = {
    val prevId = latest.getOrElse(sys.error("mergeBuckets on empty store"))
    val prev = readManifest(prevId)
    val dataDir = new Path(root, f"snap_$id%014d").toString
    if (affected.nonEmpty) {
      newBucketData
        .repartition(math.max(affected.size, 1), col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(dataDir)
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
      // basePath keeps schemas aligned; re-attach the bucket id per path
      val dfs = nonEmpty.map { case (b, p) =>
        spark.read.parquet(p).withColumn("bucket", lit(b))
      }
      Some(dfs.reduce(_ unionByName _))
    }
  }

  /** Read the full latest snapshot (None if store empty or all buckets
    * emptied). */
  def read(): Option[DataFrame] =
    latest.flatMap { id => load(readManifest(id).toSeq) }

  /** Read only the given buckets of the latest snapshot — the incremental-
    * read path: IO ∝ touched buckets, not table size. */
  def readBuckets(buckets: Seq[Int]): Option[DataFrame] = latest.flatMap { id =>
    val m = readManifest(id)
    load(buckets.distinct.sorted.map(b => b -> m.getOrElse(b, "")))
  }

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
