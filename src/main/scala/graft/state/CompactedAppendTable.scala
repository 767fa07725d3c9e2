package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-mostly parquet table with bounded file count — the backing layout
  * for the pipeline's per-batch bookkeeping tables (lineage, published-zip
  * membership). A naive `mode("append")` dir grows one small file per batch
  * forever (reference counts files are O(1)); thousands of batches would
  * make every watermark/prune read list and open thousands of tiny files.
  *
  * Layout: `root/gen_<k>/` generation dirs + a `root/_current` pointer file
  * (tmp + atomic rename). Appends land in the CURRENT generation; when its
  * file count exceeds `maxFiles`, the whole table is rewritten coalesced
  * into `gen_<k+1>` and the pointer flips. Readers follow the pointer, so
  * they see either the old generation or the compacted one — never a
  * partial mix.
  *
  * Crash windows, all safe:
  *  - during the compaction write: orphan `gen_<k+1>` data, pointer still
  *    `gen_<k>` — the next compaction overwrites it;
  *  - after the flip, before the old-generation delete: stale `gen_<j>`
  *    dirs — swept on every subsequent compaction (delete all != current);
  *  - pointer lost mid-replace (the delete-then-rename window, or manual
  *    damage): readers resolve to the NEWEST generation dir carrying
  *    Spark's `_SUCCESS` commit marker — never a swept gen_0 — so the
  *    table stays visible. A fully-written-but-unflipped `gen_<k+1>`
  *    resolving this way is equivalent content (the compaction is a
  *    full rewrite of the same rows).
  *
  * Legacy layout: a root dir holding flat `*.parquet` files (the
  * pre-generation `mode("append")` layout) is migrated into `gen_0/` on
  * first touch, so state written by earlier builds stays visible.
  */
object CompactedAppendTable {

  /** Compact when the current generation exceeds this many data files. */
  val DefaultMaxFiles: Int = 64

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_current")

  private def readPointer(f: FileSystem, root: String): Option[String] = {
    val p = pointer(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private def writePointer(f: FileSystem, root: String, gen: String): Unit = {
    val tmp = new Path(root, s"_current.tmp${System.nanoTime()}")
    val out = f.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val p = pointer(root)
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) sys.error(s"pointer rename failed: $root -> $gen")
  }

  /** Generation indices whose dirs carry a `_SUCCESS` commit marker (Spark
    * writes one per successful parquet job; a compaction that crashed
    * mid-write has none and must not be resolved to). */
  private def committedGens(f: FileSystem, root: String): Seq[Int] = {
    val rp = new Path(root)
    if (!f.exists(rp)) Seq.empty
    else f.listStatus(rp).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("gen_") &&
        p.getName.stripPrefix("gen_").forall(_.isDigit) &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(p => genIndex(p.getName)).toSeq
  }

  /** One-time migration of the legacy flat layout (root-level `*.parquet`
    * from a plain `mode("append")` writer) into `gen_0/`, so pre-generation
    * state dirs stay visible instead of silently reading as empty. Per-file
    * renames; a crash mid-loop leaves the remaining flat files at root and
    * the next touch finishes the move. */
  private def migrateLegacy(f: FileSystem, root: String): Unit = {
    val rp = new Path(root)
    if (!f.exists(rp)) return
    val flat = f.listStatus(rp).filter(s => s.isFile &&
      (s.getPath.getName.endsWith(".parquet") || s.getPath.getName == "_SUCCESS"))
    if (!flat.exists(_.getPath.getName.endsWith(".parquet"))) return
    val g0 = new Path(root, "gen_0")
    f.mkdirs(g0)
    flat.foreach(s => f.rename(s.getPath, new Path(g0, s.getPath.getName)))
  }

  /** Current generation data dir. Resolution order: pointer file; else the
    * newest committed generation; else "gen_0" (empty table). */
  def currentDir(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    migrateLegacy(f, root)
    val gen = readPointer(f, root).getOrElse {
      committedGens(f, root).sorted.lastOption
        .map(k => s"gen_$k").getOrElse("gen_0")
    }
    s"$root/$gen"
  }

  /** True once any append has landed. */
  def exists(spark: SparkSession, root: String): Boolean =
    fs(spark, root).exists(new Path(currentDir(spark, root)))

  def read(spark: SparkSession, root: String): Option[DataFrame] =
    if (!exists(spark, root)) None
    else Some(spark.read.parquet(currentDir(spark, root)))

  /** Append `df` to the current generation, then compact if the generation
    * has outgrown `maxFiles`. `targetFiles` sizes the compacted rewrite
    * (1 for small tables; callers with multi-GB tables pass a row-derived
    * count so one file never exceeds executor-friendly sizes). */
  def append(spark: SparkSession, root: String, df: DataFrame,
             maxFiles: Int = DefaultMaxFiles,
             targetFiles: Long => Int = _ => 1): Unit = {
    df.write.mode("append").parquet(currentDir(spark, root))
    compactIfNeeded(spark, root, maxFiles, targetFiles)
  }

  private def genIndex(name: String): Int =
    name.stripPrefix("gen_").toInt

  def compactIfNeeded(spark: SparkSession, root: String,
                      maxFiles: Int = DefaultMaxFiles,
                      targetFiles: Long => Int = _ => 1): Unit = {
    val f = fs(spark, root)
    val cur = currentDir(spark, root)
    val curPath = new Path(cur)
    if (!f.exists(curPath)) return
    val nFiles = f.listStatus(curPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (nFiles <= maxFiles) return
    val curGen = genIndex(curPath.getName)
    val nextGen = s"gen_${curGen + 1}"
    val data = spark.read.parquet(cur)
    val rows = data.count()
    data.repartition(math.max(1, targetFiles(rows)))
      .write.mode("overwrite").parquet(s"$root/$nextGen")
    writePointer(f, root, nextGen)
    // sweep every non-current generation (incl. stale dirs from crashed
    // compactions of past runs)
    f.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("gen_") && p.getName != nextGen)
      .foreach(p => f.delete(p, true))
  }
}
