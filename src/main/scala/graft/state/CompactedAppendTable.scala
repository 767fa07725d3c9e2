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
  *    dirs — swept on every subsequent compaction (delete all != current).
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

  /** Current generation data dir ("gen_0" before any pointer exists). */
  def currentDir(spark: SparkSession, root: String): String = {
    val gen = readPointer(fs(spark, root), root).getOrElse("gen_0")
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
