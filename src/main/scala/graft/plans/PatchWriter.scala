package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rdf.NQuadFormatter

/** S5/A2 — chunked RDF-patch file sink.
  *
  * Reference behavior re-expressed Spark-first:
  *  - group output by graph, base64 directory name per graph
  *    (split-graphs.sh:88-97)            -> one directory per g_b64
  *  - `maxq` quads per file (generate-rdfpatch.sh:16) -> deterministic
  *    chunk ids assigned by a DISTRIBUTED two-pass row numbering (below)
  *  - every chunk file carries the reference's 4-line header with that
  *    chunk's own quad count and the exact label padding of
  *    vql_print_graph (buffer_nquads.sql:55-58): values start at col 18
  *  - file naming `rdf_out_<ts14>-<serial14>` (generate-rdfpatch.sh:210-217)
  *    -> files are written under their final names by the write tasks
  *    themselves; no driver-side rename loop, no per-file driver I/O
  *
  * Scale shape. A naive `row_number over (partition by graph)` forces an
  * entire graph through one task (a single-graph 100 TB store = one task),
  * and the old post-commit rename was O(files) on the driver. Instead:
  *
  *   1. split each graph into `P` uniform sub-streams by a hash of the
  *      line (`sub`), count rows per (graph, sub) — a tiny aggregate;
  *   2. prefix-sum those counts per graph (window over the COUNTS table,
  *      P rows per graph — parallel across graphs) -> each sub-stream's
  *      global offset within its graph;
  *   3. rank rows within (graph, sub) — bounded ~N/P rows per window
  *      partition — and derive serial = offset + local rank, so
  *      chunk = serial / maxq is a deterministic, globally consistent
  *      per-graph file id with NO single-task bottleneck;
  *   4. repartition by (graph, chunk) and stream each chunk straight into
  *      its final `rdf_out_<cp>-<chunk>` file (executor-local writes).
  *
  * Rows are ordered inside a chunk by the same hash used for ranking, so
  * output is byte-deterministic end to end.
  */
object PatchWriter {

  /** Header lines exactly as vql_print_graph emits them: labels padded so
    * values start at column 18 (note the TWO spaces after "checkpoint"). */
  def headerLines(checkpoint: String, graph: String, b64: String, amount: Long): Seq[String] =
    Seq(
      s"# at checkpoint  $checkpoint",
      s"# graph          $graph",
      s"# base64         $b64",
      s"# amount         $amount")

  /** patches: (op + quad cols). Returns number of files written. */
  def write(spark: SparkSession, patches: DataFrame, outDir: String,
            checkpoint: String, maxq: Int = 100000): Long = {
    val P = math.max(spark.sparkContext.defaultParallelism * 2, 16)

    val withLine = patches
      .withColumn("g_b64", base64(col("g").cast("binary")))
      .withColumn("line", NQuadFormatter.patchLineCol(patches))
      .select(col("g"), col("g_b64"), col("line"))
      .withColumn("h", xxhash64(col("line")))
      .withColumn("sub", pmod(col("h"), lit(P)).cast("int"))

    // pass 1: per-(graph, sub) counts -> per-sub offsets (prefix sum over a
    // tiny table: P rows per graph, windowed per graph => parallel)
    val counts = withLine.groupBy("g_b64", "sub").agg(count(lit(1)).as("cnt"))
    val offW = Window.partitionBy("g_b64").orderBy("sub")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("cnt").over(offW), lit(0L)))
      .select("g_b64", "sub", "off")

    // pass 2: local rank within (graph, sub) -> global per-graph serial
    val rankW = Window.partitionBy("g_b64", "sub").orderBy("h", "line")
    val serialized = withLine
      .join(offsets, Seq("g_b64", "sub"))
      .withColumn("serial", col("off") + row_number().over(rankW) - 1)
      .withColumn("chunk", (col("serial") / maxq).cast("long"))

    // write: each (graph, chunk) group lands as ONE final-named file,
    // header included, written by the task that owns it (no driver I/O)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileCount = spark.sparkContext.longAccumulator("patchFiles")
    val out = outDir
    val fsRoot = new Path(out)
    val fs0 = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs0.exists(fsRoot)) fs0.delete(fsRoot, true) // idempotent rewrite (T7)
    fs0.mkdirs(fsRoot)

    serialized
      .repartition(P, col("g_b64"), col("chunk"))
      .sortWithinPartitions(col("g_b64"), col("chunk"), col("serial"))
      .select("g", "g_b64", "chunk", "line")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new Path(out).getFileSystem(hconf.value)
        var cur: (String, Long) = null
        var w: java.io.BufferedWriter = null
        var buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var curG = ""
        def flush(): Unit = if (cur != null) {
          val (b64, chunk) = cur
          val p = new Path(new Path(out, s"g_b64=$b64"), f"rdf_out_$checkpoint-$chunk%014d")
          val os = fs.create(p, true)
          w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(os, java.nio.charset.StandardCharsets.UTF_8))
          headerLines(checkpoint, curG, b64, buf.size).foreach { l => w.write(l); w.write('\n') }
          buf.foreach { l => w.write(l); w.write('\n') }
          w.close()
          fileCount.add(1L)
          buf = scala.collection.mutable.ArrayBuffer.empty[String]
        }
        it.foreach { r =>
          val key = (r.getString(1), r.getLong(2))
          if (cur == null || key != cur) { flush(); cur = key; curG = r.getString(0) }
          buf += r.getString(3)
        }
        flush()
      }
    fileCount.value
  }

  /** Read a patch dir back (for tests / reconciliation). */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "false").text(dir + "/*")
}
