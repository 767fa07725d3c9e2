package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.NQuadFormatter

/** S5/A2 — chunked RDF-patch file sink.
  *
  * Reference behavior re-expressed Spark-first:
  *  - group output by graph, base64 directory name per graph
  *    (split-graphs.sh:88-97)            -> `partitionBy("g_b64")`
  *  - `maxq` quads per file (generate-rdfpatch.sh:16) -> `maxRecordsPerFile`
  *  - header comment lines `# at checkpoint / # graph / # base64 / # amount`
  *    (buffer_nquads.sql:55-58)          -> header rows unioned in with a
  *    sort key so they sort before the body within each graph partition
  *  - file naming `rdf_out_<ts14>-<serial14>` (generate-rdfpatch.sh:210-217)
  *    -> post-commit metadata-only rename of part files (no data movement)
  *
  * The whole job is one exchange (repartition by graph) + sorted write —
  * the reference's two interchangeable strategies (hash-buffer
  * buffer_nquads.sql vs sort-stream split_nquads.sql) collapse into
  * Spark's sort-within-partitions write, which spills instead of OOMing
  * (the reference documents the OOM risk at buffer_nquads.sql:7).
  */
object PatchWriter {

  /** patches: (op + quad cols). Returns number of files written. */
  def write(spark: SparkSession, patches: DataFrame, outDir: String,
            checkpoint: String, maxq: Int = 100000): Long = {
    val withLine = patches
      .withColumn("g_b64", base64(col("g").cast("binary")))
      .withColumn("seq", lit(1))
      .withColumn("line", NQuadFormatter.patchLineCol(patches))

    val counts = withLine.groupBy(col("g"), col("g_b64")).count()
    val headers = counts.select(col("g"), col("g_b64"), col("count"))
      .select(col("g_b64"),
        posexplode(array(
          concat(lit("# at checkpoint "), lit(checkpoint)),
          concat(lit("# graph         "), col("g")),
          concat(lit("# base64        "), col("g_b64")),
          concat(lit("# amount        "), col("count").cast("string"))
        )).as(Seq("hseq", "line")))
      .select(col("g_b64"), lit(0).as("seq"), col("hseq"), col("line"))

    val body = withLine.select(col("g_b64"), col("seq"), lit(0).as("hseq"), col("line"))

    // explicit partition count: with the default (shuffle.partitions) AQE
    // coalesces the per-graph groups into very few tasks and the sorted
    // write runs near-serially regardless of cores. Sort keys are the two
    // small ints that matter (headers before body within a graph) — NOT the
    // line text; sorting 10^7 ~130-byte strings per task was the dump
    // path's constant-rate bottleneck.
    val writeParallelism = math.max(spark.sparkContext.defaultParallelism * 2, 16)
    headers.unionByName(body)
      .repartition(writeParallelism, col("g_b64"))
      .sortWithinPartitions(col("g_b64"), col("seq"), col("hseq"))
      .select("g_b64", "line")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxq)
      .partitionBy("g_b64")
      .text(outDir)

    renameToFixtureNames(spark, outDir, checkpoint)
  }

  /** Rename part-* files to the reference scheme `rdf_out_<cp14>-<serial14>`
    * within each graph directory (metadata-only; ordering = original part
    * file order, which follows the sorted write). Returns file count. */
  def renameToFixtureNames(spark: SparkSession, outDir: String, checkpoint: String): Long = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(outDir)
    if (!fs.exists(base)) return 0L
    var n = 0L
    val dirs = fs.listStatus(base).filter(_.isDirectory)
    dirs.foreach { d =>
      val parts = fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        val target = new Path(d.getPath, f"rdf_out_$checkpoint-$i%014d")
        fs.rename(f.getPath, target)
        n += 1
      }
    }
    n
  }

  /** Read a patch dir back (for tests / reconciliation). */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "false").text(dir + "/*")
}
