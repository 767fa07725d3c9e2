package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph materialization (north_star: "adjacency-list edge tables
  * partitioned by subject-hash with explicit repartitioning and AQE
  * skew-join handling"): the current graph state as per-subject adjacency
  * pages, physically laid out by subject hash.
  *
  * Scale shape:
  *  - ONE explicit exchange: `repartition(numBuckets, bucket)` on the
  *    subject-hash bucket (uniform by construction — key skew never makes
  *    bucket skew), then `sortWithinPartitions(s, e)` so each subject's
  *    edges arrive contiguously and ordered;
  *  - hub subjects (a popular entity with 10^8 outgoing edges — the
  *    explicit skew case of SURVEY §4.1) can NOT blow up task memory: the
  *    page cut is a streaming iterator that buffers at most `pageSize`
  *    edges, emitting one row per (subject, page). `collect_list` over a
  *    groupBy — the naive formulation — would materialize the hub's whole
  *    edge set in one aggregation buffer;
  *  - downstream joins against the adjacency table co-locate by the same
  *    bucket (join key s -> bucket prunes to one partition), and AQE's
  *    skew-join splitting covers residual read-side skew.
  */
object GraphMaterialize {

  /** Default subject-hash bucket: xxhash64 (codegen'd). The oracle row
    * passes the portable md5-based hash instead so DuckDB can mirror the
    * layout — the operator is hash-agnostic by parameter. */
  def subjectBucket(numBuckets: Int): Column =
    pmod(xxhash64(col("s")), lit(numBuckets)).cast("int")

  /** Format one quad's outgoing edge as a deterministic string
    * `p<space><term>` (the adjacency entry of `s`). */
  def quadEdges(quads: DataFrame): DataFrame =
    quads.select(col("s"),
      concat_ws(" ", col("p"),
        graft.rdf.NQuadFormatter.fmtObject(col("oLex"), col("oKind"),
          col("oDtype"), col("oLang"))).as("e"))

  /** edges(s: string, e: string) -> adjacency pages
    * (bucket, s, page, degree, adj: array<string>): per subject, its
    * edges sorted ascending and cut into pages of <= `pageSize`; `page`
    * increases 0,1,... per subject; `degree` is the page's edge count. */
  def adjacencyPages(edges: DataFrame, numBuckets: Int = 64,
                     pageSize: Int = 100000,
                     bucketCol: Option[Column] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val bc = bucketCol.getOrElse(subjectBucket(numBuckets))
    edges.select(col("s"), col("e"))
      .withColumn("bucket", bc)
      .repartition(numBuckets, col("bucket")) // explicit subject-hash exchange
      .sortWithinPartitions("s", "e")
      .select(col("bucket"), col("s"), col("e")).as[(Int, String, String)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Int, String, Int, Int, Seq[String])] {
          private var curS: String = _
          private var page = 0
          def hasNext: Boolean = buf.hasNext
          def next(): (Int, String, Int, Int, Seq[String]) = {
            val (b, s, _) = buf.head
            if (s != curS) { curS = s; page = 0 }
            val es = scala.collection.mutable.ArrayBuffer.empty[String]
            while (buf.hasNext && buf.head._2 == s && es.size < 1.max(pageSize))
              es += buf.next()._3
            val out = (b, s, page, es.size, es.toSeq)
            page += 1
            out
          }
        }
      }
      .toDF("bucket", "s", "page", "degree", "adj")
  }

  /** Physical layout: one directory per subject-hash bucket — the join
    * side of a 100 TB deployment reads only the buckets its keys hash to. */
  def writeAdjacency(pages: DataFrame, path: String): Unit =
    pages.write.mode("overwrite").partitionBy("bucket").parquet(path)
}
