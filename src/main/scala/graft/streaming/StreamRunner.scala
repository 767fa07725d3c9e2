package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.Page

/** Structured-Streaming front-end for the pipeline — the reference's
  * poll-loop micro-batching (`run; sleep RUN_INTERVAL`,
  * quad-logger/entrypoint.sh:14-17) re-expressed as a file-source stream.
  *
  * Page-snapshot parquet drops land in `inDir`; `readStream` discovers new
  * files per micro-batch (`maxFilesPerTrigger` bounds batch size, the
  * `maxq`-analogue), the event-time watermark on `warc_ts` excludes
  * late/in-flight data exactly like the reference's skip-the-newest-trx rule
  * (parse_trx_logs.sql:54-55), and `foreachBatch` hands each micro-batch to
  * the same exactly-once incremental engine used in batch mode (idempotent
  * re-runs via the lineage check, T8).
  *
  * Two trigger modes, same plan and per-batch semantics:
  *  - [[runAvailableNow]] — process the backlog then stop (deterministic,
  *    the testing/catch-up mode);
  *  - [[runContinuous]] — `Trigger.ProcessingTime(interval)`, the
  *    reference's RUN_INTERVAL production loop: the query stays up and
  *    polls `inDir` every interval until the caller stops it.
  */
final class StreamRunner(spark: SparkSession, pipe: QuadLogPipeline) {
  import spark.implicits._

  private def build(inDir: String, checkpointDir: String, startBatchId: Long,
                    lateness: String, trigger: Trigger,
                    onBatch: Long => Unit): StreamingQuery = {
    val schema = implicitly[org.apache.spark.sql.Encoder[Page]].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(inDir)
      .withWatermark("warc_ts", lateness)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pages = batch.filter(col("text").isNotNull).as[Page]
        val deleted = batch.filter(col("text").isNull).select("url").as[String]
        val cp = f"${20240102000000L + id}%014d"
        pipe.incremental(startBatchId + id, cp, pages, deleted)
        onBatch(startBatchId + id)
        ()
      }
      .start()
  }

  /** Run all currently-available page drops through the pipeline. Each
    * micro-batch becomes one incremental commit; `deletedUrls` arrive as
    * tombstone rows (text IS NULL) in the same stream — the changelog
    * convention of CDC feeds. Returns the number of micro-batches run. */
  def runAvailableNow(inDir: String, checkpointDir: String,
                      startBatchId: Long, lateness: String = "0 seconds"): Long = {
    var batches = 0L
    val q = build(inDir, checkpointDir, startBatchId, lateness,
      Trigger.AvailableNow(), _ => batches += 1)
    q.awaitTermination()
    batches
  }

  /** The reference's RUN_INTERVAL continuous mode (entrypoint.sh:14-17):
    * identical engine, but the query stays up and polls `inDir` every
    * `interval`, committing one incremental batch per non-empty poll.
    * Returns the running [[StreamingQuery]] — the caller owns shutdown
    * (`query.stop()`); Spark's streaming checkpoint resumes batch ids
    * across restarts, so re-launching with the same `checkpointDir`
    * continues exactly where the stopped query left off (T2). `onBatch` is
    * invoked with each committed batch id (progress hook for operators). */
  def runContinuous(inDir: String, checkpointDir: String, startBatchId: Long,
                    interval: String = "30 seconds",
                    lateness: String = "0 seconds",
                    onBatch: Long => Unit = _ => ()): StreamingQuery =
    build(inDir, checkpointDir, startBatchId, lateness,
      Trigger.ProcessingTime(interval), onBatch)
}
