package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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
  * re-runs via the lineage check, T8). `Trigger.AvailableNow` processes the
  * backlog then stops — deterministic and testable, while a production
  * deployment would run `Trigger.ProcessingTime(interval)` for the
  * reference's RUN_INTERVAL behavior.
  */
final class StreamRunner(spark: SparkSession, pipe: QuadLogPipeline) {
  import spark.implicits._

  /** Run all currently-available page drops through the pipeline. Each
    * micro-batch becomes one incremental commit; `deletedUrls` arrive as
    * tombstone rows (text IS NULL) in the same stream — the changelog
    * convention of CDC feeds. Returns the number of micro-batches run. */
  def runAvailableNow(inDir: String, checkpointDir: String,
                      startBatchId: Long, lateness: String = "0 seconds"): Long = {
    val schema = implicitly[org.apache.spark.sql.Encoder[Page]].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(inDir)
      .withWatermark("warc_ts", lateness)

    var batches = 0L
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pages = batch.filter(col("text").isNotNull).as[Page]
        val deleted = batch.filter(col("text").isNull).select("url").as[String]
        val cp = f"${20240102000000L + id}%014d"
        pipe.incremental(startBatchId + id, cp, pages, deleted)
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
