package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns + typed metadata, with the decode step STUBBED (no codec
  * libraries ship in this container) behind [[FakeCodec]] — a deterministic
  * stand-in whose Spark-side plumbing (schema, batching, partition sizing)
  * is the real, tested part.
  *
  * Production notes encoded in the design:
  *  - payloads never travel through a shuffle: decode/feature steps are
  *    narrow (mapPartitions over the scan), and downstream aggregations
  *    project the metadata columns only, so column pruning keeps the bytes
  *    in the scan stage;
  *  - `spark.sql.files.maxPartitionBytes` governs batch size for blobs; a
  *    real deployment stores blobs in separate parquet row groups (or a
  *    sidecar object store) keyed by content hash.
  */
object Multimodal {

  /** Typed metadata for a decoded media payload. */
  final case class MediaMeta(
      doc_id: Long,
      kind: String,      // image | audio | video
      byte_len: Int,
      // image: width/height; audio: sample count; video: frame count
      dim1: Int,
      dim2: Int,
      checksum: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType, nullable = false),
      StructField("dim1", IntegerType, nullable = false),
      StructField("dim2", IntegerType, nullable = false))), nullable = true)))

  /** STUB decoder: a real build would call an image/audio codec here (e.g.
    * via JNI or a vectorized Python worker). The fake derives metadata as a
    * pure function of the payload bytes so tests are deterministic. */
  object FakeCodec {
    def decodeDims(payload: Array[Byte], kind: String): (Int, Int) = {
      if (payload == null || payload.isEmpty) return (0, 0)
      val h = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
      kind match {
        case "image" => (64 + math.floorMod(h, 960).toInt, 64 + math.floorMod(h >> 10, 960).toInt)
        case "audio" => (8000 + math.floorMod(h, 96000).toInt, 1)
        case "video" => (1 + math.floorMod(h, 240).toInt, 30)
        case _ => (payload.length, 0)
      }
    }
  }

  /** Attach a synthetic binary payload column to a documents table (the
    * sandbox has no real media; payload = utf-8 of text — the shape is what
    * matters: binary column + kind). */
  def withFakePayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", to_binary(col("text"), lit("utf-8")))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))

  /** Decode / feature-extract over the binary column. Narrow mapPartitions
    * (rows stay where the scan put them); output drops the payload so only
    * metadata flows downstream. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (d1, d2) = FakeCodec.decodeDims(payload, kind)
          val len = if (payload == null) 0 else payload.length
          val sum = java.security.MessageDigest.getInstance("MD5")
            .digest(if (payload == null) Array.emptyByteArray else payload)
            .map("%02x".format(_)).mkString
          MediaMeta(id, kind, len, d1, d2, sum)
        }
      }
  }

  /** Declarative metadata path (when no codec is needed): pure Column
    * expressions over the binary column — pushdown-friendly. */
  def metaColumns(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      md5(col("payload")).as("checksum"))

  /** Fully declarative frame-sample plan (the oracle-checkable variant of
    * [[frameSamplePlan]]): frame count derives from byte_len — a portable
    * stand-in for the codec's header read — and the fan-out is the same
    * explode-over-stride-sequence; no stub on the path. */
  def frameSampleMeta(media: DataFrame, stride: Int): DataFrame =
    metaColumns(media).filter(col("kind") === "video")
      .withColumn("n_frames", (pmod(col("byte_len"), lit(240)) + 1).cast("int"))
      .withColumn("frame", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame").cast("long").as("frame"), col("checksum"))

  /** Deterministic frame sampling plan for video payloads: every `stride`-th
    * frame index up to the (stubbed) frame count — the Spark-side shape of
    * a frame-extraction fan-out (explode), with the decode itself stubbed. */
  def frameSamplePlan(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    val metas = extractMeta(spark, media.filter(col("kind") === "video")).toDF()
    metas.withColumn("frame",
        explode(sequence(lit(0), greatest(col("dim1") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("frame"), col("checksum"))
  }
}
