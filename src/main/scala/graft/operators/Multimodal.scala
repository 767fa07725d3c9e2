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

  /** REAL header-only media decoding: dimensions/sample metadata parsed
    * straight from the container's public byte layout — no codec library
    * needed, because none of these fields require decompressing pixel/
    * sample data. Formats (all public specs):
    *  - PNG:  8-byte signature, IHDR width/height as big-endian u32 at
    *          offsets 16/20;
    *  - JPEG: FFD8 SOI, then marker scan to any SOFn (C0-CF minus C4/C8/CC),
    *          height/width big-endian u16 at +3/+5 into the segment;
    *  - GIF:  GIF87a/GIF89a, logical-screen width/height little-endian u16
    *          at 6/8;
    *  - WAV:  RIFF....WAVE, "fmt " chunk -> (sampleRate, channels).
    * Full-pixel decode (resize, feature extraction) still needs a codec a
    * production build would bind here; [[FakeCodec]] remains the declared
    * deterministic stand-in for payloads that are not real containers. */
  object MediaHeaders {

    private def beU16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def beU32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def leU16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def leU32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** (container, dim1, dim2): png/jpeg/gif -> (width, height);
      * wav -> (sampleRate, channels). None when no known magic matches. */
    def decode(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b == null) return None
      if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        return Some(("png", beU32(b, 16), beU32(b, 20)))
      if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        return decodeJpeg(b)
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        return Some(("gif", leU16(b, 6), leU16(b, 8)))
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        return decodeWav(b)
      None
    }

    private def decodeJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
      var o = 2
      while (o + 4 <= b.length) {
        if ((b(o) & 0xff) != 0xff) return None // marker desync
        val marker = b(o + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          o += 2 // standalone markers carry no length
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // EOI / start-of-scan before any SOF: no dims
        } else {
          val len = beU16(b, o + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (o + 9 > b.length) return None
            return Some(("jpeg", beU16(b, o + 7), beU16(b, o + 5)))
          }
          o += 2 + len
        }
      }
      None
    }

    private def decodeWav(b: Array[Byte]): Option[(String, Int, Int)] = {
      // the cursor and chunk size are UNSIGNED and tracked in Long: a
      // malformed/adversarial size like 0xFFFFFFF8 read signed (-8) makes
      // the step non-advancing — an infinite loop inside an executor task
      // fed arbitrary crawled bytes. Long math keeps the step >= 8, so the
      // cursor strictly advances and any overflow just exits the loop.
      var o: Long = 12L
      while (o + 8 <= b.length) {
        val oi = o.toInt
        val id = new String(b, oi, 4, "US-ASCII")
        val size = leU32(b, oi + 4) & 0xFFFFFFFFL
        if (id == "fmt " && oi + 16 <= b.length)
          return Some(("wav", leU32(b, oi + 12), leU16(b, oi + 10)))
        o += 8L + size + (size & 1L) // chunks are word-aligned
      }
      None
    }
  }

  /** Deterministic minimal-container SYNTHESIZERS (fixture generation for
    * tests and the oracle row): structurally valid headers with real CRCs,
    * wrapping arbitrary content bytes. */
  object Synth {
    private def crc32(chunks: Array[Byte]*): Int = {
      val c = new java.util.zip.CRC32
      chunks.foreach(c.update)
      c.getValue.toInt
    }
    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
    }

    /** Minimal PNG: signature + IHDR(w, h, 8-bit RGB) + one IDAT carrying
      * `content` verbatim + IEND. Total length = content.length + 57. */
    def png(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = be32(width) ++ be32(height) ++
        Array[Byte](8, 2, 0, 0, 0) // bit depth 8, color RGB
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", content) ++ chunk("IEND", Array.emptyByteArray)
    }

    /** Minimal JPEG: SOI + SOF0(h, w, 3 components) + content + EOI.
      * Total length = content.length + 23. */
    def jpeg(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8,
        ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
        ((width >> 8) & 0xff).toByte, (width & 0xff).toByte, 3,
        1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ sof ++ content ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    /** Minimal GIF89a: header + logical screen descriptor (no GCT), the
      * content carried as a comment extension (0x21 0xFE, 255-byte
      * sub-blocks), then the 0x3B trailer. Total length =
      * content.length + 17 + ceil(content.length/255) (each sub-block
      * spends one length byte; 13 header + 2 ext intro + 1 block
      * terminator + 1 trailer). */
    def gif(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      val header = "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
        Array[Byte](0, 0, 0) // no GCT, bg 0, no aspect
      val blocks = content.grouped(255).flatMap(b => (b.length.toByte +: b.toSeq)).toArray
      header ++ Array[Byte](0x21, 0xFE.toByte) ++ blocks ++ Array[Byte](0, 0x3B)
    }

    /** Minimal WAV: RIFF/WAVE + PCM fmt chunk + data chunk = `content`. */
    def wav(sampleRate: Int, channels: Int, content: Array[Byte]): Array[Byte] = {
      def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val blockAlign = channels * 2
      val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
        le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(16)
      val data = content ++ (if (content.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
      "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + fmt.length + 8 + data.length) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
        "data".getBytes("US-ASCII") ++ le32(content.length) ++ data
    }
  }

  /** STUB fallback for payloads that are not real containers: a real build
    * would call a full codec here (via JNI or a vectorized Python worker)
    * for pixel/sample decode. The fake derives metadata as a pure function
    * of the payload bytes so tests are deterministic. */
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

  /** REAL-container payload synthesis for a doc (closed-form dims, so a
    * SQL oracle can recompute every field): image alternates PNG/JPEG,
    * audio is PCM WAV, video is GIF89a — all structurally valid (real
    * CRCs/descriptors) around the doc's text bytes, all parsed back by
    * [[MediaHeaders]] alone. This is the no-stub path: FakeCodec is never
    * consulted for these payloads. */
  def realPayloadFor(id: Long, text: String): (String, Array[Byte]) = {
    val content = text.getBytes("UTF-8")
    (id % 3) match {
      case 0 =>
        val w = (id % 512 + 1).toInt; val h = (id * 7 % 512 + 1).toInt
        ("image", if ((id / 3) % 2 == 0) Synth.png(w, h, content)
                  else Synth.jpeg(w, h, content))
      case 1 =>
        ("audio", Synth.wav((8000 + id % 32000).toInt, (id % 2 + 1).toInt, content))
      case _ =>
        ("video", Synth.gif((id % 256 + 1).toInt, (id * 3 % 256 + 1).toInt, content))
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
          // real header parse first; FakeCodec only for non-container bytes
          val (d1, d2) = MediaHeaders.decode(payload)
            .map { case (_, a, b) => (a, b) }
            .getOrElse(FakeCodec.decodeDims(payload, kind))
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
