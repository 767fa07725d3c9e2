package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

class DedupSpec extends GraftSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words appear in this text here"),
    (5L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")

  test("exact dedup groups identical texts under min id") {
    val rows = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet.contains((1L, 1L, 2L)) && rows.toSet.contains((2L, 1L, 2L)))
    assert(rows.count(_._3 == 1L) == 3)
  }

  test("minhash-LSH finds the near-dup pair and not the unrelated one") {
    val pairs = Dedup.minhashPairs(docs, n = 2, numHashes = 16, bands = 8, minAgree = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical -> all bands agree
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhash: identical docs get identical fingerprints; unrelated differ") {
    val fp = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(5L))
    // near-dup is Hamming-close
    val ham = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val far = java.lang.Long.bitCount(fp(1L) ^ fp(5L))
    assert(ham < far, s"hamming near=$ham far=$far")
  }

  test("ngram jaccard: exact dup scores 1.0, near dup high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.3, maxBucket = 10)
      .as[(Long, Long, Double)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9)
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.keys.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("clusters: dup group resolves to one component") {
    val pairs = Dedup.minhashPairs(docs, n = 2, numHashes = 16, bands = 8, minAgree = 6)
    val comps = Dedup.clusters(spark, pairs).as[(String, String)].collect().toMap
    assert(comps("1") == comps("2") && comps("2") == comps("3"))
  }
}

class SimilaritySpec extends GraftSpec {
  import spark.implicits._

  // deterministic embeddings: orthogonal-ish with one near-duplicate pair
  private def vec(seed: Int): Seq[Float] =
    (0 until 16).map(i => (((seed * 31 + i * 17) % 7) - 3).toFloat / 3f)
  private val em = (Seq((0L, vec(1)), (1L, vec(1).map(v => v * 0.99f)), (2L, vec(5)),
    (3L, vec(9)), (4L, vec(13))) ).toDF("vec_id", "embedding")

  test("brute-force top-k: the near-duplicate is rank 1 with sim ~ 1") {
    val res = Similarity.bruteForceTopK(em, em.filter($"vec_id" === 0), 2)
      .as[(Long, Long, Int, Double)].collect()
    val top = res.find(_._3 == 1).get
    assert(top._2 == 1L && top._4 > 0.999)
  }

  test("lsh top-k agrees with brute force for same-bucket vectors") {
    val brute = Similarity.bruteForceTopK(em, em, 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(em, 1, planes = 4, dim = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    // 0 and 1 share sign pattern -> found in both
    assert(lsh.get(0L) == brute.get(0L) || lsh.get(0L).contains(1L))
  }

  test("ivf top-k: probing the query's cell finds the planted near-duplicate") {
    val cents = Seq((0, vec(1).map(_.toDouble).toArray),
      (1, vec(5).map(_.toDouble).toArray))
    val res = Similarity.ivfTopK(em, col("vec_id") < 2, 1, cents)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    assert(res(0L) == 1L && res(1L) == 0L) // same cell, mutual nearest
  }

  test("maxBucket cap bounds the pair space on a skew-sign corpus") {
    // all-positive embeddings (post-ReLU shape): raw component signs would
    // collapse every row into ONE bucket and the self-join would go
    // quadratic; the cap drops the degenerate bucket instead
    val skew = (0L until 200L).map(i =>
      (i, (0 until 16).map(j => 1f + ((i * 17 + j) % 5) / 10f))).toDF("vec_id", "embedding")
    // seeded +-1 hyperplanes still split all-positive vectors across
    // buckets; force the degenerate case with planes = 0 (single bucket)
    val capped = Similarity.lshTopK(skew, 3, planes = 0, dim = 16, maxBucket = 100)
    assert(capped.count() == 0, "degenerate bucket must be dropped, not joined")
    val pairsCapped = Similarity.cosineNearDupPairs(skew, 0.0, planes = 0, dim = 16,
      maxBucket = 100)
    assert(pairsCapped.count() == 0)
    // and with the cap satisfied, results flow normally
    val ok = Similarity.lshTopK(skew, 1, planes = 0, dim = 16, maxBucket = 200)
    assert(ok.count() > 0)
  }

  test("cosine near-dup pairs finds only the planted pair at high threshold") {
    val withLabel = em.withColumn("label", lit(0))
    val pairs = Similarity.cosineNearDupPairs(withLabel, 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}

class TextAnalysisSpec extends GraftSpec {
  import spark.implicits._

  test("language id picks the marker-dominant language deterministically") {
    val df = Seq(
      (1L, "the cat of a house the end"),     // en
      (2L, "el gato de la casa de la calle"), // es
      (3L, "der hund und die katze und der"), // de
      (4L, "xx yy zz")).toDF("doc_id", "text") // no markers -> tie -> 'de' (lex first)
    val got = df.select($"doc_id", TextAnalysis.langGuess($"text")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de" && got(4L) == "de")
  }

  test("quality metrics are integer-exact") {
    val m = TextAnalysis.qualityMetrics(Seq((1L, "the big, big dog")).toDF("doc_id", "text"))
      .select("n_chars", "n_tokens", "n_stopwords", "n_punct", "max_token_len")
      .head()
    assert(m.getInt(0) == 16 && m.getInt(1) == 4 && m.getInt(2) == 1 &&
      m.getInt(3) == 1 && m.getInt(4) == 4)
  }

  test("fingerprint: stable, whitespace-normalized, case-insensitive") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text")).as[(Long, Long)]
      .collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("token counting: whitespace and subword variants") {
    val df = Seq((1L, "don't stop, believing 123")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.subwordCount($"text")).head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) > 4) // punctuation splits add tokens
  }
}

class CurationSpec extends GraftSpec {
  import spark.implicits._

  test("repetitionStats: top bigram with deterministic tie-break; degenerate docs") {
    val docs = Seq(
      (1L, "a b a b a b c"),     // "a b" x3, "b a" x2
      (2L, "x y z"),             // all bigrams unique -> tie -> smallest
      (3L, "solo"),              // no bigram
      (4L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == ((7L, "a b", 3L)))
    assert(out(2L) == ((3L, "x y", 1L)), "tie must break to smallest bigram")
    assert(out(3L) == ((1L, "", 0L)))
    assert(out(4L) == ((1L, "", 0L))) // split of "" yields one empty token
  }

  test("contaminationOverlap: planted leak found, clean docs score zero") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 2 shingles
      (2L, "one two three four five"),        // disjoint
      (3L, "zz alpha beta gamma yy")          // shares 1 ("alpha beta gamma")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.contaminationOverlap(corpus, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 1L))
  }

  test("maskPii: emails and phones masked with exact counts; clean text untouched") {
    val docs = Seq(
      (1L, "reach me at jo.doe+spam@mail.example.co.uk today"),
      (2L, "call 555-123-4567 or 555 987 6543 now"),
      (3L, "no pii here at all"),
      (4L, "a@b.io and 111-222-3333 mixed")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.maskPii(docs)
      .select("doc_id", "n_emails", "n_phones", "masked")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 0L, "reach me at <EMAIL> today")))
    assert(out(2L) == ((0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(out(3L) == ((0L, 0L, "no pii here at all")))
    assert(out(4L) == ((1L, 1L, "<EMAIL> and <PHONE> mixed")))
  }

  test("deterministicSplit: stable membership, roughly weighted, grows without reshuffle") {
    val docs = (0L until 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val s1 = graft.operators.TextAnalysis.deterministicSplit(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val byS = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byS("train") > 850 && byS("train") < 950, s"train=${byS("train")}")
    assert(byS.keySet == Set("train", "val", "test"))
    // growth stability: the first 500 docs keep their split when 500 more exist
    val s2 = graft.operators.TextAnalysis.deterministicSplit(
        (0L until 500L).map(i => (i, s"t$i")).toDF("doc_id", "text"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s2.forall { case (id, sp) => s1(id) == sp })
  }
}

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"))
    .toDF("doc_id", "text")

  test("binary payload plumbing: schema, determinism, metadata extraction") {
    val media = Multimodal.withFakePayload(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val metas = Multimodal.extractMeta(spark, media).collect().sortBy(_.doc_id)
    assert(metas.length == 4)
    assert(metas.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    // deterministic: second run identical
    val again = Multimodal.extractMeta(spark, media).collect().sortBy(_.doc_id)
    assert(metas.toSeq == again.toSeq)
    // declarative path agrees on byte length
    val viaCols = Multimodal.metaColumns(media).select("doc_id", "byte_len")
      .as[(Long, Int)].collect().toMap
    assert(metas.forall(m => viaCols(m.doc_id) == m.byte_len))
  }

  test("frame-sample plan explodes stubbed frame counts with stride") {
    val media = Multimodal.withFakePayload(docs)
    val frames = Multimodal.frameSamplePlan(spark, media, stride = 10)
    val byDoc = frames.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc.nonEmpty)
    assert(frames.select("frame").as[Int].collect().forall(f => f % 10 == 0))
  }

  test("MediaHeaders parses golden fixed-byte PNG/JPEG/GIF/WAV headers") {
    import Multimodal.MediaHeaders
    // golden PNG: hand-laid signature + IHDR for 640x480 (big-endian u32s
    // at 16/20) — independent of the Synth builder
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, // width 640
      0, 0, 0x01, 0xe0, // height 480
      8, 2, 0, 0, 0).map(_.toByte)
    assert(MediaHeaders.decode(png).contains(("png", 640, 480)))

    // golden JPEG: SOI + APP0 segment (skipped by the scan) + SOF0 1x2,
    // height u16 at +5, width at +7 into the SOF segment
    val jpeg = Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x01, 0x01, 0x01, 0x11, 0x00)
      .map(_.toByte)
    assert(MediaHeaders.decode(jpeg).contains(("jpeg", 1, 2)))

    // golden GIF89a: 320x200 little-endian u16 at 6/8
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xc8, 0x00, 0, 0, 0).map(_.toByte)
    assert(MediaHeaders.decode(gif).contains(("gif", 320, 200)))

    // golden WAV: RIFF/WAVE + PCM fmt (44100 Hz stereo)
    val wav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      Array(0x01, 0x00, 0x02, 0x00, 0x44, 0xac, 0x00, 0x00).map(_.toByte) ++
      Array.fill[Byte](8)(0)
    assert(MediaHeaders.decode(wav).contains(("wav", 44100, 2)))

    // non-container bytes -> None (FakeCodec fallback territory)
    assert(MediaHeaders.decode("not media".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.decode(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.decode(null).isEmpty)
    // truncated containers must not throw
    assert(MediaHeaders.decode(png.take(12)).isEmpty)
    assert(MediaHeaders.decode(jpeg.take(9)).isEmpty)

    // adversarial WAV: a chunk whose size field reads as -8 signed
    // (0xFFFFFFF8) made the old cursor arithmetic non-advancing — an
    // infinite loop in an executor task fed crawled bytes. Must terminate
    // (unsigned math overshoots the buffer and exits) and return None.
    val evilWav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](100, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++
      Array(0xf8, 0xff, 0xff, 0xff).map(_.toByte) ++ // size = -8 signed
      Array.fill[Byte](32)(0)
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[Option[(String, Int, Int)]] {
        def call() = MediaHeaders.decode(evilWav)
      })
      assert(fut.get(5, java.util.concurrent.TimeUnit.SECONDS).isEmpty)
    } finally done.shutdownNow()
  }

  test("Synth containers round-trip through MediaHeaders and java ImageIO-free checks") {
    import Multimodal.{MediaHeaders, Synth}
    val content = "payload-bytes".getBytes("UTF-8")
    assert(MediaHeaders.decode(Synth.png(1023, 7, content)).contains(("png", 1023, 7)))
    assert(MediaHeaders.decode(Synth.jpeg(510, 4096, content)).contains(("jpeg", 510, 4096)))
    assert(MediaHeaders.decode(Synth.wav(16000, 1, content)).contains(("wav", 16000, 1)))
    assert(MediaHeaders.decode(Synth.gif(255, 99, content)).contains(("gif", 255, 99)))
    // length closed forms the oracle SQL relies on
    assert(Synth.png(10, 10, content).length == content.length + 57)
    assert(Synth.jpeg(10, 10, content).length == content.length + 23)
    assert(Synth.wav(8000, 2, content).length ==
      44 + content.length + content.length % 2)
    assert(Synth.gif(1, 1, content).length ==
      content.length + 17 + (content.length + 254) / 255)
    // gif closed form holds across the sub-block boundary (255-byte chunks)
    for (n <- Seq(0, 254, 255, 256, 510, 700)) {
      val c = Array.fill[Byte](n)(7)
      assert(Synth.gif(3, 4, c).length == n + 17 + (n + 254) / 255, s"gif len n=$n")
      assert(MediaHeaders.decode(Synth.gif(3, 4, c)).contains(("gif", 3, 4)))
    }
    // realPayloadFor: every kind decodes with MediaHeaders alone (no-stub path)
    for (id <- 0L to 8L) {
      val (kind, payload) = Multimodal.realPayloadFor(id, "some text " * (id.toInt + 1))
      val parsed = Multimodal.MediaHeaders.decode(payload)
      assert(parsed.nonEmpty, s"id=$id kind=$kind did not parse")
      val container = parsed.get._1
      assert((kind, container) match {
        case ("image", "png" | "jpeg") => true
        case ("audio", "wav") => true
        case ("video", "gif") => true
        case _ => false
      }, s"id=$id kind=$kind container=$container")
    }
    // PNG chunk CRCs are REAL (a strict reader would reject bad CRCs):
    // verify the IHDR crc against an independent computation
    val p = Synth.png(640, 480, Array.emptyByteArray)
    val crc = new java.util.zip.CRC32
    crc.update(p, 12, 4 + 13) // type + data
    val stored = ((p(29) & 0xff) << 24) | ((p(30) & 0xff) << 16) |
      ((p(31) & 0xff) << 8) | (p(32) & 0xff)
    assert(stored == crc.getValue.toInt)
    // extractMeta prefers the real parse over FakeCodec for container bytes
    val media = Seq((1L, "image", Synth.png(321, 123, content)))
      .toDF("doc_id", "kind", "payload")
    val meta = Multimodal.extractMeta(spark, media).head()
    assert(meta.dim1 == 321 && meta.dim2 == 123)
  }
}
