package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.XXH64

/** Large-scale training-data deduplication operators over a `documents`-shaped
  * table (doc_id, text, ...). Five strategies:
  *
  *  - exact: hash-groupBy on md5(text) — ONE shuffle keyed by digest
  *    (uniform, skew-free by construction).
  *  - minhash + banded LSH: shingle -> per-function min -> band buckets ->
  *    bucket self-join. The candidate join is keyed by (band, bucket), never
  *    by raw content, so hot shingles don't create hot partitions.
  *  - simhash: 64-bit sign-aggregated fingerprint; near-dups = equal
  *    fingerprints on rotated bands (Hamming-adjacent blocking).
  *  - n-gram Jaccard: exact verification on shingle sets, blocked by a
  *    shared-shingle join with per-pair combine, for candidate pairs.
  *  - embedding cosine: see [[Similarity]]; near-dup = cosine above a
  *    threshold within LSH sign-buckets.
  *
  * HOT-PATH SHAPE (same rule as [[Similarity]]): the joins/aggregations are
  * declarative, but per-document token loops (shingling, fingerprint bit
  * sums, per-function minima) run in typed `mapPartitions` — Spark's
  * higher-order array functions are CodegenFallback (interpreted, boxed),
  * and the 64-pass `aggregate()` fingerprint was measured as the dominant
  * cost of every simhash/minhash query. Column forms are kept (package-
  * private) as equivalence-test references; the DuckDB oracle additionally
  * certifies the typed forms end to end.
  *
  * At 10^12 docs the only quadratic danger is the candidate pair space; every
  * operator here bounds it by blocking (band buckets / fingerprints), which
  * is the standard web-scale recipe.
  */
object Dedup {

  /** Scale-adaptive fan-out for the typed per-document kernels: when the
    * input arrives in fewer partitions than the session's parallelism (the
    * small-file case — one parquet file under one split = ONE task for the
    * whole corpus), spread it round-robin so the hashing/shingling kernels
    * AND everything narrow downstream of them (the band self-joins run
    * broadcast, i.e. inherit this partitioning all the way to the first
    * exchange) use every core. A corpus that already arrives wide passes
    * through untouched — this is a floor on parallelism, not a constant
    * tuned to this box. Measured at sf0.1/local[32]: the minhash band-join
    * stage generated its 10M candidate rows in a single task without this. */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  // --- shingling -----------------------------------------------------------

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token array column.
    * Taking the array (not the text) matters: codegen does not eliminate
    * common subexpressions inside higher-order-function lambdas, so passing
    * `split(text)` here would re-split the text once per shingle position —
    * O(len²) per document. (Column form — equivalence reference.) */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => length(s) > 0))

  /** Convenience: docs(textCol) -> (id, toks) with shingles materialized. */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.withColumn("__words", split(col(textCol), " "))
      .select(col(idCol).as("id"), shinglesOf(col("__words"), n).as("toks"))
      .filter(size(col("toks")) > 0)

  /** Plain-Scala mirror of [[shinglesOf]] over split(text, " ") — identical
    * strings, first-occurrence-distinct, empty shingles dropped. */
  def shinglesScala(text: String, n: Int): Array[String] = {
    val toks = text.split(" ", -1)
    val last = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
      if (sb.length > 0) seen.add(sb.toString)
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  /** Typed shingle fan-out: (doc_id, sh) rows, distinct per document. */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        shinglesScala(text, n).map(sh => (id, sh))
      })
      .toDF("doc_id", "sh")
  }

  // --- portable (cross-engine) hashing --------------------------------------

  /** Plain-Scala mirror of the portable 60-bit hash used by the oracle-
    * checked queries: first 15 hex chars of md5(s + "#salt") as a long
    * (= Spark `conv(substr(md5(..),1,15),16,10)` = DuckDB
    * `('0x'||substr(md5(..),1,15))::BIGINT`). */
  def phashScala(md: java.security.MessageDigest, s: String, salt: Int): Long = {
    val d = md.digest((s + "#" + salt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Portable SimHash fingerprint over DISTINCT whitespace tokens: one typed
    * pass per document — md5 once per (token, salt), all `bits` counters
    * maintained in a single loop (the Column form ran `bits` separate
    * interpreted aggregate() passes, each re-hashing every token). */
  def portableSimhash(docs: DataFrame, bits: Int = 16, salt: Int = 99): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = bits
    widen(docs.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val counters = new Array[Int](b)
        it.map { case (id, text) =>
          java.util.Arrays.fill(counters, 0)
          val toks = text.split(" ", -1).distinct
          var ti = 0
          while (ti < toks.length) {
            val h = phashScala(md, toks(ti), salt)
            var bit = 0
            while (bit < b) {
              if (((h >> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
              bit += 1
            }
            ti += 1
          }
          var fp = 0L
          var bit = 0
          while (bit < b) { if (counters(bit) > 0) fp |= (1L << bit); bit += 1 }
          (id, fp)
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Portable MinHash signatures over DISTINCT whitespace tokens: all
    * `numHashes` per-function minima in one typed token loop.
    * Output: (doc_id, h0 .. h<numHashes-1>). */
  def portableMinhashSigs(docs: DataFrame, numHashes: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nh = numHashes
    val rows = widen(docs.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val mins = Array.fill(nh)(Long.MaxValue)
          val toks = text.split(" ", -1).distinct
          var ti = 0
          while (ti < toks.length) {
            var i = 0
            while (i < nh) {
              val h = phashScala(md, toks(ti), i)
              if (h < mins(i)) mins(i) = h
              i += 1
            }
            ti += 1
          }
          (id, mins.toSeq)
        }
      }
      .toDF("doc_id", "mins")
    rows.select((col("doc_id") +:
      (0 until nh).map(i => col("mins")(i).as(s"h$i"))): _*)
  }

  // --- operators -------------------------------------------------------------

  /** Exact dedup: canonical = min doc_id per identical text digest.
    * Returns (doc_id, canonical_id, group_size). */
  def exact(docs: DataFrame): DataFrame = {
    val withHash = docs.select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("digest"))
    val groups = withHash.groupBy("digest")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
    withHash.join(groups, Seq("digest"))
      .select("doc_id", "canonical_id", "group_size")
  }

  /** MinHash signatures over word-`n`-gram shingles.
    * (id, sig: array<bigint>) with `numHashes` functions. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame =
    graft.canon.MinHashBlocking.signatures(withShingles(docs, idCol, textCol, n), numHashes)

  /** MinHash-LSH near-duplicate candidate pairs (a < b), verified by
    * signature agreement >= `minAgree` of `numHashes` (estimated Jaccard). */
  def minhashPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
                   bands: Int = 8, minAgree: Int = 12): DataFrame = {
    val sigs = minhashSignatures(docs, "doc_id", "text", n, numHashes)
    val pairs = graft.canon.MinHashBlocking.candidatePairs(sigs, bands, numHashes / bands)
    val sa = sigs.select(col("id").as("a"), col("sig").as("siga"))
    val sb = sigs.select(col("id").as("b"), col("sig").as("sigb"))
    pairs.join(sa, Seq("a")).join(sb, Seq("b"))
      .withColumn("agree",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b)))
      .filter(col("agree") >= minAgree)
      .select(col("a"), col("b"), (col("agree") / numHashes.toDouble).as("est_jaccard"))
  }

  /** 64-bit SimHash over word 2-gram shingles: bit b of the fingerprint is
    * the sign of sum over shingles of (+1 if bit b of xxhash64(shingle)
    * else -1). Typed single-pass fingerprint (see object scaladoc); the
    * plain-Scala xxHash64 mirror is bit-identical to Spark's `xxhash64`
    * (XxHash64MirrorSpec). Docs with no shingles are omitted, like the
    * Column form's `size(toks) > 0` filter. */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              bits: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = bits
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val counters = new Array[Int](b)
        it.flatMap { case (id, text) =>
          val shs = shinglesScala(text, 2)
          if (shs.isEmpty) None
          else {
            java.util.Arrays.fill(counters, 0)
            var si = 0
            while (si < shs.length) {
              val h = XXH64.hashString(shs(si), 42L)
              var bit = 0
              while (bit < b) {
                if (((h >> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
                bit += 1
              }
              si += 1
            }
            var fp = 0L
            var bit = 0
            while (bit < b) { if (counters(bit) > 0) fp |= (1L << bit); bit += 1 }
            Some((id, fp))
          }
        }
      }
      .toDF("id", "simhash")
  }

  /** Column-expression SimHash (equivalence-test reference for [[simhash]];
    * interpreted HOFs — never the hot path). */
  private[operators] def simhashColumns(docs: DataFrame, idCol: String = "doc_id",
                                        textCol: String = "text", bits: Int = 64): DataFrame = {
    val withToks = withShingles(docs, idCol, textCol, 2)
    val bitCols = (0 until bits).map { b =>
      aggregate(col("toks"), lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
    }
    val fp = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(when(bitCols(b) > 0, shiftleft(lit(1L), b)).otherwise(0L))
    }
    withToks.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-duplicate pairs via Hamming-adjacent band blocking: the
    * `bits`-bit fingerprint splits into `bands` contiguous bit-slices; two
    * fingerprints within Hamming distance < `bands` must agree on at least
    * one slice (pigeonhole), so the equal-slice join finds every such pair
    * without an all-pairs comparison — the join key is (band, slice), a
    * bounded-cardinality uniform key, the same shape as the MinHash band
    * join. Candidates are verified by exact Hamming distance <= maxHamming
    * (bit_count of xor, pure codegen). */
  def simhashPairs(docs: DataFrame, bands: Int = 4, maxHamming: Int = 3,
                   bits: Int = 64): DataFrame = {
    require(bits % bands == 0, "bits must divide evenly into bands")
    require(maxHamming < bands, "pigeonhole guarantee needs maxHamming < bands")
    val bw = bits / bands
    val mask = if (bw == 64) -1L else (1L << bw) - 1L
    val fps = simhash(docs, bits = bits)
    val banded = fps.select(col("id"), col("simhash"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("simhash"), b * bw).bitwiseAND(mask)
      }: _*)).as(Seq("band", "key")))
    val l = banded.select(col("band"), col("key"), col("id").as("a"), col("simhash").as("fa"))
    val r = banded.select(col("band"), col("key"), col("id").as("b"), col("simhash").as("fb"))
    l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("fa"), col("fb")).distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for pairs blocked by a shared rare
    * shingle. The shared-shingle join is bounded per shingle by `maxBucket`
    * (drop ubiquitous shingles — the classic stopword-block guard, and the
    * explicit skew handling: a shingle appearing in 10^6 docs would
    * otherwise create 10^12 pairs). Shingling is the typed fan-out; the
    * blocking join and per-pair combine stay declarative. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        maxBucket: Int = 64): DataFrame = {
    // materialize the shingle fan-out ONCE: it feeds FIVE consumers (the
    // rare-shingle count, both sides of the blocking join, and the two size
    // lookups), and Spark performs no common-subexpression elimination
    // across join branches — lazily each consumer re-ran the typed
    // shingling mapPartitions over the corpus and the rare aggregation ran
    // three times (measured: 5 parquet scans + 3 identical count exchanges
    // in one query plan). The shingle rows are corpus-token-sized, far
    // smaller than the pair space the query must materialize anyway.
    val exploded = shingleRows(docs, "doc_id", "text", n).localCheckpoint()
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val rare = exploded.groupBy("sh").count().filter(col("count") <= maxBucket)
    // checkpoint the pruned stream too: both sides of the self-join consume
    // it, and each side would otherwise re-run the rare-count exchange
    val pruned = exploded.join(rare.select("sh"), Seq("sh"), "left_semi")
      .localCheckpoint()
    val l = pruned.select(col("sh"), col("doc_id").as("a"))
    val r = pruned.select(col("sh"), col("doc_id").as("b"))
    val common = l.join(r, Seq("sh")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("n_toks").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_toks").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Full near-dup clustering: pairs -> connected components -> canonical id
    * per cluster (min doc id). */
  def clusters(spark: org.apache.spark.sql.SparkSession, pairs: DataFrame): DataFrame =
    graft.canon.ConnectedComponents.run(spark,
      pairs.select(col("a").cast("string").as("src"), col("b").cast("string").as("dst")))

  /** Decontamination n-gram overlap (the train-vs-eval leakage check every
    * training-data pipeline needs): for each CORPUS document, the number of
    * distinct word n-gram shingles it shares with ANY benchmark document.
    * `shared >= threshold` is the usual contamination verdict.
    *
    * Scale shape: the benchmark shingle set is small (eval suites are
    * thousands of docs) -> it arrives as a broadcast LEFT-SEMI filter on
    * the corpus shingle stream; the corpus side is ONE narrow pass +
    * one aggregation keyed by doc id. Never a corpus-x-benchmark join. */
  def contaminationOverlap(corpus: DataFrame, benchmark: DataFrame,
                           n: Int = 3, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val corpusSh = shingleRows(corpus, idCol, textCol, n)
    val benchSh = broadcast(
      shingleRows(benchmark, idCol, textCol, n).select("sh").distinct())
    val hits = corpusSh.join(benchSh, Seq("sh"), "left_semi")
      .groupBy(idCol).agg(count_distinct(col("sh")).as("shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("shared"), lit(0L)).as("shared"))
  }
}
