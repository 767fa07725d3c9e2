package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over a `documents`-shaped
  * table (doc_id, text, ...). Five strategies, all declarative:
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
  * At 10^12 docs the only quadratic danger is the candidate pair space; every
  * operator here bounds it by blocking (band buckets / fingerprints), which
  * is the standard web-scale recipe.
  */
object Dedup {

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token array column.
    * Taking the array (not the text) matters: codegen does not eliminate
    * common subexpressions inside higher-order-function lambdas, so passing
    * `split(text)` here would re-split the text once per shingle position —
    * O(len²) per document. */
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

  /** 64-bit SimHash over word shingles: bit b of the fingerprint is the sign
    * of sum over shingles of (+1 if bit b of xxhash64(shingle) else -1).
    * Pure expressions: per-bit sums via aggregate(), no UDF. */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              bits: Int = 64): DataFrame = {
    val withToks = withShingles(docs, idCol, textCol, 2)
    // bit b counter: sum(+-1) over tokens; fingerprint bit = (count > 0)
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
    * otherwise create 10^12 pairs). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        maxBucket: Int = 64): DataFrame = {
    val toks = withShingles(docs, "doc_id", "text", n)
      .withColumnRenamed("id", "doc_id")
    val sizes = toks.select(col("doc_id"), size(col("toks")).as("n_toks"))
    val exploded = toks.select(col("doc_id"), explode(col("toks")).as("sh"))
    val rare = exploded.groupBy("sh").count().filter(col("count") <= maxBucket)
    val pruned = exploded.join(rare.select("sh"), Seq("sh"), "left_semi")
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
}
