package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** The dedup/ANN hot paths are typed mapPartitions loops (see the
  * Similarity/Dedup scaladocs); these specs prove each typed kernel
  * BIT-IDENTICAL to its declarative Column reference on adversarial inputs
  * (empty strings, repeated separators, unicode, negative/positive-skew
  * vectors) — the same contract ExtractorEquivalenceSpec enforces for the
  * extraction hot path. The DuckDB oracle rows certify the typed forms
  * end-to-end against an independent engine on top of this. */
class TypedEquivalenceSpec extends GraftSpec {
  import spark.implicits._

  private val texts = Seq(
    "", " ", "a", "a b", "a  b   c", "the quick brown fox the quick brown",
    "über straße 東京 漢字 a b", "x y x y x y x y", "trailing space ",
    " leading", "tab\tinside stays one-token")
  private val docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("phashScala == Column conv(substr(md5)) portable hash") {
    val toks = Seq("a", "b", "the", "über", "", "東京", "#", "x#7")
    for (salt <- Seq(0, 1, 3, 99)) {
      val expected = toks.toDF("t")
        .select(conv(substring(md5(concat(col("t"), lit(s"#$salt"))), 1, 15), 16, 10)
          .cast("long"))
        .as[Long].collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      toks.zip(expected).foreach { case (tok, e) =>
        assert(Dedup.phashScala(md, tok, salt) == e, s"tok=$tok salt=$salt")
      }
    }
  }

  test("shinglesScala == shinglesOf Column form (strings and order)") {
    for (n <- Seq(1, 2, 3)) {
      val colForm = docs.withColumn("__w", split(col("text"), " "))
        .select(col("doc_id"), Dedup.shinglesOf(col("__w"), n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(Dedup.shinglesScala(t, n).toSeq == colForm(i.toLong), s"n=$n text='$t'")
      }
    }
  }

  test("typed simhash == Column simhash (incl. empty-shingle doc omission)") {
    val typed = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val cols = Dedup.simhashColumns(docs).as[(Long, Long)].collect().toMap
    assert(typed == cols)
    assert(!typed.contains(0L), "empty text has no shingles -> omitted")
  }

  private def vec(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(j => ((((seed * 31 + j * 17) % 13) - 6).toFloat / 5f))
  private val em = ((0 until 24).map(i => (i.toLong, vec(i, 16))) ++
    Seq((100L, (0 until 16).map(_ => 0.7f)))) // all-positive skew row
    .toDF("vec_id", "embedding")

  test("typed hyperplane bucket == Column bucket") {
    val colB = em.select(col("vec_id"),
        Similarity.hyperplaneBucket(col("embedding"), 5, 16).as("bucket"))
      .as[(Long, Long)].collect().toMap
    val typedB = Similarity.withBucket(em, 5, 16, 42)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(typedB == colB)
  }

  test("cosineScala == Column cosine, bit-exact") {
    val colCos = em.as("l").crossJoin(em.as("r"))
      .select(col("l.vec_id"), col("r.vec_id"),
        Similarity.cosine(col("l.embedding"), col("r.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
    val vecs = em.as[(Long, Seq[Float])].collect().toMap
    colCos.foreach { case (a, b, c) =>
      val s = Similarity.cosineScala(vecs(a), vecs(b))
      assert(java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(c),
        s"cosine($a,$b): scala=$s column=$c")
    }
  }

  test("kmeans centroids: deterministic, k cells, assignment ties stable") {
    val c1 = Similarity.kmeansCentroids(em, k = 4, sampleSize = 16, iters = 3)
    val c2 = Similarity.kmeansCentroids(em, k = 4, sampleSize = 16, iters = 3)
    assert(c1.map(_._1) == Seq(0, 1, 2, 3))
    assert(c1.zip(c2).forall { case ((i, v), (j, w)) => i == j && v.sameElements(w) })
    val cells = Similarity.cellAssign(em, c1, nProbe = 1)
    assert(cells.count() == em.count()) // exactly one cell per row
    // nProbe=2 emits two distinct cells per row
    val probed = Similarity.cellAssign(em, c1, nProbe = 2)
      .groupBy("vec_id").agg(countDistinct("cell").as("n")).as[(Long, Long)].collect()
    assert(probed.forall(_._2 == 2))
  }

  test("ivfTopK with nProbe=2 finds at least the nProbe=1 neighbours' quality") {
    val cents = Similarity.kmeansCentroids(em, k = 3, sampleSize = 16, iters = 3)
    val r1 = Similarity.ivfTopK(em, col("vec_id") < 6, 2, cents, nProbe = 1)
    val r2 = Similarity.ivfTopK(em, col("vec_id") < 6, 2, cents, nProbe = 2)
    // more probes can only widen the candidate set
    assert(r2.count() >= r1.count())
  }

  test("portable simhash/minhash typed forms: distinct-token semantics") {
    // identical after token-dedup -> identical fingerprint & signature
    val d = Seq((1L, "a b a b c"), (2L, "c b a"), (3L, "z q w"))
      .toDF("doc_id", "text")
    val fp = Dedup.portableSimhash(d, bits = 16, salt = 99)
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    val sig = Dedup.portableMinhashSigs(d, numHashes = 4)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(sig(1L) == sig(2L) && sig(1L) != sig(3L))
  }
}
