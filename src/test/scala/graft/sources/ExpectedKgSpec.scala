package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** The plain-Scala xxHash64 mirror must be bit-identical to Spark's
  * `xxhash64` — it anchors the bnode ids of the flagship-pipeline oracle. */
class XxHash64MirrorSpec extends GraftSpec {
  import spark.implicits._

  test("hashString/hashInt chain == spark xxhash64(url, pos)") {
    val rows = (0 until 200).map { i =>
      (s"https://host$i.example.org/page/$i" * (1 + i % 5), i * 37)
    } ++ Seq(("", 0), ("x", 1), ("1234567", 2), ("12345678", 3),
      ("123456789012345678901234567890123456789", 4))
    val got = rows.toDF("u", "p")
      .select(xxhash64(col("u"), col("p"))).as[Long].collect()
    val want = rows.map { case (u, p) => XXH64.hashInt(p, XXH64.hashString(u, 42L)) }
    assert(got.toSeq == want)
  }

  test("single-string hash == spark xxhash64(s)") {
    val ss = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghabcdefghabcdefghabcdefgh-tail")
    val got = ss.toDF("s").select(xxhash64(col("s"))).as[Long].collect()
    val want = ss.map(XXH64.hashString(_, 42L))
    assert(got.toSeq == want)
  }
}

/** The closed-form expected quad set must equal the pipeline's bootstrap
  * output — the flagship oracle, checked in-suite before the driver's
  * DuckDB tri-check uses it. */
class ExpectedKgSpec extends GraftSpec {
  import spark.implicits._

  test("expected bootstrap quads == pipeline extractedQuads (canonicalized)") {
    val n = 80L
    val pages = PageGen.snapshot(spark, n, 0)
    val pipe = new graft.streaming.QuadLogPipeline(spark, tmpDir("ekg"),
      numBuckets = 4, canonicalize = true)
    val got = pipe.extractedQuads(pages)
      .select("s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
      .as[(String, String, String, Int, String, String, String)].collect().toSet
    val want = ExpectedKg.bootstrapQuads(n, 0)
      .map(q => (q.s, q.p, q.oLex, q.oKind, q.oDtype, q.oLang, q.g)).toSet
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(3)} extra=${extra.take(3)}")
  }
}
