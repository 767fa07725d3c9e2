package graft

import graft.sources.PageGen
import graft.streaming.QuadLogPipeline

/** Config self-assertion (reference vql_assert_configuration, utils.sql:3-19)
  * and the A4 dump-isolation assertion (vql_check_trx invalidation,
  * dump_nquads.sql:75-78). */
class PreflightSpec extends GraftSpec {

  test("preflight passes on a correctly configured session") {
    Preflight.assertSession(spark) // must not throw
  }

  test("preflight refuses a non-UTC session, like the reference refuses to run") {
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[RuntimeException](Preflight.assertSession(spark))
      assert(e.getMessage.contains("CONFIGURATION PROBLEM"))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }

  test("A4 dump isolation: a drifted input snapshot invalidates the dump loudly") {
    val pipe = new QuadLogPipeline(spark, tmpDir("graft_a4"), numBuckets = 4,
      canonicalize = false)
    val s0 = PageGen.snapshot(spark, 30, 0)
    val s1 = PageGen.snapshot(spark, 30, 1) // different content = drift
    val fp0 = pipe.snapshotFingerprint(s0)
    pipe.assertSnapshotStable(s0, fp0) // stable re-read passes
    val e = intercept[RuntimeException](pipe.assertSnapshotStable(s1, fp0))
    assert(e.getMessage.contains("INVALID"))
  }

  test("A4 wiring: bootstrap re-checks its input fingerprint after commit") {
    // normal bootstrap over an immutable snapshot must pass the assertion
    val pipe = new QuadLogPipeline(spark, tmpDir("graft_a4b"), numBuckets = 4,
      canonicalize = false)
    val r = pipe.bootstrap(PageGen.snapshot(spark, 20, 0), "e1", "00000000000000")
    assert(r.added > 0)
  }
}
