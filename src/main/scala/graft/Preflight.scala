package graft

import org.apache.spark.sql.SparkSession

/** Session-configuration self-assertion — the Spark re-expression of the
  * reference's `vql_assert_configuration` (utils.sql:3-19) and the runtime
  * self-check in generate-rdfpatch.sh:167-174: the engine REFUSES to run on
  * a session whose settings would silently corrupt its output, instead of
  * producing wrong timestamps/paths that surface batches later.
  *
  * Checked invariants (only what the engine genuinely depends on):
  *  - session time zone UTC — every ts14/ISO conversion in patch headers,
  *    file names and lineage watermarks assumes it;
  *  - a sane positive `spark.sql.shuffle.partitions` — the stores' bucket
  *    exchanges rely on it parsing as an int (AQE may coalesce further).
  *
  * Wired into all three driver mains (Verify, Bench/Smoke) and the
  * [[graft.streaming.QuadLogPipeline]] constructor, so library users get
  * the same guard.
  */
object Preflight {

  def assertSession(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
    if (!Set("UTC", "Etc/UTC", "GMT", "Z").contains(tz))
      fail(s"spark.sql.session.timeZone is '$tz' but the quad-log engine " +
        "requires UTC: checkpoint ids (ts14), patch-header timestamps and " +
        "lineage watermarks are serialized in UTC")
    val sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
    if (!sp.matches("-?\\d+") || sp.toInt <= 0)
      fail(s"spark.sql.shuffle.partitions is '$sp' — must be a positive int " +
        "(store bucket exchanges depend on it)")
  }

  private def fail(msg: String): Nothing =
    sys.error("graft preflight: CONFIGURATION PROBLEM. " + msg +
      " (reference: vql_assert_configuration, utils.sql:3-19 refuses to run " +
      "misconfigured; so do we)")
}
