package graft.plans

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Determinism and chunking contracts of the patch-file sink: byte-identical
  * re-runs (S5/T7 — idempotent rewrite), maxq enforcement, and contiguous
  * serials across multi-sub-stream graphs (the data-proportional fan-out). */
class PatchWriterSpec extends GraftSpec {
  import spark.implicits._

  private def quads(n: Int, graphs: Int) = (0 until n).map { i =>
    ("+", s"http://s$i", "http://p", s"o$i", 0, "", "", s"http://g${i % graphs}.example.org")
  }.toDF("op", "s", "p", "oLex", "oKind", "oDtype", "oLang", "g")

  private def dirBytes(dir: String): Map[String, String] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.startsWith("rdf_out_"))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md = java.security.MessageDigest.getInstance("MD5")
        s"${f.getParentFile.getName}/${f.getName}" ->
          md.digest(bytes).map("%02x".format(_)).mkString
      }.toMap
  }

  test("re-running the writer produces byte-identical files (deterministic sink)") {
    val df = quads(5000, 3)
    val d1 = tmpDir("pw_det1"); val d2 = tmpDir("pw_det2")
    val f1 = PatchWriter.write(spark, df, d1, "00000000000000", maxq = 400)
    val f2 = PatchWriter.write(spark, df, d2, "00000000000000", maxq = 400)
    assert(f1 == f2)
    val b1 = dirBytes(d1); val b2 = dirBytes(d2)
    assert(b1 == b2, "file set + contents must be identical")
  }

  test("multi-sub graphs: every file <= maxq, serials contiguous from 0, no quad lost") {
    val df = quads(6000, 2) // 3000/graph, maxq 500 -> nSubs=6 per graph
    val dir = tmpDir("pw_subs")
    PatchWriter.write(spark, df, dir, "00000000000000", maxq = 500)
    val root = new java.io.File(dir)
    var total = 0L
    root.listFiles().filter(_.isDirectory).foreach { gdir =>
      val files = gdir.listFiles().filter(_.getName.startsWith("rdf_out_"))
      val serials = files.map(_.getName.split("-")(1).toLong).sorted
      assert(serials.head == 0 && serials.toSeq == (0L until serials.length).toSeq,
        s"serials must be contiguous from 0 in ${gdir.getName}: ${serials.toSeq}")
      files.foreach { f =>
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
        val body = lines.count(l => l.startsWith("+") || l.startsWith("-"))
        assert(body <= 500, s"file ${f.getName} exceeds maxq")
        val amount = lines.find(_.startsWith("# amount")).get
          .substring("# amount         ".length).trim.toLong
        assert(amount == body)
        total += body
      }
    }
    assert(total == 6000, "every quad lands in exactly one file")
  }
}
