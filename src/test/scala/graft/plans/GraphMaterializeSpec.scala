package graft.plans

import graft.GraftSpec
import org.apache.spark.sql.functions._

class GraphMaterializeSpec extends GraftSpec {
  import spark.implicits._

  test("hub subject pages correctly: bounded pages, all edges kept, ordered") {
    // hub with 10 edges, normal subject with 2, singleton with 1
    val edges = ((1 to 10).map(i => ("hub", f"e$i%02d")) ++
      Seq(("n", "x"), ("n", "y"), ("solo", "z"))).toDF("s", "e")
    val pages = GraphMaterialize.adjacencyPages(edges, numBuckets = 4, pageSize = 3)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getSeq[String](4)))
      .sortBy(p => (p._1, p._2))
    val hub = pages.filter(_._1 == "hub")
    assert(hub.map(_._2).toSeq == Seq(0, 1, 2, 3), "page ids 0..3")
    assert(hub.map(_._3).toSeq == Seq(3, 3, 3, 1), "page sizes <= pageSize")
    assert(hub.flatMap(_._4).toSeq == (1 to 10).map(i => f"e$i%02d"),
      "all edges, sorted, no loss across page cuts")
    assert(pages.filter(_._1 == "n").map(_._4.toSeq).toSeq == Seq(Seq("x", "y")))
    assert(pages.filter(_._1 == "solo").map(_._3).toSeq == Seq(1))
    // page counter resets per subject, never leaks across subjects
    assert(pages.filter(_._1 != "hub").forall(_._2 == 0))
  }

  test("subject-hash layout round-trips and co-locates each subject in one bucket") {
    val edges = (0 until 200).map(i => (s"s${i % 37}", s"e$i")).toDF("s", "e")
    val pages = GraphMaterialize.adjacencyPages(edges, numBuckets = 8, pageSize = 100)
    // every subject maps to exactly one bucket (join-side pruning invariant)
    val perSubject = pages.groupBy("s").agg(countDistinct("bucket").as("nb"))
    assert(perSubject.filter(col("nb") =!= 1).count() == 0)
    val out = tmpDir("adj") + "/t"
    GraphMaterialize.writeAdjacency(pages, out)
    // physical layout: one dir per bucket; read-back preserves all edges
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).toSeq
    assert(dirs.nonEmpty && dirs.size <= 8)
    val back = spark.read.parquet(out)
    assert(back.select(explode(col("adj"))).count() == 200)
  }

  test("quadEdges formats literal vs IRI objects distinctly") {
    val quads = Seq(
      ("http://s", "http://p", "http://o", graft.model.TermKind.Iri, "", "", "http://g"),
      ("http://s", "http://p", "http://o", graft.model.TermKind.Literal, "", "", "http://g"))
      .toDF("s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
    val es = GraphMaterialize.quadEdges(quads).select("e").as[String].collect().toSet
    assert(es == Set("http://p <http://o>", "http://p \"http://o\""))
  }
}
