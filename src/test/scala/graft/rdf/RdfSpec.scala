package graft.rdf

import graft.GraftSpec
import graft.model.{Quad, TermKind}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Escaping ladder + N-Quad serialization, against the semantics of the
  * reference's utils.sql:23-103 and the special-chars.nt torture corpus
  * (example-virtuoso-server — cases reproduced here, not copied). */
class EscapingSpec extends GraftSpec {

  test("ladder order: backslash escaped first, exactly once") {
    assert(Escaping.escape("a\\b") == "a\\\\b")
    assert(Escaping.escape("\\\t") == "\\\\\\t") // backslash then tab
    assert(Escaping.escape("\t") == "\\t")
    assert(Escaping.escape("\n") == "\\n")
    assert(Escaping.escape("\r") == "\\r")
    assert(Escaping.escape("\f") == "\\f")
    assert(Escaping.escape("\b") == "\\b")
    assert(Escaping.escape("\u0007") == "\\a")
    assert(Escaping.escape("say \"hi\"") == "say \\\"hi\\\"")
    // single quote passes through (utils.sql:79-80 non-invertible case)
    assert(Escaping.escape("it's") == "it's")
  }

  test("column form is byte-identical to the scala form") {
    import spark.implicits._
    val gnarly = Seq("a\\b", "t\ta", "n\nn", "quote\"q", "mix\\\t\"\n\r\f\bend", "plain")
    val viaCol = gnarly.toDF("s").select(Escaping.escape(col("s"))).as[String].collect()
    assert(viaCol.toSeq == gnarly.map(Escaping.escape))
  }

  test("property: escape is invertible for chars in the ladder domain") {
    val safe = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\\', '\t', '\n', '\r', '\f', '\b', '\u0007', '"', ' ')))
      .map(_.mkString)
    val prop = Prop.forAll(safe) { s => Escaping.unescape(Escaping.escape(s)) == s }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}

class NQuadFormatterSpec extends GraftSpec {
  import spark.implicits._

  private def line(q: Quad, op: String = "+"): String = {
    val df = Seq(q).toDF().withColumn("op", lit(op))
    df.select(NQuadFormatter.patchLineCol(df)).as[String].head()
  }

  test("IRI object") {
    assert(line(Quad("http://s", "http://p", "http://o", TermKind.Iri, "", "", "http://g"))
      == "+ <http://s> <http://p> <http://o> <http://g> .")
  }
  test("plain literal and xsd:string are serialized identically (utils.sql:60)") {
    val plain = line(Quad("http://s", "http://p", "v", TermKind.Literal, "", "", "http://g"))
    val typed = line(Quad("http://s", "http://p", "v", TermKind.Literal,
      NQuadFormatter.XsdString, "", "http://g"))
    assert(plain == typed)
    assert(plain == "+ <http://s> <http://p> \"v\" <http://g> .")
  }
  test("lang tag wins over datatype (utils.sql:57-62)") {
    assert(line(Quad("http://s", "http://p", "hoi", TermKind.Literal,
      "http://www.w3.org/2001/XMLSchema#integer", "nl", "http://g"))
      == "+ <http://s> <http://p> \"hoi\"@nl <http://g> .")
  }
  test("typed literal") {
    assert(line(Quad("http://s", "http://p", "3", TermKind.Literal,
      "http://www.w3.org/2001/XMLSchema#integer", "", "http://g"), "-")
      == "- <http://s> <http://p> \"3\"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g> .")
  }
  test("blank node subject and object") {
    assert(line(Quad("_:b1", "http://p", "b2", TermKind.Bnode, "", "", "http://g"))
      == "+ _:b1 <http://p> _:b2 <http://g> .")
  }
  test("escaped literal content") {
    assert(line(Quad("http://s", "http://p", "a\"b\\c\td", TermKind.Literal, "", "", "http://g"))
      == "+ <http://s> <http://p> \"a\\\"b\\\\c\\td\" <http://g> .")
  }

  test("parser round-trips formatter output") {
    val quads = Seq(
      Quad("http://s", "http://p", "http://o", TermKind.Iri, "", "", "http://g"),
      Quad("http://s", "http://p", "v w", TermKind.Literal, "", "", "http://g"),
      Quad("http://s", "http://p", "hoi", TermKind.Literal, "", "nl", "http://g"),
      Quad("http://s", "http://p", "3", TermKind.Literal,
        "http://www.w3.org/2001/XMLSchema#integer", "", "http://g"),
      Quad("_:b1", "http://p", "x\"y\\z", TermKind.Literal, "", "", "http://g"))
    quads.foreach { q =>
      val l = line(q)
      val parsed = NTriplesParser.parseLine(l, "http://g").get
      assert(parsed.op == "+")
      // bnode objects parse back with the _: prefix they serialize with
      val expected = if (q.oKind == TermKind.Bnode) q.copy(oLex = "_:" + q.oLex) else q
      assert(parsed.quad == expected, s"line: $l")
    }
  }
}
