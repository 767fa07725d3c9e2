package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Quad, TermKind}

/** Literal escaping, exactly the reference's 8 ordered replacement passes
  * (quad-logger/sql-proc/utils.sql:92-103): backslash FIRST, then
  * BEL→\a, BS→\b, TAB→\t, LF→\n, FF→\f, CR→\r, quote→\".
  *
  * Documented non-invertible cases (utils.sql:79-90) are intentionally NOT
  * handled: a literal `\'` or `\uXXXX` sequence in the source text is not
  * reconstructible and single quotes pass through unescaped.
  */
object Escaping {

  /** (search, replacement) pairs in the exact reference order. */
  val ladder: Seq[(String, String)] = Seq(
    "\\"     -> "\\\\",
    "\u0007" -> "\\a",
    "\b"     -> "\\b",
    "\t"     -> "\\t",
    "\n"     -> "\\n",
    "\f"     -> "\\f",
    "\r"     -> "\\r",
    "\""     -> "\\\"")

  /** Column form — literal `replace` (codegen'd, no regex engine), chained in
    * ladder order so whole-stage codegen fuses the passes. */
  def escape(c: Column): Column =
    ladder.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** Scala form for tests / fixture generation; byte-identical to [[escape]]. */
  def escape(s: String): String =
    ladder.foldLeft(s) { case (acc, (from, to)) => acc.replace(from, to) }

  /** Inverse (used only by the fixture parser; best-effort per the reference's
    * own non-invertibility notes). */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 'a'  => sb.append('\u0007'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case '"'  => sb.append('"'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}

/** N-Quad / patch-line serialization as pure Column expressions (codegen-
  * friendly, no UDF) — the Spark re-expression of vql_create_nquad /
  * vql_format_iri / vql_format_object (utils.sql:23-66).
  */
object NQuadFormatter {
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  /** vql_format_iri (utils.sql:35-43): blank nodes keep their `_:` prefix,
    * everything else is wrapped `<...>`. We detect bnodes lexically (the
    * reference's 64-bit-id test is Virtuoso-internal). */
  def fmtIriOrBnode(lex: Column): Column =
    when(lex.startsWith("_:"), lex).otherwise(concat(lit("<"), lex, lit(">")))

  /** vql_format_object (utils.sql:48-66). Precedence reproduced exactly:
    * lang tag beats datatype (utils.sql:57-62); xsd:string is suppressed
    * (utils.sql:60) so plain and xsd:string literals serialize identically. */
  def fmtObject(lex: Column, kind: Column, dtype: Column, lang: Column): Column = {
    val quoted = concat(lit("\""), Escaping.escape(lex), lit("\""))
    when(kind === lit(TermKind.Iri), concat(lit("<"), lex, lit(">")))
      .when(kind === lit(TermKind.Bnode),
        when(lex.startsWith("_:"), lex).otherwise(concat(lit("_:"), lex)))
      .otherwise(
        when(lang =!= lit(""), concat(quoted, lit("@"), lang))
          .when(dtype =!= lit("") && dtype =!= lit(XsdString),
            concat(quoted, lit("^^<"), dtype, lit(">")))
          .otherwise(quoted))
  }

  /** vql_create_nquad (utils.sql:23-31): `op <s> <p> obj <g> .` */
  def patchLine(op: Column, s: Column, p: Column,
                oLex: Column, oKind: Column, oDtype: Column, oLang: Column,
                g: Column): Column =
    concat_ws(" ",
      op,
      fmtIriOrBnode(s),
      concat(lit("<"), p, lit(">")),
      fmtObject(oLex, oKind, oDtype, oLang),
      concat(lit("<"), g, lit(">")),
      lit("."))

  /** Convenience over the standard patch/quad column names. */
  def patchLineCol(df: DataFrame): Column =
    patchLine(df("op"), df("s"), df("p"),
      df("oLex"), df("oKind"), df("oDtype"), df("oLang"), df("g"))

  /** N-Quad line without op (dump body form). */
  def quadLine(df: DataFrame): Column =
    concat_ws(" ",
      fmtIriOrBnode(df("s")),
      concat(lit("<"), df("p"), lit(">")),
      fmtObject(df("oLex"), df("oKind"), df("oDtype"), df("oLang")),
      concat(lit("<"), df("g"), lit(">")),
      lit("."))
}

/** Minimal N-Triples / N-Quads / RDF-patch line parser, used for fixture
  * corpora (the analogue of the reference's test fixtures under
  * resourcesync-generator/oai-rs/sample/ and example-virtuoso-server .nt files).
  * Line-oriented, driver/executor-safe pure function.
  */
object NTriplesParser {
  private val Term = """(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"""
  private val QuadRe =
    (s"""^\\s*(?:([+-])\\s+)?$Term\\s+$Term\\s+$Term(?:\\s+$Term)?\\s*\\.\\s*$$""").r

  final case class ParsedLine(op: String, quad: Quad)

  /** Parse one line; None for comments / blank / malformed. Default graph IRI
    * is used when the line is a triple (N-Triples fixture). */
  def parseLine(line: String, defaultGraph: String): Option[ParsedLine] = {
    if (line.isEmpty || line.startsWith("#")) return None
    QuadRe.findFirstMatchIn(line).map { m =>
      val op = Option(m.group(1)).getOrElse("+")
      val s = stripIri(m.group(2))
      val p = stripIri(m.group(3))
      val (oLex, oKind, oDt, oLang) = parseTerm(m.group(4))
      val g = Option(m.group(5)).map(stripIri).getOrElse(defaultGraph)
      ParsedLine(op, Quad(s, p, oLex, oKind, oDt, oLang, g))
    }
  }

  private def stripIri(t: String): String =
    if (t.startsWith("<") && t.endsWith(">")) t.substring(1, t.length - 1) else t

  def parseTerm(t: String): (String, Int, String, String) = {
    if (t.startsWith("<")) (stripIri(t), TermKind.Iri, "", "")
    else if (t.startsWith("_:")) (t, TermKind.Bnode, "", "")
    else {
      // literal: "lex"@lang | "lex"^^<dt> | "lex"
      val endQ = lastUnescapedQuote(t)
      val lex = Escaping.unescape(t.substring(1, endQ))
      val rest = t.substring(endQ + 1)
      if (rest.startsWith("@")) (lex, TermKind.Literal, "", rest.substring(1))
      else if (rest.startsWith("^^<")) (lex, TermKind.Literal, rest.substring(3, rest.length - 1), "")
      else (lex, TermKind.Literal, "", "")
    }
  }

  private def lastUnescapedQuote(t: String): Int = {
    var i = t.length - 1
    while (i > 0) {
      if (t.charAt(i) == '"') {
        var bs = 0; var j = i - 1
        while (j > 0 && t.charAt(j) == '\\') { bs += 1; j -= 1 }
        if (bs % 2 == 0) return i
      }
      i -= 1
    }
    0
  }

  /** Read a fixture file into a Dataset[Quad] (test-scale; driver lists one
    * file, parsing runs distributed). */
  def read(spark: SparkSession, path: String, defaultGraph: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(l => parseLine(l, defaultGraph).map(_.quad))
  }
}
