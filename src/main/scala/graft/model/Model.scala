package graft.model

import java.sql.Timestamp

/** Core data model.
  *
  * The fundamental datum everywhere is the N-Quad `(s, p, o, g)` — see
  * reference quad-logger/sql-proc/dump_nquads.sql:44-49 (SPARQL scan binding
  * all four positions) and parse_trx_logs.sql:107 (positional quad vector).
  *
  * Terms are kept *lexical* (already-resolved strings); the reference's
  * `__ro2sq` internal-id lexicalization (utils.sql:40,55-57) disappears here.
  * Object terms carry a kind tag + optional datatype/lang, mirroring the
  * formatter branches in utils.sql:35-66.
  */
object TermKind {
  val Iri: Int = 0
  val Bnode: Int = 1
  val Literal: Int = 2
}

/** One quad, flat columns (Catalyst-friendly — no nested struct needed).
  * Subject and graph are IRIs, except a subject whose lex starts with "_:"
  * is a blank node (store-scoped, reference MOTIVATION.md:50-53).
  */
final case class Quad(
    s: String,
    p: String,
    oLex: String,
    oKind: Int,
    oDtype: String, // "" = none; xsd:string is suppressed at serialization
    oLang: String,  // "" = none; lang wins over dtype (utils.sql:57-62)
    g: String)

/** A quad tagged with a patch op: '+' add / '-' delete
  * (reference utils.sql:23-31; opcode mapping parse_trx_logs.sql:6-23). */
final case class PatchRow(
    op: String,
    s: String,
    p: String,
    oLex: String,
    oKind: Int,
    oDtype: String,
    oLang: String,
    g: String,
    checkpoint: String)

/** Input web page, shape fixed by BASELINE.json input_hint:
  * (url, warc_ts, html, text, lang). `text` must be a byte-identical pure
  * function of `html` per url. */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** An entity mention detected in a page (typed Dataset transform output). */
final case class Mention(
    url: String,
    g: String,
    surface: String,
    pos: Int)

/** A scored entity link: mention resolved to a dictionary entity. */
final case class Link(
    url: String,
    g: String,
    surface: String,
    pos: Int,
    entity: String,
    score: Double)

/** Per-batch, per-partition lineage row (BASELINE.json: "checkpoint-resumable
  * with per-partition lineage (url range, warc_ts watermark, quad counts)").
  * Mirrors the reference's state files vql_lastlogsuffix/nquads_count/
  * files_count (generate-rdfpatch.sh:44-63) as a proper table. */
final case class LineageRow(
    epoch: String,     // handshake analogue (vql_started_at.txt)
    batchId: Long,     // run mark (generate-rdfpatch.sh:355-356)
    partitionId: Int,  // bucket id of the state table
    urlLo: String,
    urlHi: String,
    watermark: Timestamp,
    added: Long,
    deleted: Long,
    files: Long)
