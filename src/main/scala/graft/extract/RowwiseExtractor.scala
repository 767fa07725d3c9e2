package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.TermKind
import graft.sources.PageGen

/** Fused row-level extraction: mention detection + dictionary/context
  * entity-link scoring + quad emission as ONE pass of array expressions over
  * the page scan — the pipeline's hot path.
  *
  * Why this exists next to the modular [[MentionDetector]]/[[EntityLinker]]
  * (which remain the typed, composable API): at 10^12 pages the modular plan
  * costs three wide exchanges (mention explode -> join -> argmax groupBy ->
  * per-page dedup). All of that is per-page-local computation — no operator
  * needs data from two pages — so the scale-correct plan keeps it inside one
  * WholeStageCodegen stage: the dictionary rides along as a map literal
  * (it is the broadcast dimension, folded into the expression), candidates
  * are scored with array intersections against the page's token set, the
  * argmax runs per mention inside an `aggregate()`, and per-page dedup is
  * `array_distinct`. The ONLY shuffle left in extraction is the global
  * support aggregation that the changelog diff genuinely requires.
  *
  * Scaling effect measured in-sandbox (300k pages): the modular plan ran in
  * ~30s regardless of core count (exchange-bound); this plan is CPU-bound
  * and scales with cores.
  */
object RowwiseExtractor {

  /** dictionary as a map literal: surface -> array of candidate structs
    * (entity, etype, prior, context). */
  private def dictMap: Column = {
    val entries = PageGen.dictionary
      .flatMap(e => e.surfaces.map(s => (s, e)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (surface, es) =>
        struct(lit(surface).as("key"),
          array(es.map(_._2).sortBy(_.iri).map { e =>
            struct(lit(e.iri).as("entity"), lit(e.etype).as("etype"),
              lit(1.0 / e.surfaces.size).as("prior"),
              array(e.context.map(lit): _*).as("context"))
          }: _*).as("value"))
      }
    map_from_entries(array(entries: _*))
  }

  /** pages(url, warc_ts, text, lang) -> url-attributed quad rows
    * (url, s, p, oLex, oKind, oDtype, oLang, g), deduped per page. */
  def pageQuads(pages: DataFrame): DataFrame = {
    val iriK = lit(TermKind.Iri); val litK = lit(TermKind.Literal)
    val none = lit("")

    val withCols = pages
      .withColumn("g", regexp_extract(col("url"), "^(https?://[^/]+)", 1))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dtoks", array_distinct(col("toks")))
      .withColumn("dict", dictMap)

    // linked mentions: struct(pos, entity, etype) per dictionary hit;
    // argmax(score = |dtoks ∩ context| + prior, tie -> entity asc) via
    // aggregate over the candidate array — all row-local.
    val links = filter(
      transform(
        sequence(lit(0), size(col("toks")) - 1),
        pos => {
          val tok = element_at(col("toks"), pos + 1)
          val cands = element_at(col("dict"), tok)
          val best = aggregate(
            coalesce(cands, array().cast("array<struct<entity:string,etype:string,prior:double,context:array<string>>>")),
            struct(lit(Double.MinValue).as("score"), lit("").as("entity"), lit("").as("etype")),
            (acc, c) => {
              val score = size(array_intersect(col("dtoks"), c.getField("context")))
                .cast("double") + c.getField("prior")
              when(score > acc.getField("score") ||
                   (score === acc.getField("score") &&
                    c.getField("entity") < acc.getField("entity")),
                struct(score.as("score"), c.getField("entity").as("entity"),
                  c.getField("etype").as("etype")))
                .otherwise(acc)
            })
          struct(pos.as("pos"), best.getField("entity").as("entity"),
            best.getField("etype").as("etype"))
        }),
      l => l.getField("entity") =!= "")

    val quadT = "struct<s:string,p:string,oLex:string,oKind:int,oDtype:string,oLang:string>"
    def q(s: Column, p: String, oLex: Column, oKind: Column,
          oDtype: Column, oLang: Column): Column =
      struct(s.as("s"), lit(p).as("p"), oLex.as("oLex"), oKind.as("oKind"),
        oDtype.as("oDtype"), oLang.as("oLang"))

    import MentionDetector._
    val withLinks = withCols.withColumn("links", links)
    // alias-flavored sites reference entities under their /alt/ namespace
    // (PageGen.aliasSiteSuffix) — extraction is faithful to the source;
    // canonicalization merges the namespaces downstream
    def siteEntity(e: Column): Column =
      when(col("g").endsWith(PageGen.aliasSiteSuffix),
        regexp_replace(e, "/entity/", "/alt/")).otherwise(e)
    val quadArr = array_distinct(concat(
      transform(col("links"), l =>
        q(col("url"), mentionsPred, siteEntity(l.getField("entity")), iriK, none, none)),
      transform(col("links"), l =>
        q(siteEntity(l.getField("entity")), typePred,
          concat(lit("http://kg.example.org/class/"), l.getField("etype")),
          iriK, none, none)),
      transform(col("links"), l =>
        q(concat(lit("_:m"), hex(abs(xxhash64(col("url"), l.getField("pos"))))),
          posPred, l.getField("pos").cast("string"), litK, lit(XsdInteger), none)),
      array(
        q(col("url"), langPred, col("lang"), litK, none, col("lang")),
        q(col("url"), crawledPred,
          date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          litK, lit(XsdDateTime), none)).cast(s"array<$quadT>")))

    withLinks
      .select(col("url"), col("g"), explode(quadArr).as("q"))
      .select(col("url"), col("q.s").as("s"), col("q.p").as("p"),
        col("q.oLex").as("oLex"), col("q.oKind").as("oKind"),
        col("q.oDtype").as("oDtype"), col("q.oLang").as("oLang"), col("g"))
  }
}
