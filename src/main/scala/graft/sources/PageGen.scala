package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Page

/** Deterministic synthetic Common-Crawl-style page table (shape fixed by
  * BASELINE.json input_hint: url, warc_ts, html, text, lang).
  *
  * PRNG-free: every byte is a pure function of (pageIndex, snapshotId) via a
  * 64-bit FNV-1a hash, so any partition can be regenerated independently on
  * any executor — the generator itself scales linearly with parallelism.
  *
  * Content design (FIXTURES.md §1):
  *  - mentions drawn from a fixed entity dictionary so expected triples are
  *    computable in closed form;
  *  - a skewed hub entity appears in ~1/3 of pages (skew tests, SURVEY §4.1);
  *  - a controlled fraction of rows changes between snapshots to exercise
  *    the +/- diff (reference parse_trx_logs add/delete semantics).
  */
object PageGen {

  /** Stable 64-bit FNV-1a over a string; identical on driver and executors. */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }
  private def pick(h: Long, n: Int): Int = (((h >>> 1) % n)).toInt

  // --- entity dictionary -------------------------------------------------
  /** entity id -> (canonical IRI, surface forms, context words, type). The
    * first entity is the skewed hub. Aliased IRIs (…/alt/…) simulate
    * coreferent identifiers that canonicalization must merge. */
  final case class DictEntry(id: Int, iri: String, surfaces: Seq[String],
                             context: Seq[String], etype: String)

  val ambiguousSurface = "mercury"

  val dictionary: Seq[DictEntry] = Seq(
    DictEntry(0, "http://kg.example.org/entity/WorldWideWeb",
      Seq("web", "www"), Seq("internet", "browser", "page"), "Technology"),
    DictEntry(1, "http://kg.example.org/entity/Amsterdam",
      Seq("amsterdam"), Seq("city", "canal", "netherlands"), "Place"),
    DictEntry(2, "http://kg.example.org/entity/Rembrandt",
      Seq("rembrandt"), Seq("painter", "art", "museum"), "Person"),
    DictEntry(3, "http://kg.example.org/entity/Mercury_planet",
      Seq(ambiguousSurface), Seq("planet", "orbit", "solar"), "Place"),
    DictEntry(4, "http://kg.example.org/entity/Mercury_element",
      Seq(ambiguousSurface), Seq("metal", "chemical", "toxic"), "Substance"),
    DictEntry(5, "http://kg.example.org/entity/Spark",
      Seq("spark"), Seq("cluster", "query", "shuffle"), "Technology"),
    DictEntry(6, "http://kg.example.org/entity/Tulip",
      Seq("tulip"), Seq("flower", "garden", "bulb"), "Substance"),
    DictEntry(7, "http://kg.example.org/entity/Erasmus",
      Seq("erasmus"), Seq("scholar", "philosophy", "rotterdam"), "Person"))

  /** alias IRI pairs (same real-world entity under two IRIs) — the input to
    * canonicalization (north_star MinHash-LSH + connected components). */
  def aliasIri(iri: String): String =
    iri.replace("/entity/", "/alt/")

  /** Coreference in the wild: sites whose host ends in this suffix refer to
    * entities by their /alt/ alias IRI instead of the /entity/ IRI (hosts
    * host3, host13, …, host93 — ~10% of pages). Extraction emits whatever
    * the site says; canonicalization must merge the two namespaces. */
  val aliasSiteSuffix: String = "3.example.org"
  def isAliasSite(graphIri: String): Boolean = graphIri.endsWith(aliasSiteSuffix)

  val fillers: Seq[String] = Seq(
    "internet", "browser", "page", "city", "canal", "netherlands", "painter",
    "art", "museum", "planet", "orbit", "solar", "metal", "chemical", "toxic",
    "cluster", "query", "shuffle", "flower", "garden", "bulb", "scholar",
    "philosophy", "rotterdam", "history", "report", "nature", "records")

  val langs: Seq[String] = Seq("en", "nl", "de", "es", "fr")

  /** Deterministic page text for (index i, snapshot snap). A page "changes"
    * in snapshot k when fnv1a(i,"chg",k) % 10 == 0 (10% churn per snapshot). */
  def textFor(i: Long, snap: Int): String = {
    val rev = revisionOf(i, snap)
    val h0 = fnv1a(s"page:$i:rev:$rev")
    val nTok = 20 + pick(h0, 40)
    val sb = new StringBuilder
    var t = 0
    while (t < nTok) {
      val h = fnv1a(s"tok:$i:$rev:$t")
      val word =
        if (t % 7 == 3) { // mention slot
          if (pick(h, 3) == 0) dictionary.head.surfaces(pick(h >> 8, 2)) // hub ~1/3
          else {
            val e = dictionary(1 + pick(h >> 8, dictionary.size - 1))
            e.surfaces(pick(h >> 16, e.surfaces.size))
          }
        } else fillers(pick(h, fillers.size))
      if (t > 0) sb.append(' ')
      sb.append(word)
      t += 1
    }
    sb.toString
  }

  /** Monotone revision counter: how many of snapshots 1..snap changed page i. */
  def revisionOf(i: Long, snap: Int): Int =
    (1 to snap).count(k => (fnv1a(s"chg:$i:$k") >>> 1) % 10 == 0)

  def langFor(i: Long): String = langs(pick(fnv1a(s"lang:$i"), langs.size))

  /** html is the canonical wrapper; TextExtractor must recover `text`
    * byte-identically (BASELINE.json per-row invariant). */
  def htmlFor(url: String, text: String, lang: String): Array[Byte] = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    (s"""<html lang="$lang"><head><title>$url</title></head>""" +
      s"""<body>\n<p>$esc</p>\n</body></html>""").getBytes("UTF-8")
  }

  def urlFor(i: Long): String = {
    val host = s"host${(fnv1a(s"host:$i") >>> 1) % 97}"
    s"https://$host.example.org/page/$i"
  }

  def tsFor(i: Long, snap: Int): Timestamp =
    // base 2024-01-01T00:00:00Z; each snapshot advances by one day, pages
    // spread over the day => watermark-friendly monotone-ish timestamps
    new Timestamp(1704067200000L + snap * 86400000L + (((fnv1a(s"ts:$i:$snap") >>> 1) % 86400L) * 1000L))

  def pageFor(i: Long, snap: Int): Page = {
    val url = urlFor(i)
    val text = textFor(i, snap)
    val lang = langFor(i)
    // warc_ts: the crawl time of the CURRENT revision of the page
    val rev = revisionOf(i, snap)
    val firstSnapOfRev = (0 to snap).find(k => revisionOf(i, k) == rev).getOrElse(snap)
    Page(url, tsFor(i, firstSnapOfRev), htmlFor(url, text, lang), text, lang)
  }

  /** Snapshot membership: page i exists in snapshot snap unless deleted.
    * ~5% of initial pages are deleted at each snapshot k>=1; ~5% new pages
    * (indices n + …) are added. */
  def snapshot(spark: SparkSession, n: Long, snap: Int): Dataset[Page] = {
    import spark.implicits._
    val adds = (1 to snap).map(k => n / 20).sum // n/20 new pages per snapshot
    // 4x over-partitioning: narrow generate+extract stages pack into
    // multiple waves per core, so one slow partition can't idle the rest
    spark.range(0, n + adds, 1, spark.sparkContext.defaultParallelism * 4)
      .as[Long]
      .filter(i => isLive(i, n, snap))
      .map(i => pageFor(i, snap))
  }

  def isLive(i: Long, n: Long, snap: Int): Boolean = {
    val bornAt = if (i < n) 0 else (((i - n) / math.max(n / 20, 1)) + 1).toInt
    if (bornAt > snap) return false
    // deletion: page dies at snapshot k with prob 5% per snapshot after birth
    val death = ((bornAt + 1) to snap).find(k => (fnv1a(s"die:$i:$k") >>> 1) % 20 == 0)
    death.isEmpty
  }
}
