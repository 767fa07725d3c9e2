package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over a documents
  * table. Everything is a Column expression (whole-stage codegen; zero UDFs)
  * so the scan -> score pipeline runs in one pass with no shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count: word-ish runs + digits + punctuation as separate
    * tokens (a cheap deterministic proxy for a BPE tokenizer's token count).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => length(t) > 0))

  /** Language id by stopword-marker voting: per language, count occurrences
    * of its marker words; winner = argmax (ties -> lexicographically first
    * language, deterministic). Returns the guessed code. This is the n-gram
    * heuristic shape — markers are unigrams so an oracle can reproduce it. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "nl" -> Seq("de", "het", "een"))

  def markerScore(text: Column, words: Seq[String]): Column = {
    val toks = split(text, " ")
    words.map(wd => size(filter(toks, t => t === lit(wd)))).reduce(_ + _)
  }

  def langGuess(text: Column): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(markerScore(text, ws).as("score"), lit(lang).as("lang"))
    }
    // argmax with deterministic tie-break: sort by (score desc, lang asc)
    val best = array_sort(array(scored: _*),
      (l, r) => when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("lang") < r.getField("lang"), -1)
        .when(l.getField("lang") > r.getField("lang"), 1)
        .otherwise(0))
    element_at(best, 1).getField("lang")
  }

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "de", "la", "el")

  /** Quality metrics, all integer-exact (ratios are left to the consumer so
    * cross-engine comparison is bit-exact): n_chars, n_tokens, n_stopwords,
    * n_punct, n_upper, max token length. */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    df.withColumn("n_chars", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stopwords",
        size(filter(toks, x => x.isin(stopwords: _*))))
      .withColumn("n_punct", size(split(t, "[\\.,;:!?]")) - 1)
      .withColumn("n_upper", length(regexp_replace(t, "[^A-Z]", "")))
      .withColumn("max_token_len",
        aggregate(toks, lit(0), (acc, x) => greatest(acc, length(x))))
  }

  /** Rolling polynomial fingerprint of the normalized text (lower, collapsed
    * whitespace): f = sum c_i * 31^i mod 2^64 via aggregate — a document
    * fingerprint reproducible in any engine with 64-bit ints. */
  def fingerprint(text: Column): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    aggregate(split(norm, ""), lit(0L), (acc, ch) =>
      acc * lit(31L) + coalesce(ascii(ch).cast("long"), lit(0L)))
  }

  /** Repetition-quality stats (the Gopher/RefinedWeb "top n-gram fraction"
    * rule, integer-exact): per document, the most frequent token 2-gram and
    * its count — a high top_bigram_n / n_tokens ratio flags boilerplate and
    * degenerate repetition. Ties break to the lexicographically smallest
    * bigram (deterministic, oracle-reproducible). Typed one-pass kernel
    * (a groupBy over exploded bigrams would shuffle corpus-sized token
    * streams; per-doc counting is embarrassingly narrow). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < toks.length - 1) {
          val g = toks(i) + " " + toks(i + 1)
          counts.merge(g, 1, Integer.sum)
          i += 1
        }
        var bestG = ""
        var bestN = 0L
        counts.forEach { (g, n) =>
          if (n > bestN || (n == bestN && bestN > 0 && g < bestG)) { bestG = g; bestN = n }
        }
        (id, toks.length.toLong, bestG, bestN)
      })
      .toDF(idCol, "n_tokens", "top_bigram", "top_bigram_n")
  }

  /** PII scrubbing (training-data curation staple): mask email addresses
    * and NANP-style phone numbers with placeholder tokens and count the
    * replacements. Patterns are RE2-compatible (no lookarounds/backrefs)
    * so any engine — and the DuckDB oracle — applies identical semantics.
    * Pure Column expressions: the scan -> scrub pipeline stays one
    * codegen'd pass, no shuffle. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  def maskPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(emailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(phoneRe)).cast("long"))
      .withColumn("masked",
        regexp_replace(regexp_replace(t, emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
  }

  /** Deterministic corpus split (train/val/test) by a portable salted hash
    * of the id — the standard leak-free way to partition a training corpus:
    * membership is a pure function of the id, stable across runs, engines
    * and corpus growth (a new document never reshuffles existing ones).
    * `cuts` are cumulative percentages, e.g. (90, 95) -> 90% train,
    * 5% val, 5% test. */
  def deterministicSplit(docs: DataFrame, idCol: String = "doc_id",
                         salt: String = "split",
                         cuts: (Int, Int) = (90, 95)): DataFrame = {
    val h = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit("#" + salt))), 1, 15),
        16, 10).cast("long"),
      lit(100))
    docs.withColumn("split",
      when(h < cuts._1, "train").when(h < cuts._2, "val").otherwise("test"))
  }
}
