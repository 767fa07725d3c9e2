package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal}
import graft.plans.QuadDiff
import graft.rdf.Escaping

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data ops), each with a DuckDB oracle in
  * [[SparkEntry.oracleSql]] over the same parquet tables.
  *
  * Cross-engine determinism rules used throughout:
  *  - portable 60-bit hash = first 15 hex chars of md5, so minhash/simhash
  *    agree bit-for-bit between Spark and DuckDB;
  *  - float similarity scores are emitted as `floor(x*10^4 + 0.5)` BIGINTs
  *    (half-up fixed-point) — no float hashing hazards;
  *  - decimal aggregates are computed in DECIMAL and emitted as integer
  *    cents; counts/sizes are cast to BIGINT to match DuckDB's defaults.
  */
object SparkEntry {

  // ---------- shared helpers ----------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // (A scale-adaptive `widen` parallelism floor was measured here for the
  // star-join/diff queries too and REJECTED: their per-row work is cheap
  // column arithmetic, and the extra round-robin exchange cost more than
  // the single-threaded narrow prefix it parallelized — 0.78s -> 1.16s on
  // q_agg_star_join. It pays only where the per-row kernel is heavy; see
  // Dedup.widen, which is measured 3.5-5x on the pair queries.)

  // Portable 60-bit hash recipe (both engines + the typed hot path agree):
  //   Spark Column:  conv(substr(md5(x || '#salt'), 1, 15), 16, 10)::long
  //   DuckDB:        ('0x' || substr(md5(x || '#salt'), 1, 15))::BIGINT
  //   typed Scala:   Dedup.phashScala (byte-fold of the same 15 hex chars)
  // PortableHashSpec proves all three bit-identical.

  /** Fixed-point: floor(x*10^4+0.5) as BIGINT (half-up; same formula in SQL). */
  private def fx4(c: Column): Column = floor(c * 10000d + 0.5d).cast("long")

  /** SQL mirror of [[Similarity.hyperplaneBucket]]: the identical ±1 weight
    * constants inlined as an explicit index-ordered sum, so the double
    * arithmetic is bit-identical between engines. */
  private def hyperplaneBucketSql(tbl: String, planes: Int, dim: Int, seed: Int): String =
    (0 until planes).map { i =>
      val w = Similarity.hyperplaneWeights(i, dim, seed)
      val dotExpr = (0 until dim)
        .map(j => s"$tbl.embedding[${j + 1}]::DOUBLE*(${w(j).toInt})").mkString(" + ")
      s"(CASE WHEN ($dotExpr) > 0 THEN (1::BIGINT << $i) ELSE 0 END)"
    }.mkString(" + ")

  /** SQL mirror of [[Similarity.cosine]] in EXPLICIT double arithmetic
    * (index-ordered sums) — DuckDB's list_cosine_similarity computes in
    * float32 and diverges from the double fold by 1 ulp at fixed-point
    * boundaries. */
  private def cosineSql(l: String, r: String, dim: Int): String =
    cosineSqlCols(s"$l.embedding", s"$r.embedding", dim)

  /** cosine over two arbitrary array-valued SQL expressions. */
  private def cosineSqlCols(le: String, re: String, dim: Int): String = {
    def dotSum(a: String, b: String) = (0 until dim)
      .map(j => s"$a[${j + 1}]::DOUBLE*$b[${j + 1}]::DOUBLE").mkString(" + ")
    s"(${dotSum(le, re)}) / (sqrt(${dotSum(le, le)}) * sqrt(${dotSum(re, re)}))"
  }

  // the test-table entity dictionary (documents vocab is DB-flavored words)
  private val docEntities: Seq[(String, String)] = Seq(
    "spark" -> "http://kg.example.org/entity/Spark",
    "join" -> "http://kg.example.org/entity/Join",
    "window" -> "http://kg.example.org/entity/Window",
    "vector" -> "http://kg.example.org/entity/Vector",
    "customer" -> "http://kg.example.org/entity/Customer")
  private val ambCtxA = Seq("table", "scan", "merge")   // Part_physical context
  private val ambCtxB = Seq("small", "big", "value")    // Part_logical context

  /** Where q_pipeline_bootstrap materializes its closed-form expected table
    * for the DuckDB side of the tri-check. */
  private val expectedBootstrapDir = "/tmp/graft_expected_bootstrap"

  /** Where q_pipeline_incremental materializes its closed-form expected
    * ± patch set for batch 1. */
  private val expectedIncrementalDir = "/tmp/graft_expected_incremental"

  /** Where q_pipeline_remap materializes its expected batch-2 patch set
    * (the n=40 corpus where batch 2 brings an alias that merges clusters). */
  private val expectedRemapDir = "/tmp/graft_expected_remap"

  /** Where q_ann_ivf_topk materializes its k-means centroids so the DuckDB
    * oracle assigns cells from the identical double vectors. */
  private val ivfCentroidsDir = "/tmp/graft_ivf_centroids"

  /** Deterministic pipeline root: cleared first — the canonical map is
    * pipeline STATE, and a leftover map from an earlier process would make
    * the result depend on history. */
  private def freshRoot(path: String): String = {
    val d = new java.io.File(path)
    if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively() }
    path
  }

  /** Flagship: end-to-end KG extraction (pages -> mentions -> links ->
    * canonicalized quads) on a deterministic synthetic page table. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = graft.sources.PageGen.snapshot(spark, 300, 0)
    new graft.streaming.QuadLogPipeline(spark, freshRoot("/tmp/graft_entry"), numBuckets = 8)
      .extractedQuads(pages)
      .withColumn("op", lit("+"))
  }

  // =====================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- S1/F1: snapshot scan + excluded-graph filter (dump_nquads.sql:44-49)
    "q_s1_scan_filter" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(!col("source").isin("src0", "src3"))
        .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
    }),

    // --- F2/F3: opcode -> op classification (parse_trx_logs.sql:6-23)
    "q_f2_opcode_map" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("op",
          when(col("event_type").isin("click", "signup", "purchase"), "+")
            .when(col("event_type").isin("error"), "-")
            .otherwise(null))
        .filter(col("op").isNotNull)
        .groupBy("op").agg(count(lit(1)).as("n"))
    }),

    // --- F3: payload-slot selection (parse_trx_logs.sql:91-96 — opcode 13
    // carries the quad in line[2], all others in line[1])
    "q_f3_payload_slot" -> ((s, dir) => {
      t(s, dir, "events").select(col("event_id"),
        when(col("event_type") === "purchase", col("props"))
          .otherwise(concat(lit("u:"), col("user_id").cast("string"))).as("payload"))
    }),

    // --- J4: exclusion as anti-join (dump_nquads.sql:47-48)
    "q_j4_graph_exclusion" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val excluded = ev.filter(col("value") > 190).select("user_id").distinct()
      ev.join(excluded, Seq("user_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    }),

    // --- A1/A3: group-by-graph buffering + counters (buffer_nquads.sql:8-29)
    "q_a1_quads_per_graph" -> ((s, dir) => {
      t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("total_chars"))
    }),

    // --- A5: cross-run running totals (generate-rdfpatch.sh:345-346)
    "q_a5_running_totals" -> ((s, dir) => {
      val per = t(s, dir, "documents").groupBy("source").agg(count(lit(1)).as("n"))
      // Unpartitioned Window.orderBy (Spark warns it funnels one partition)
      // is DELIBERATE and safe here ONLY because the frame is the
      // pre-aggregated per-source totals — ~20 rows, the exact analogue of
      // the reference's O(1) counts files. Do not copy this pattern onto
      // row-scale input; a corpus-sized running total needs a partitioned
      // window or a two-level prefix sum.
      per.withColumn("running_total",
        sum("n").over(Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)))
    }),

    // --- J1: the core +/- changelog diff (MOTIVATION.md:44-46)
    "q_j1_diff_changelog" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val prev = o.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .select("o_orderkey", "o_orderpriority")
      val next = o.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
        .select("o_orderkey", "o_orderpriority")
      QuadDiff.diffOn(prev, next, Seq("o_orderkey", "o_orderpriority"))
    }),

    // --- W1: maxq-per-file chunking (buffer_nquads.sql:24-27)
    "q_w1_chunking" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .withColumn("chunk", floor((col("rn") - 1) / 25).cast("long"))
        .select("doc_id", "source", "chunk")
    }),

    // --- W2/O5: complete-vs-end packaging windows (zipsynchronizer.py:133-173)
    "q_w2_packaging" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("batch", floor(col("doc_id") / 100).cast("long"))
        .groupBy("batch")
        .agg(count(lit(1)).as("n_files"))
        .withColumn("is_complete", (col("n_files") === 100).cast("int"))
    }),

    // --- A8: first-seen graph-folder index (split-graphs.sh:99-102's
    // vql_graph_folder.csv: (graph, base64) dimension, insert-if-absent)
    "q_a8_graph_index" -> ((s, dir) => {
      t(s, dir, "documents").groupBy("source")
        .agg(min("doc_id").as("first_seen"))
        .withColumn("b64", base64(col("source").cast("binary")))
        .select("source", "b64", "first_seen")
    }),

    // --- X5: base64 graph directory names (split-graphs.sh:88-97)
    "q_x5_base64_dirs" -> ((s, dir) => {
      t(s, dir, "documents").select("source").distinct()
        .withColumn("b64", base64(col("source").cast("binary")))
    }),

    // --- X6/X7: checkpoint-id extraction + timestamp reformat
    "q_x6_checkpoint_ids" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("fname", concat(lit("rdf_out_"),
          date_format(col("ts"), "yyyyMMddHHmmss"), lit("-"),
          lpad(col("event_id").cast("string"), 14, "0")))
        .withColumn("cp", regexp_extract(col("fname"), "([0-9]{14})", 1))
        .withColumn("iso", date_format(to_timestamp(col("cp"), "yyyyMMddHHmmss"),
          "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .select("event_id", "fname", "cp", "iso")
    }),

    // --- streaming-shape windowed aggregation: tumbling 1-day event-time
    // windows per type — the exact expression Structured Streaming executes
    // under a watermark (batch-mode here so DuckDB can mirror it; windows
    // align at the epoch, so date_trunc('day') is the same bucketing)
    "q_stream_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("double")).as("sv"))
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"),
          floor(col("sv") * 100d + 0.5d).cast("long").as("sum_value_c2"))
    }),

    // --- T2: checkpoint watermark filter (parse_trx_logs.sql:57-58)
    "q_t2_watermark_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          date_format(max("ts"), "yyyyMMddHHmmss").as("max_ts14"))
    }),

    // --- KG: mention detection over documents (typed pipeline on testdata)
    "q_kg_mentions" -> ((s, dir) => {
      val surfaces = docEntities.map(_._1) ++ Seq("part")
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("surface"))
        .filter(col("surface").isin(surfaces: _*))
        .distinct()
    }),

    // --- KG: dictionary + context entity-link disambiguation
    "q_kg_link_disambig" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", array_distinct(split(col("text"), " ")))
      docs.filter(array_contains(col("toks"), "part"))
        .withColumn("sa", size(array_intersect(col("toks"),
          array(ambCtxA.map(lit): _*))).cast("long"))
        .withColumn("sb", size(array_intersect(col("toks"),
          array(ambCtxB.map(lit): _*))).cast("long"))
        .withColumn("entity",
          when(col("sa") > col("sb"), "http://kg.example.org/entity/Part_physical")
            .otherwise("http://kg.example.org/entity/Part_logical"))
        .select("doc_id", "sa", "sb", "entity")
    }),

    // --- X1-X4: full patch-line serialization incl. the escape ladder
    "q_kg_patchlines" -> ((s, dir) => {
      import s.implicits._
      val ents = docEntities.toDF("surface", "entity")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          explode(split(col("text"), " ")).as("surface"))
        .join(broadcast(ents), Seq("surface"))
        .distinct()
        .withColumn("line", concat_ws(" ",
          lit("+"),
          concat(lit("<http://doc.example.org/"), col("doc_id"), lit(">")),
          lit("<http://kg.example.org/ontology/mentions>"),
          concat(lit("<"), col("entity"), lit(">")),
          concat(lit("<http://graph.example.org/"), col("source"), lit(">")),
          lit(".")))
        .select("doc_id", "surface", "line")
    }),

    // --- X4: escape ladder itself, applied to synthesized gnarly strings
    "q_x4_escaping" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("gnarly", concat(lit("a\\b\tc\nd\"e"), col("lang")))
        .select(col("doc_id"), Escaping.escape(col("gnarly")).as("escaped"))
    }),

    // --- J5/north_star: connected components via iterative DF joins
    "q_canon_connected_components" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(concat(lit("u"), col("user_id").cast("string")).as("src"),
          concat(lit("t"), col("event_type")).as("dst"))
        .distinct()
      graft.canon.ConnectedComponents.run(s, edges)
    }),

    // --- J5: SAME labels via the distributed star-contraction path
    // (smallGraphCutoff=0 disables the driver union-find fast path, so this
    // row certifies the salted large-star/small-star implementation itself)
    "q_canon_cc_distributed" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(concat(lit("u"), col("user_id").cast("string")).as("src"),
          concat(lit("t"), col("event_type")).as("dst"))
        .distinct()
      graft.canon.ConnectedComponents.run(s, edges, smallGraphCutoff = 0)
    }),

    // --- dedup: exact (hash-groupBy)
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"))
        .withColumn("group_size", col("group_size").cast("long"))
    }),

    // --- dedup: minhash signatures (portable hash, typed single-pass mins)
    "q_dedup_minhash_sig" -> ((s, dir) => {
      Dedup.portableMinhashSigs(t(s, dir, "documents"), numHashes = 4)
    }),

    // --- dedup: minhash banded-LSH candidate pairs + agreement
    "q_dedup_minhash_pairs" -> ((s, dir) => {
      val sigs = Dedup.portableMinhashSigs(t(s, dir, "documents"), numHashes = 4)
        .localCheckpoint() // consumed 4x (both sides of both band joins)
      // Both signatures are ON the band-join output already (each side is a
      // projection of `sigs`), so compute `agree` right there and dedup on
      // (a, b, agree) — `agree` is a pure function of the (a, b) signature
      // pair, so the distinct cardinality is exactly that of distinct
      // (a, b). The previous shape deduped bare (a, b) and then re-attached
      // the signatures with TWO more joins over the ~10M-row candidate
      // stream (measured at sf0.1: 5.3M + 5.0M band-join rows); carrying
      // one extra BIGINT through the dedup exchange is far cheaper than
      // re-joining the pair stream twice.
      val bands = Seq(("h0", "h1"), ("h2", "h3"))
      bands.map { case (x, y) =>
        val a = sigs.select(col("doc_id").as("a"), col(x).as("bx"), col(y).as("by"),
          col("h0").as("a0"), col("h1").as("a1"), col("h2").as("a2"), col("h3").as("a3"))
        val b = sigs.select(col("doc_id").as("b"), col(x).as("bx"), col(y).as("by"),
          col("h0").as("b0"), col("h1").as("b1"), col("h2").as("b2"), col("h3").as("b3"))
        a.join(b, Seq("bx", "by")).filter(col("a") < col("b"))
          .withColumn("agree",
            (col("a0") === col("b0")).cast("long") + (col("a1") === col("b1")).cast("long") +
              (col("a2") === col("b2")).cast("long") + (col("a3") === col("b3")).cast("long"))
          .select("a", "b", "agree")
      }.reduce(_ unionByName _).distinct()
    }),

    // --- dedup: 16-bit SimHash (portable hash, typed single-pass bit sums)
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.portableSimhash(t(s, dir, "documents"), bits = 16, salt = 99)
    }),

    // --- dedup: simhash PAIRS via Hamming-adjacent band blocking (portable
    // 32-bit fingerprint, 4 bands of 8 bits; pigeonhole: hamming<=2 < bands).
    // Band width is a BLOCKING-SELECTIVITY knob: a 4-bit slice (16 keys)
    // degenerates into near-all-pairs once the corpus outgrows the key
    // space (measured: 26M candidates over 5k docs); 8-bit slices keep the
    // same completeness guarantee with 256x the key space.
    "q_dedup_simhash_pairs" -> ((s, dir) => {
      val fps = Dedup.portableSimhash(t(s, dir, "documents"), bits = 32, salt = 99)
        .localCheckpoint() // tiny; consumed by both sides of the band join
      val banded = fps.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 8).bitwiseAND(255L)): _*)).as(Seq("band", "key")))
      val l = banded.select(col("band"), col("key"), col("doc_id").as("a"), col("simhash").as("fa"))
      val r = banded.select(col("band"), col("key"), col("doc_id").as("b"), col("simhash").as("fb"))
      // hamming filter BEFORE the distinct: bit_count(fa^fb) needs only the
      // two fingerprints already present on the join output, the filter
      // commutes with dedup (it is a pure function of the dedup key), and
      // it is highly selective — measured at sf0.1 it cuts the dedup
      // exchange's input from 10.5M candidate rows to 3.75M. `hamming`
      // is functionally dependent on (a, b), so distinct over
      // (a, b, hamming) has the exact cardinality of distinct (a, b).
      l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
        .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
        .filter(col("hamming") <= 2)
        .select("a", "b", "hamming").distinct()
    }),

    // --- dedup: exact n-gram Jaccard with shared-shingle blocking
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.05,
          maxBucket = 64)
        .withColumn("jaccard_x1e4", fx4(col("jaccard"))).drop("jaccard")
    }),

    // --- dedup: full near-dup CLUSTERING composition — verified pairs ->
    // connected components -> cluster label (min doc id, string order,
    // matching the CC contract); certifies Dedup.clusters end-to-end
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3,
        threshold = 0.05, maxBucket = 64)
      Dedup.clusters(s, pairs).select(col("id"), col("component"))
    }),

    // --- dedup: embedding-cosine near-dup pairs (seeded-hyperplane blocked,
    // maxBucket-capped — no label column needed; real corpora have none)
    "q_dedup_embed_cosine" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.25,
          planes = 4, dim = 64, seed = 42, maxBucket = 10000)
        .withColumn("sim_x1e4", fx4(col("sim"))).drop("sim")
    }),

    // --- ANN: brute-force cosine top-k (exact baseline)
    "q_ann_brute_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), 3)
        .withColumn("sim_x1e4", fx4(col("sim"))).drop("sim")
    }),

    // --- ANN: seeded-hyperplane LSH bucketed top-k (scale path; capped)
    "q_ann_lsh_topk" -> ((s, dir) => {
      Similarity.lshTopK(t(s, dir, "embeddings").filter(col("vec_id") < 200), 3,
          planes = 6, dim = 64, seed = 42, maxBucket = 64)
        .withColumn("sim_x1e4", fx4(col("sim"))).drop("sim")
    }),

    // --- ANN: IVF (inverted-file) top-k — data-adaptive cells from a
    // deterministic seeded k-means (Lloyd over a bounded vec_id-ordered
    // sample), queries probe their nProbe=2 nearest cells. The exact
    // centroid vectors are materialized as a parquet side artifact that
    // the DuckDB oracle reads back (same pattern as q_pipeline_bootstrap),
    // so both engines assign cells from identical doubles.
    "q_ann_ivf_topk" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, k = 8, sampleSize = 256, iters = 5)
      cents.map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cemb")
        .coalesce(1).write.mode("overwrite").parquet(ivfCentroidsDir)
      Similarity.ivfTopK(e, col("vec_id") < 50, 3, cents, nProbe = 2)
        .withColumn("sim_x1e4", fx4(col("sim"))).drop("sim")
    }),

    // --- text: token/quality stats (integer-exact)
    "q_txt_token_stats" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, c => c.isin(TextAnalysis.stopwords: _*))).cast("long").as("n_stopwords"),
        aggregate(toks, lit(0), (acc, c) => greatest(acc, length(c))).cast("long").as("max_token_len"))
    }),

    // --- text: quality scoring (punct/upper/subword counts, integer-exact).
    // The corpus text is punctuation-free by construction, so a gnarly
    // suffix is appended IDENTICALLY on both engines to exercise the
    // counters. Subword mirror note: DuckDB's RE2 has no lookarounds, so
    // the oracle counts (alnum runs + non-alnum chars) — arithmetically
    // identical to the boundary-split definition.
    "q_txt_quality" -> ((s, dir) => {
      val gnarly = concat(col("text"), lit(". End; X? "), upper(col("lang")))
      TextAnalysis.qualityMetrics(
          t(s, dir, "documents").withColumn("text", gnarly))
        .select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_punct").cast("long").as("n_punct"),
          col("n_upper").cast("long").as("n_upper"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))
    }),

    // --- text: language id by marker voting
    "q_txt_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langGuess(col("text")).as("lang_guess"))
    }),

    // --- text: repetition quality (Gopher-style top-bigram rule) — most
    // frequent token 2-gram per doc, ties to the smallest bigram
    "q_txt_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("top_bigram"),
          col("top_bigram_n").cast("long").as("top_bigram_n"))
    }),

    // --- dedup/decontamination: distinct 3-gram shingles shared with the
    // benchmark set (docs 0-4 stand in for a leaked eval suite); benchmark
    // shingles ride as a broadcast semi-join — never corpus x benchmark
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationOverlap(
          docs.filter(col("doc_id") >= 5), docs.filter(col("doc_id") < 5), n = 3)
        .withColumn("contaminated", (col("shared") >= 2).cast("int"))
    }),

    // --- text: PII masking (emails/phones) — the corpus is PII-free by
    // construction, so deterministic synthetic PII is appended identically
    // on both engines; patterns are RE2-compatible so DuckDB applies the
    // exact same mask semantics
    "q_txt_pii_mask" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("text",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-123-4567 and x"), col("doc_id"),
          lit("@sub.example.org")))
      TextAnalysis.maskPii(withPii)
        .select("doc_id", "n_emails", "n_phones", "masked")
    }),

    // --- deterministic leak-free train/val/test split (portable salted
    // hash of the id: stable across runs, engines and corpus growth)
    "q_sample_split" -> ((s, dir) => {
      TextAnalysis.deterministicSplit(t(s, dir, "documents"))
        .select("doc_id", "split")
    }),

    // --- text: rolling polynomial fingerprint (mod 1e9+7, portable)
    "q_txt_fingerprint" -> ((s, dir) => {
      val norm = lower(regexp_replace(col("text"), "\\s+", " "))
      t(s, dir, "documents").select(col("doc_id"),
        aggregate(split(norm, ""), lit(0L),
          (acc, c) => pmod(acc * 31L + coalesce(ascii(c).cast("long"), lit(0L)),
            lit(1000000007L))).as("fp"))
    }),

    // --- multimodal: REAL container metadata end to end — every doc gets a
    // structurally valid PNG/JPEG/WAV/GIF payload (Multimodal.Synth, real
    // CRCs) and every output field is parsed back from the container bytes
    // by MediaHeaders (no codec library, no FakeCodec anywhere on this
    // path); the oracle recomputes the closed forms + md5(text).
    "q_mm_media_meta" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val (kind, payload) = Multimodal.realPayloadFor(id, text)
          val (container, d1, d2) = Multimodal.MediaHeaders.decode(payload)
            .getOrElse(sys.error(s"header parse failed for doc $id"))
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, kind, container, payload.length.toLong, d1.toLong, d2.toLong, md)
        })
        .toDF("doc_id", "kind", "container", "byte_len", "dim1", "dim2", "checksum")
    }),

    // --- multimodal: frame-sample fan-out (explode over stride sequence)
    "q_mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.withFakePayload(t(s, dir, "documents"))
      Multimodal.frameSampleMeta(media, stride = 4)
    }),

    // --- multimodal: REAL header-only decode — synthesize structurally
    // valid PNG/JPEG containers (closed-form dims, real CRCs) around the
    // text bytes, then parse width/height back with MediaHeaders (public
    // byte-layout parsing, no codec library); the oracle recomputes the
    // closed form. A bad synthesizer OR parser breaks the hash match;
    // golden fixed-byte vectors in MultimodalSpec pin both independently.
    "q_mm_image_dims" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = (id % 512 + 1).toInt
          val h = (id * 7 % 512 + 1).toInt
          val content = text.getBytes("UTF-8")
          val payload =
            if ((id / 3) % 2 == 0) Multimodal.Synth.png(w, h, content)
            else Multimodal.Synth.jpeg(w, h, content)
          val (container, pw, ph) = Multimodal.MediaHeaders.decode(payload)
            .getOrElse(sys.error(s"header parse failed for doc $id"))
          (id, container, pw.toLong, ph.toLong, payload.length.toLong)
        })
        .toDF("doc_id", "container", "width", "height", "byte_len")
    }),

    // --- headline star-join aggregate (exact DECIMAL, emitted as cents)
    "q_agg_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000d + 0.5d)
            .cast("long")).as("revenue_c4"),
          count(lit(1)).as("n_items"))
    }),

    // --- O1: cluster output by graph (ORDER BY ?g analogue)
    "q_o1_cluster_by_graph" -> ((s, dir) => {
      t(s, dir, "documents")
        .select("source", "lang", "doc_id")
        .orderBy("source", "lang", "doc_id")
    }),

    // --- graph materialization (north_star): adjacency-list edge table,
    // subject-hash partitioned with hub-safe page chunking. pageSize=3
    // forces multi-page subjects (users have up to 5 event types), and the
    // bucket uses the portable md5 hash so DuckDB mirrors the layout; the
    // production default is the codegen'd xxhash64 bucket.
    "q_graph_adjacency" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .groupBy(concat(lit("u"), col("user_id").cast("string")).as("s"),
          concat(lit("t"), col("event_type")).as("o"))
        .agg(count(lit(1)).as("w"))
        .select(col("s"), concat(col("o"), lit(":"), col("w")).as("e"))
      val portableBucket = pmod(
        conv(substring(md5(concat(col("s"), lit("#b"))), 1, 15), 16, 10).cast("long"),
        lit(32))
      graft.plans.GraphMaterialize.adjacencyPages(edges, numBuckets = 32,
          pageSize = 3, bucketCol = Some(portableBucket.cast("int")))
        .select(col("s"), col("page").cast("long").as("page"),
          col("degree").cast("long").as("degree"),
          concat_ws(",", col("adj")).as("adj"),
          col("bucket").cast("long").as("bucket"))
    }),

    // --- end-to-end flagship: bootstrap patch set, tri-checked against the
    // closed-form ExpectedKg oracle (plain-Scala re-derivation incl. the
    // public-xxHash64 bnode ids and the canonical-map closed form); the
    // expected table is materialized as a parquet side artifact that the
    // oracle SQL reads back with read_parquet
    "q_pipeline_bootstrap" -> ((s, dir) => {
      import s.implicits._
      val expected = graft.sources.ExpectedKg.bootstrapQuads(200L, 0)
      s.createDataset(expected).toDF()
        .coalesce(1).write.mode("overwrite").parquet(expectedBootstrapDir)
      val pages = graft.sources.PageGen.snapshot(s, 200, 0)
      new graft.streaming.QuadLogPipeline(s, freshRoot("/tmp/graft_q_pipeline"), numBuckets = 8)
        .extractedQuads(pages).withColumn("op", lit("+"))
    }),

    // --- end-to-end flagship, INCREMENTAL path (the reference's reason to
    // exist — parse_trx_logs.sql's +/- changelog): bootstrap at snapshot 0,
    // then one real incremental batch (changed pages + deletes + newly seen
    // aliases that remap stored representatives). The result is the batch's
    // EMITTED PATCH FILES parsed back (so the row also certifies the writer
    // round-trip), hash-checked against the closed-form symmetric-difference
    // oracle of consecutive canonical states.
    "q_pipeline_incremental" -> ((s, dir) => {
      import s.implicits._
      val n = 200L
      s.createDataset(graft.sources.ExpectedKg.incrementalPatches(n, 1)).toDF()
        .coalesce(1).write.mode("overwrite").parquet(expectedIncrementalDir)
      val root = freshRoot("/tmp/graft_q_pipeline_incr")
      val pipe = new graft.streaming.QuadLogPipeline(s, root, numBuckets = 8)
      pipe.bootstrap(graft.sources.PageGen.snapshot(s, n, 0), "e1", "00000000000000")
      // the driver of a real deployment hands the pipeline (changed,
      // deleted); derive both from the deterministic generator closed form
      val changedIdx = graft.sources.ExpectedKg.changedIndices(n, 1).toSet
      val changed = s.createDataset(
        changedIdx.toSeq.sorted.map(graft.sources.PageGen.pageFor(_, 1)))
      val deleted = s.createDataset(
        graft.sources.ExpectedKg.deletedIndices(n, 1).map(graft.sources.PageGen.urlFor))
      pipe.incremental(1L, "20240102000000", changed, deleted)
      // recursiveFileLookup instead of a /* glob: the glob form makes the
      // analyzer's FileStreamSink metadata probe log a spurious
      // FileNotFoundException WARN on the unexpanded pattern
      s.read.option("recursiveFileLookup", "true").textFile(s"$root/patches/batch_1")
        .flatMap(l => graft.rdf.NTriplesParser.parseLine(l, "").map(pl =>
          (pl.op, pl.quad.s, pl.quad.p, pl.quad.oLex, pl.quad.oKind,
            pl.quad.oDtype, pl.quad.oLang, pl.quad.g)))
        .toDF("op", "s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
    }),

    // --- incremental path, CLUSTER-MERGE case: at n=40 the snapshot-2 batch
    // naturally introduces an alias IRI that bridges an existing canonical
    // cluster (15 of its '-' rows are remap deletes re-added under the /alt/
    // representative) — certifying extendMap, the remap semi-join scan and
    // the rewritten-contribution flow against the closed-form oracle.
    "q_pipeline_remap" -> ((s, dir) => {
      import s.implicits._
      val n = 40L
      s.createDataset(graft.sources.ExpectedKg.incrementalPatches(n, 2)).toDF()
        .coalesce(1).write.mode("overwrite").parquet(expectedRemapDir)
      val root = freshRoot("/tmp/graft_q_pipeline_remap")
      val pipe = new graft.streaming.QuadLogPipeline(s, root, numBuckets = 8)
      pipe.bootstrap(graft.sources.PageGen.snapshot(s, n, 0), "e1", "00000000000000")
      for (snap <- 1 to 2) {
        val changed = s.createDataset(
          graft.sources.ExpectedKg.changedIndices(n, snap)
            .map(graft.sources.PageGen.pageFor(_, snap)))
        val deleted = s.createDataset(
          graft.sources.ExpectedKg.deletedIndices(n, snap)
            .map(graft.sources.PageGen.urlFor))
        pipe.incremental(snap.toLong, f"2024010${snap + 1}%d000000", changed, deleted)
      }
      s.read.option("recursiveFileLookup", "true").textFile(s"$root/patches/batch_2")
        .flatMap(l => graft.rdf.NTriplesParser.parseLine(l, "").map(pl =>
          (pl.op, pl.quad.s, pl.quad.p, pl.quad.oLex, pl.quad.oKind,
            pl.quad.oDtype, pl.quad.oLang, pl.quad.g)))
        .toDF("op", "s", "p", "oLex", "oKind", "oDtype", "oLang", "g")
    })
  )

  // =====================================================================
  def oracleSql: Map[String, String] = Map(
    "q_s1_scan_filter" ->
      """SELECT doc_id, source, n_chars::BIGINT AS n_chars FROM documents
        |WHERE source NOT IN ('src0','src3')""".stripMargin,

    "q_f2_opcode_map" ->
      """SELECT op, count(*)::BIGINT AS n FROM (
        |  SELECT CASE WHEN event_type IN ('click','signup','purchase') THEN '+'
        |              WHEN event_type = 'error' THEN '-' END AS op FROM events)
        |WHERE op IS NOT NULL GROUP BY op""".stripMargin,

    "q_f3_payload_slot" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' THEN props
        |       ELSE 'u:' || user_id::VARCHAR END AS payload
        |FROM events""".stripMargin,

    "q_j4_graph_exclusion" ->
      """SELECT event_type, count(*)::BIGINT AS n FROM events
        |WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE value > 190)
        |GROUP BY event_type""".stripMargin,

    "q_a1_quads_per_graph" ->
      """SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
        |FROM documents GROUP BY source""".stripMargin,

    "q_a5_running_totals" ->
      """SELECT source, n, sum(n) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING)::BIGINT
        |  AS running_total
        |FROM (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source)""".stripMargin,

    "q_j1_diff_changelog" ->
      """WITH prev AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 7 <> 0),
        |     nxt  AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 5 <> 0),
        |     tagged AS (SELECT *, 1 AS w FROM prev UNION ALL SELECT *, 2 AS w FROM nxt)
        |SELECT o_orderkey, o_orderpriority,
        |       CASE WHEN sum(DISTINCT w) = 2 THEN '+' ELSE '-' END AS op
        |FROM tagged GROUP BY o_orderkey, o_orderpriority HAVING sum(DISTINCT w) <> 3""".stripMargin,

    "q_w1_chunking" ->
      """SELECT doc_id, source,
        |       ((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 25)::BIGINT AS chunk
        |FROM documents""".stripMargin,

    "q_w2_packaging" ->
      """SELECT (doc_id // 100)::BIGINT AS batch, count(*)::BIGINT AS n_files,
        |       (count(*) = 100)::INT AS is_complete
        |FROM documents GROUP BY 1""".stripMargin,

    "q_a8_graph_index" ->
      """SELECT source, to_base64(encode(source)) AS b64, min(doc_id) AS first_seen
        |FROM documents GROUP BY source""".stripMargin,

    "q_x5_base64_dirs" ->
      """SELECT DISTINCT source, to_base64(encode(source)) AS b64 FROM documents""".stripMargin,

    "q_x6_checkpoint_ids" ->
      """SELECT event_id,
        |       'rdf_out_' || strftime(ts, '%Y%m%d%H%M%S') || '-' || lpad(event_id::VARCHAR, 14, '0') AS fname,
        |       strftime(ts, '%Y%m%d%H%M%S') AS cp,
        |       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso
        |FROM events""".stripMargin,

    "q_t2_watermark_filter" ->
      """SELECT event_type, count(*)::BIGINT AS n, strftime(max(ts), '%Y%m%d%H%M%S') AS max_ts14
        |FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00' GROUP BY event_type""".stripMargin,

    "q_stream_window" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       count(*)::BIGINT AS n,
        |       floor(sum(value::DOUBLE) * 100 + 0.5)::BIGINT AS sum_value_c2
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_kg_mentions" ->
      """SELECT DISTINCT doc_id, tok AS surface
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok IN ('spark','join','window','vector','customer','part')""".stripMargin,

    "q_kg_link_disambig" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks FROM documents)
        |SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('table','scan','merge')))::BIGINT AS sa,
        |  len(list_filter(toks, x -> x IN ('small','big','value')))::BIGINT AS sb,
        |  CASE WHEN len(list_filter(toks, x -> x IN ('table','scan','merge'))) >
        |            len(list_filter(toks, x -> x IN ('small','big','value')))
        |       THEN 'http://kg.example.org/entity/Part_physical'
        |       ELSE 'http://kg.example.org/entity/Part_logical' END AS entity
        |FROM d WHERE list_contains(toks, 'part')""".stripMargin,

    "q_kg_patchlines" ->
      """WITH m AS (SELECT DISTINCT doc_id, lang, source, tok AS surface FROM
        |  (SELECT doc_id, lang, source, unnest(string_split(text,' ')) AS tok FROM documents)
        |  WHERE tok IN ('spark','join','window','vector','customer')),
        |e(surface, entity) AS (VALUES
        |  ('spark','http://kg.example.org/entity/Spark'),
        |  ('join','http://kg.example.org/entity/Join'),
        |  ('window','http://kg.example.org/entity/Window'),
        |  ('vector','http://kg.example.org/entity/Vector'),
        |  ('customer','http://kg.example.org/entity/Customer'))
        |SELECT m.doc_id, m.surface,
        |  '+ <http://doc.example.org/' || m.doc_id || '> ' ||
        |  '<http://kg.example.org/ontology/mentions> ' ||
        |  '<' || e.entity || '> ' ||
        |  '<http://graph.example.org/' || m.source || '> .' AS line
        |FROM m JOIN e ON m.surface = e.surface""".stripMargin,

    "q_x4_escaping" ->
      ("""SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(replace(replace(
        |    'a\b' || chr(9) || 'c' || chr(10) || 'd"e' || lang,
        |    '\', '\\'), chr(7), '\a'), chr(8), '\b'), chr(9), '\t'),
        |    chr(10), '\n'), chr(12), '\f'), chr(13), '\r'), '"', '\"') AS escaped
        |FROM documents""").stripMargin,

    "q_canon_connected_components" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT 'u' || user_id::VARCHAR AS src, 't' || event_type AS dst FROM events),
        |und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM und
        |  UNION
        |  SELECT reach.id, u.dst FROM reach JOIN und u ON reach.r = u.src)
        |SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id""".stripMargin,

    "q_canon_cc_distributed" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT 'u' || user_id::VARCHAR AS src, 't' || event_type AS dst FROM events),
        |und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM und
        |  UNION
        |  SELECT reach.id, u.dst FROM reach JOIN und u ON reach.r = u.src)
        |SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id""".stripMargin,

    "q_dedup_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |g AS (SELECT digest, min(doc_id) AS canonical_id, count(*)::BIGINT AS group_size
        |      FROM h GROUP BY digest)
        |SELECT h.doc_id, g.canonical_id, g.group_size FROM h JOIN g USING (digest)""".stripMargin,

    "q_dedup_minhash_sig" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks FROM documents)
        |SELECT doc_id,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#0'),1,15))::BIGINT)) AS h0,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#1'),1,15))::BIGINT)) AS h1,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#2'),1,15))::BIGINT)) AS h2,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#3'),1,15))::BIGINT)) AS h3
        |FROM d""".stripMargin,

    "q_dedup_minhash_pairs" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks FROM documents),
        |sigs AS (SELECT doc_id,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#0'),1,15))::BIGINT)) AS h0,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#1'),1,15))::BIGINT)) AS h1,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#2'),1,15))::BIGINT)) AS h2,
        |  list_min(list_transform(toks, t -> ('0x'||substr(md5(t||'#3'),1,15))::BIGINT)) AS h3
        | FROM d),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b FROM sigs a JOIN sigs b
        |    ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
        |  UNION
        |  SELECT a.doc_id, b.doc_id FROM sigs a JOIN sigs b
        |    ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)
        |SELECT p.a, p.b,
        |  ((sa.h0 = sb.h0)::BIGINT + (sa.h1 = sb.h1)::BIGINT +
        |   (sa.h2 = sb.h2)::BIGINT + (sa.h3 = sb.h3)::BIGINT) AS agree
        |FROM pairs p JOIN sigs sa ON p.a = sa.doc_id JOIN sigs sb ON p.b = sb.doc_id""".stripMargin,

    "q_dedup_simhash" -> {
      val bitSum = (b: Int) =>
        s"list_sum(list_transform(toks, t -> CASE WHEN ((('0x'||substr(md5(t||'#99'),1,15))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END))"
      val fp = (0 until 16)
        .map(b => s"(CASE WHEN ${bitSum(b)} > 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks FROM documents)
         |SELECT doc_id, ($fp)::BIGINT AS simhash FROM d""".stripMargin
    },

    "q_dedup_simhash_pairs" -> {
      val bitSum = (b: Int) =>
        s"list_sum(list_transform(toks, t -> CASE WHEN ((('0x'||substr(md5(t||'#99'),1,15))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END))"
      val fp = (0 until 32)
        .map(b => s"(CASE WHEN ${bitSum(b)} > 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks FROM documents),
         |fp AS (SELECT doc_id, ($fp)::BIGINT AS simhash FROM d),
         |banded AS (SELECT doc_id, simhash, b AS band, (simhash >> (b*8)) & 255 AS key
         |  FROM fp, range(0,4) t(b)),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS fa, r.simhash AS fb
         |  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
         |SELECT a, b, bit_count(xor(fa, fb))::BIGINT AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 2""".stripMargin
    },

    // shingle expr mirrors Dedup.shinglesScala EXACTLY incl. the truncated
    // tail for docs shorter than n tokens: positions 1..max(len-2,1), each
    // shingle sliced to least(i+2, len) — range(1, greatest(len-2,0)+1)
    // would emit NO shingle for a 1-2-token doc where Spark emits one short
    // shingle (masked at current sf because the corpora have no short docs)
    "q_dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:least(i+2, len(string_split(text,' ')))], ' ')),
        |    x -> len(x) > 0)) AS toks FROM documents),
        |t2 AS (SELECT * FROM t WHERE len(toks) > 0),
        |sizes AS (SELECT doc_id, len(toks)::BIGINT AS n_toks FROM t2),
        |ex AS (SELECT doc_id, unnest(toks) AS sh FROM t2),
        |rare AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= 64),
        |pruned AS (SELECT ex.doc_id, ex.sh FROM ex JOIN rare USING (sh)),
        |common AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS inter
        |  FROM pruned l JOIN pruned r ON l.sh = r.sh AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, floor(inter::DOUBLE / (sa.n_toks + sb.n_toks - inter) * 10000 + 0.5)::BIGINT AS jaccard_x1e4
        |FROM common JOIN sizes sa ON common.a = sa.doc_id JOIN sizes sb ON common.b = sb.doc_id
        |WHERE inter::DOUBLE / (sa.n_toks + sb.n_toks - inter) >= 0.05""".stripMargin,

    // same truncated-tail shingle mirror as q_dedup_ngram_jaccard
    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:least(i+2, len(string_split(text,' ')))], ' ')),
        |    x -> len(x) > 0)) AS toks FROM documents),
        |t2 AS (SELECT * FROM t WHERE len(toks) > 0),
        |sizes AS (SELECT doc_id, len(toks)::BIGINT AS n_toks FROM t2),
        |ex AS (SELECT doc_id, unnest(toks) AS sh FROM t2),
        |rare AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= 64),
        |pruned AS (SELECT ex.doc_id, ex.sh FROM ex JOIN rare USING (sh)),
        |common AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS inter
        |  FROM pruned l JOIN pruned r ON l.sh = r.sh AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a::VARCHAR AS a, b::VARCHAR AS b
        |  FROM common JOIN sizes sa ON common.a = sa.doc_id JOIN sizes sb ON common.b = sb.doc_id
        |  WHERE inter::DOUBLE / (sa.n_toks + sb.n_toks - inter) >= 0.05),
        |und AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM und
        |  UNION
        |  SELECT reach.id, u.dst FROM reach JOIN und u ON reach.r = u.src)
        |SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id""".stripMargin,

    "q_dedup_embed_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |b0 AS (SELECT vec_id, embedding, (${hyperplaneBucketSql("e", 4, 64, 42)}) AS bucket FROM e),
         |ok AS (SELECT bucket FROM b0 GROUP BY bucket HAVING count(*) <= 10000),
         |b AS (SELECT b0.vec_id, b0.embedding, b0.bucket FROM b0 JOIN ok USING (bucket)),
         |scored AS (SELECT l.vec_id AS a, r.vec_id AS b,
         |    ${cosineSql("l", "r", 64)} AS sim
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
         |SELECT a, b, floor(sim * 10000 + 0.5)::BIGINT AS sim_x1e4
         |FROM scored WHERE sim >= 0.25""".stripMargin,

    "q_ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |scored AS (SELECT q.q_id, e.vec_id AS n_id,
         |    ${cosineSqlCols("q.q_emb", "e.embedding", 64)} AS sim
         |  FROM q CROSS JOIN embeddings e WHERE q.q_id <> e.vec_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, rank::BIGINT AS rank, floor(sim*10000 + 0.5)::BIGINT AS sim_x1e4
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q_ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         |b0 AS (SELECT vec_id, embedding, (${hyperplaneBucketSql("e", 6, 64, 42)}) AS bucket FROM e),
         |ok AS (SELECT bucket FROM b0 GROUP BY bucket HAVING count(*) <= 64),
         |b AS (SELECT b0.vec_id, b0.embedding, b0.bucket FROM b0 JOIN ok USING (bucket)),
         |scored AS (SELECT l.vec_id AS q_id, r.vec_id AS n_id,
         |    ${cosineSql("l", "r", 64)} AS sim
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, rank::BIGINT AS rank, floor(sim*10000 + 0.5)::BIGINT AS sim_x1e4
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q_ann_ivf_topk" ->
      s"""WITH c AS (SELECT cid, cemb FROM read_parquet('$ivfCentroidsDir/*.parquet')),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |sims AS (SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosineSqlCols("e.embedding", "c.cemb", 64)} AS csim
         |  FROM e CROSS JOIN c),
         |asn AS (SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn FROM sims),
         |cells AS (SELECT vec_id, embedding, cid FROM asn WHERE rn = 1),
         |q AS (SELECT vec_id, embedding, cid FROM asn WHERE vec_id < 50 AND rn <= 2),
         |scored AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    ${cosineSqlCols("q.embedding", "n.embedding", 64)} AS sim
         |  FROM q JOIN cells n ON q.cid = n.cid AND q.vec_id <> n.vec_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, rank::BIGINT AS rank, floor(sim*10000 + 0.5)::BIGINT AS sim_x1e4
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q_txt_token_stats" ->
      """SELECT doc_id, length(text)::BIGINT AS n_chars,
        |  len(string_split(text,' '))::BIGINT AS n_tokens,
        |  len(list_filter(string_split(text,' '),
        |      x -> x IN ('the','a','of','and','to','in','is','de','la','el')))::BIGINT AS n_stopwords,
        |  list_max(list_transform(string_split(text,' '), x -> length(x)))::BIGINT AS max_token_len
        |FROM documents""".stripMargin,

    "q_txt_quality" ->
      """WITH g AS (SELECT doc_id, text || '. End; X? ' || upper(lang) AS text FROM documents)
        |SELECT doc_id,
        |  length(text)::BIGINT AS n_chars,
        |  len(string_split(text,' '))::BIGINT AS n_tokens,
        |  (len(string_split_regex(text, '[.,;:!?]')) - 1)::BIGINT AS n_punct,
        |  length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS n_upper,
        |  (len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> len(x) > 0))
        |   + length(regexp_replace(text, '[A-Za-z0-9]', '', 'g')))::BIGINT AS n_subwords
        |FROM g""".stripMargin,

    "q_txt_langid" ->
      """WITH s AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','und'))) AS s_de,
        |  len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) AS s_en,
        |  len(list_filter(string_split(text,' '), x -> x IN ('el','la','de'))) AS s_es,
        |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','et'))) AS s_fr,
        |  len(list_filter(string_split(text,' '), x -> x IN ('de','het','een'))) AS s_nl
        | FROM documents)
        |SELECT doc_id, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_nl THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_nl THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_nl THEN 'es'
        |  WHEN s_fr >= s_nl THEN 'fr' ELSE 'nl' END AS lang_guess
        |FROM s""".stripMargin,

    "q_txt_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 2
        |             THEN list_transform(range(1, len(toks)),
        |                    i -> toks[i] || ' ' || toks[i + 1])
        |             ELSE [] END AS grams,
        |        len(toks)::BIGINT AS n_tokens FROM t),
        |ex AS (SELECT doc_id, unnest(grams) AS g FROM b),
        |c AS (SELECT doc_id, g, count(*)::BIGINT AS n FROM ex GROUP BY 1, 2),
        |top AS (SELECT doc_id, g, n,
        |          row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g) AS rn
        |        FROM c)
        |SELECT b.doc_id, b.n_tokens,
        |       coalesce(top.g, '') AS top_bigram,
        |       coalesce(top.n, 0)::BIGINT AS top_bigram_n
        |FROM b LEFT JOIN top ON b.doc_id = top.doc_id AND top.rn = 1""".stripMargin,

    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:least(i+2, len(string_split(text,' ')))], ' ')),
        |    x -> len(x) > 0)) AS toks FROM documents),
        |ex AS (SELECT doc_id, unnest(toks) AS sh FROM t),
        |bench AS (SELECT DISTINCT sh FROM ex WHERE doc_id < 5),
        |hits AS (SELECT doc_id, count(DISTINCT ex.sh)::BIGINT AS shared
        |         FROM ex JOIN bench USING (sh) WHERE doc_id >= 5 GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(hits.shared, 0)::BIGINT AS shared,
        |       (coalesce(hits.shared, 0) >= 2)::INT AS contaminated
        |FROM documents d LEFT JOIN hits USING (doc_id) WHERE d.doc_id >= 5""".stripMargin,

    "q_txt_pii_mask" ->
      """WITH g AS (SELECT doc_id,
        |    text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-123-4567 and x'
        |         || doc_id::VARCHAR || '@sub.example.org' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b'))::BIGINT AS n_phones,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b', '<PHONE>', 'g') AS masked
        |FROM g""".stripMargin,

    "q_sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || '#split'), 1, 15))::BIGINT % 100 < 90 THEN 'train'
        |       WHEN ('0x' || substr(md5(doc_id::VARCHAR || '#split'), 1, 15))::BIGINT % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "q_txt_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(0::BIGINT, list_transform(
        |    string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ''),
        |    c -> ascii(c)::BIGINT)),
        |  (a, c) -> (a * 31 + c) % 1000000007) AS fp
        |FROM documents""".stripMargin,

    "q_mm_media_meta" ->
      """SELECT doc_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
        |  CASE doc_id % 3
        |    WHEN 0 THEN (CASE WHEN (doc_id // 3) % 2 = 0 THEN 'png' ELSE 'jpeg' END)
        |    WHEN 1 THEN 'wav' ELSE 'gif' END AS container,
        |  CASE doc_id % 3
        |    WHEN 0 THEN octet_length(encode(text)) +
        |      CASE WHEN (doc_id // 3) % 2 = 0 THEN 57 ELSE 23 END
        |    WHEN 1 THEN 44 + octet_length(encode(text)) + octet_length(encode(text)) % 2
        |    ELSE octet_length(encode(text)) + 17 + (octet_length(encode(text)) + 254) // 255
        |  END::BIGINT AS byte_len,
        |  CASE doc_id % 3 WHEN 0 THEN doc_id % 512 + 1
        |    WHEN 1 THEN 8000 + doc_id % 32000
        |    ELSE doc_id % 256 + 1 END::BIGINT AS dim1,
        |  CASE doc_id % 3 WHEN 0 THEN (doc_id * 7) % 512 + 1
        |    WHEN 1 THEN doc_id % 2 + 1
        |    ELSE (doc_id * 3) % 256 + 1 END::BIGINT AS dim2,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin,

    "q_mm_image_dims" ->
      """SELECT doc_id,
        |  CASE WHEN (doc_id // 3) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container,
        |  (doc_id % 512 + 1)::BIGINT AS width,
        |  ((doc_id * 7) % 512 + 1)::BIGINT AS height,
        |  (octet_length(encode(text)) +
        |    CASE WHEN (doc_id // 3) % 2 = 0 THEN 57 ELSE 23 END)::BIGINT AS byte_len
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,

    "q_mm_frame_sample" ->
      """WITH v AS (SELECT doc_id, md5(text) AS checksum,
        |    octet_length(encode(text)) AS byte_len
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, unnest(range(0, (byte_len % 240) + 1, 4))::BIGINT AS frame, checksum
        |FROM v""".stripMargin,

    "q_agg_star_join" ->
      """SELECT n_name,
        |  sum(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5)::BIGINT)::BIGINT
        |    AS revenue_c4,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_o1_cluster_by_graph" ->
      """SELECT source, lang, doc_id FROM documents ORDER BY source, lang, doc_id""".stripMargin,

    "q_graph_adjacency" ->
      """WITH edges AS (
        |  SELECT 'u' || user_id::VARCHAR AS s,
        |         't' || event_type || ':' || count(*)::VARCHAR AS e
        |  FROM events GROUP BY user_id, event_type),
        |r AS (SELECT s, e, row_number() OVER (PARTITION BY s ORDER BY e) AS rn FROM edges),
        |g AS (SELECT s, ((rn - 1) // 3)::BIGINT AS page, e FROM r)
        |SELECT s, page, count(*)::BIGINT AS degree,
        |       string_agg(e, ',' ORDER BY e) AS adj,
        |       (('0x' || substr(md5(s || '#b'), 1, 15))::BIGINT % 32)::BIGINT AS bucket
        |FROM g GROUP BY s, page""".stripMargin,

    "q_pipeline_bootstrap" ->
      s"""SELECT op, s, p, oLex, oKind, oDtype, oLang, g
         |FROM read_parquet('$expectedBootstrapDir/*.parquet')""".stripMargin,

    "q_pipeline_incremental" ->
      s"""SELECT op, s, p, oLex, oKind, oDtype, oLang, g
         |FROM read_parquet('$expectedIncrementalDir/*.parquet')""".stripMargin,

    "q_pipeline_remap" ->
      s"""SELECT op, s, p, oLex, oKind, oDtype, oLang, g
         |FROM read_parquet('$expectedRemapDir/*.parquet')""".stripMargin
  )
}
