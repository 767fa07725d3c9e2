package graft.state

import graft.GraftSpec
import org.apache.spark.sql.functions._

class SnapshotStoreSpec extends GraftSpec {
  import spark.implicits._

  test("commit/read round trip with atomic latest pointer") {
    val root = tmpDir("store1")
    val st = new SnapshotStore(spark, root, numBuckets = 4)
    assert(st.latest.isEmpty)
    val df = (1 to 100).map(i => (s"k$i", i)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(df, 0L)
    assert(st.latest.contains(0L))
    val back = st.read().get
    assert(back.count() == 100)
    assert(back.select(sum("v")).head().getLong(0) == 5050)
  }

  test("mixed-schema chain folds to the common columns, both directions") {
    // schema evolution across binary generations (the canon `sig` column):
    // a base without the evolved column under a delta that carries it — or
    // the reverse, after a binary rollback wrote one old-format delta —
    // must fold to the columns every generation has, never crash the read
    // and never resurrect half-present values.
    def mk(root: String) = new SnapshotStore(spark, root, numBuckets = 2,
      deleteKeys = Seq("k"), maxDeltas = 10)
    // old base (k, v), new delta adds `extra`
    val st1 = mk(tmpDir("storeEvo1"))
    val base1 = (1 to 10).map(i => (s"k$i", i)).toDF("k", "v")
      .withColumn("bucket", st1.bucketCol(col("k")))
    st1.commitFull(base1, 0L)
    val add1 = Seq(("k1", 100, "x")).toDF("k", "v", "extra")
      .withColumn("bucket", st1.bucketCol(col("k")))
    st1.commitDelta(add1, add1.select("k", "bucket"), 1L)
    val back1 = st1.read().get
    assert(back1.columns.toSeq == Seq("k", "v", "bucket"), back1.columns.mkString(","))
    assert(back1.filter(col("k") === "k1").select("v").as[Int].head() == 100)
    assert(back1.count() == 10)
    // new base (k, v, extra), rolled-back delta without `extra`
    val st2 = mk(tmpDir("storeEvo2"))
    val base2 = (1 to 10).map(i => (s"k$i", i, s"e$i")).toDF("k", "v", "extra")
      .withColumn("bucket", st2.bucketCol(col("k")))
    st2.commitFull(base2, 0L)
    val add2 = Seq(("k2", 200)).toDF("k", "v")
      .withColumn("bucket", st2.bucketCol(col("k")))
    st2.commitDelta(add2, add2.select("k", "bucket"), 1L)
    val back2 = st2.read().get
    assert(back2.columns.toSeq == Seq("k", "v", "bucket"), back2.columns.mkString(","))
    assert(back2.filter(col("k") === "k2").select("v").as[Int].head() == 200)
    assert(back2.count() == 10)
  }

  test("mergeBuckets rewrites only affected buckets; others carried forward") {
    val root = tmpDir("store2")
    val st = new SnapshotStore(spark, root, numBuckets = 4)
    val df = (1 to 100).map(i => (s"k$i", i)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(df, 0L)
    // rewrite bucket of k1: replace contents with a single row
    val b1 = df.filter(col("k") === "k1").select("bucket").as[Int].head()
    val replacement = Seq(("k1", 999)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.mergeBuckets(replacement, Seq(b1), 1L)
    assert(st.latest.contains(1L))
    val back = st.read().get.select("k", "v").as[(String, Int)].collect().toMap
    assert(back("k1") == 999)
    // untouched buckets intact
    val untouched = df.filter(col("bucket") =!= b1).count()
    assert(back.size == untouched + 1)
    // bucket-pruned read returns only that bucket
    val pruned = st.readBuckets(Seq(b1)).get
    assert(pruned.select("bucket").distinct().as[Int].collect().toSeq == Seq(b1))
  }

  test("bucket can be emptied by a merge") {
    val root = tmpDir("store3")
    val st = new SnapshotStore(spark, root, numBuckets = 2)
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(df, 0L)
    val allBuckets = df.select("bucket").distinct().as[Int].collect().toSeq
    st.mergeBuckets(df.limit(0), allBuckets, 1L)
    assert(st.read().isEmpty || st.read().get.count() == 0)
  }

  test("epoch handshake") {
    val root = tmpDir("store4")
    val st = new SnapshotStore(spark, root, numBuckets = 2)
    assert(st.epoch.isEmpty)
    st.setEpoch("run-42")
    assert(st.epoch.contains("run-42"))
  }

  /** Reference model: apply delta batches to a plain Map and compare the
    * store's folded read against it after every commit. */
  test("merge-on-read deltas: fold equals the closed-form state; chain folds to base") {
    val root = tmpDir("store5")
    val maxD = 3
    // foldBucketBytes = 0: every data-bearing bucket is "hot", i.e. the
    // original full fold-to-base — this test pins THAT behavior (base
    // advances past the bootstrap snapshot); partial folds have their own
    // tests below
    val st = new SnapshotStore(spark, root, numBuckets = 4,
      deleteKeys = Seq("k"), maxDeltas = maxD, foldBucketBytes = 0L)
    def rows(kv: Seq[(String, Int)]) = kv.toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    var model: Map[String, Int] = (1 to 50).map(i => s"k$i" -> i).toMap
    st.commitFull(rows(model.toSeq), 0L)
    // 10 delta batches (> 3x maxDeltas => several fold-to-base cycles):
    // each rewrites some keys, deletes some, inserts some
    for (b <- 1 to 10) {
      val rewrite = (1 to 5).map(i => s"k${(b * 7 + i) % 50 + 1}" -> (1000 * b + i))
      val dead = Seq(s"k${(b * 11) % 50 + 1}", s"k${(b * 13) % 50 + 1}")
      val insert = Seq(s"new_${b}" -> (9000 + b))
      val adds = (rewrite ++ insert).toMap // rewrite may collide with dead keys
      val tombKeys = (adds.keys ++ dead).toSeq.distinct
      model = (model -- tombKeys) ++ adds
      st.commitDelta(rows(adds.toSeq),
        tombKeys.toDF("k").withColumn("bucket", st.bucketCol(col("k"))), b.toLong)
      val back = st.read().get.select("k", "v").as[(String, Int)].collect().toMap
      assert(back == model, s"fold mismatch after batch $b")
    }
    // chain is bounded: at most maxDeltas delta lines in the live manifest
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$root/manifest_${f"${10L}%014d"}.txt"))
    val chainLen = manifest.linesIterator.count(_.startsWith("D\t"))
    assert(chainLen <= maxD, s"chain grew to $chainLen (> $maxD): compaction never ran")
    // and at least one fold-to-base happened (manifest 10 cannot still
    // chain back to snapshot 0's base after 10 > maxDeltas batches)
    assert(!manifest.contains("snap_00000000000000"),
      "base never advanced past the bootstrap snapshot")
    // bucket-pruned folded read: only requested buckets come back
    val someBucket = st.read().get.select("bucket").as[Int].head()
    val pruned = st.readBuckets(Seq(someBucket)).get
    assert(pruned.select("bucket").distinct().as[Int].collect().toSeq == Seq(someBucket))
    val expectInBucket = st.read().get.filter(col("bucket") === someBucket).count()
    assert(pruned.count() == expectInBucket)
    // vacuum: disk stays O(live state) — only the referenced snap dirs and
    // the latest manifest survive, and the folded read still matches
    st.vacuum()
    val left = new java.io.File(root).listFiles().map(_.getName)
    val snapsLeft = left.count(_.startsWith("snap_"))
    assert(snapsLeft <= maxD + 1,
      s"$snapsLeft snapshot dirs survive vacuum (chain bound $maxD + base)")
    assert(left.count(_.startsWith("manifest_")) == 1, "stale manifests survive vacuum")
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap == model,
      "vacuum deleted referenced data")
  }

  test("a committed store reads back as ONE relation, not a per-bucket union") {
    // regression guard for the round-5 read fix: a union of 32 per-bucket
    // spark.read.parquet relations cost 32 driver-side file listings +
    // schema inferences on EVERY store read — seconds of non-scaling
    // latency per pipeline batch
    val root = tmpDir("store8")
    val st = new SnapshotStore(spark, root, numBuckets = 16)
    val df = (1 to 200).map(i => (s"k$i", i)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(df, 0L)
    def relationCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p.collect {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation => 1
      }.sum
    assert(relationCount(st.read().get.queryExecution.optimizedPlan) == 1,
      "full read planned more than one parquet relation")
    assert(relationCount(st.readBuckets(Seq(0, 3, 7)).get.queryExecution.optimizedPlan) == 1,
      "bucket-pruned read planned more than one parquet relation")
    // and the pruned read only scans the requested buckets
    val pruned = st.readBuckets(Seq(0, 3, 7)).get
    assert(pruned.select("bucket").distinct().as[Int].collect().toSet.subsetOf(Set(0, 3, 7)))
  }

  test("lease claim is atomic: racing claimants get exactly one winner") {
    val root = tmpDir("store_lease")
    val stores = (0 until 8).map(_ => new SnapshotStore(spark, root, numBuckets = 2))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(stores.size)
    val results = stores.map { s =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          start.await()
          try { s.claimLease(); true } catch { case _: RuntimeException => false }
        }
      })
    }
    start.countDown()
    pool.shutdown(); assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    val winners = results.count(_.get())
    assert(winners == 1, s"$winners racing claims succeeded (want exactly 1)")
    // winner can re-claim (retry path) and release; a new writer then claims
    val w = stores(results.indexWhere(_.get()))
    w.claimLease(); w.releaseLease()
    val next = new SnapshotStore(spark, root, numBuckets = 2)
    next.claimLease(); next.releaseLease()
  }

  test("a failed stage releases the lease (try/finally), store intact") {
    val root = tmpDir("store_leaserel") + "/t"
    val st = new SnapshotStore(spark, root, numBuckets = 2,
      deleteKeys = Seq("k"))
    val base = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(base, 0L)
    // additions whose evaluation THROWS mid-stage: previously the thrown
    // Spark job left `_lease` behind and a restarted writer (fresh
    // writerId) was locked out for the lease timeout
    val bad = Seq(("c", 3)).toDF("k", "v").as[(String, Int)]
      .map { _ => sys.error("injected stage failure"): (String, Int) }
      .toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    intercept[Exception] {
      st.stageDelta(bad, bad.select("k", "bucket"), 1L)
    }
    // a DIFFERENT writer instance must be able to mutate immediately
    val st2 = new SnapshotStore(spark, root, numBuckets = 2, deleteKeys = Seq("k"))
    val add = Seq(("c", 3)).toDF("k", "v").withColumn("bucket", st2.bucketCol(col("k")))
    st2.commitDelta(add, add.select("k", "bucket"), 2L)
    assert(st2.read().get.count() == 3)
  }

  test("stageDelta refuses on a COW-only store; stageMerge refuses over a live chain") {
    val root = tmpDir("store6")
    val cow = new SnapshotStore(spark, root + "/cow", numBuckets = 2)
    val df = Seq(("a", 1)).toDF("k", "v").withColumn("bucket", cow.bucketCol(col("k")))
    cow.commitFull(df, 0L)
    intercept[IllegalArgumentException] {
      cow.stageDelta(df, df.select("k", "bucket"), 1L)
    }
    val mor = new SnapshotStore(spark, root + "/mor", numBuckets = 2,
      deleteKeys = Seq("k"), maxDeltas = 8)
    mor.commitFull(df, 0L)
    mor.commitDelta(Seq(("b", 2)).toDF("k", "v").withColumn("bucket", mor.bucketCol(col("k"))),
      Seq("b").toDF("k").withColumn("bucket", mor.bucketCol(col("k"))), 1L)
    intercept[IllegalArgumentException] {
      mor.stageMerge(df, Seq(0, 1), 2L)
    }
  }

  test("seeded fuzz: random delta sequences match the model across maxDeltas settings") {
    // deterministic pseudo-random batches exercising the edges the
    // structured test cannot: pure deletes, tombstones of nonexistent
    // keys, re-adding a key deleted earlier in the chain, rewriting the
    // same key in consecutive deltas, empty batches — across chain
    // bounds that fold never/sometimes/every-batch
    // foldBucketBytes axis: 0 = always full fold; 2 KB = MIXED (parquet
    // per-bucket delta files are ~1 KB, so some buckets trip and some
    // don't across fold events); 8 MB = consolidation-only (no bucket
    // ever folds to base at this data size)
    // tombBroadcastBytes axis: 0 forces the read fold's BLOOM-SPLIT path
    // (the over-gate fallback that replaces the store-sized shuffle) on
    // every tombstone-bearing read; default keeps the broadcast path
    val rnd = new scala.util.Random(42)
    for ((maxD, run, fbb, tbb) <- Seq(
           (1, "a", 0L, 64L << 20), (2, "b", 2048L, 0L), (4, "c", 8L << 20, 0L),
           (2, "d", 0L, 64L << 20), (1, "e", 8L << 20, 0L))) {
      val root = tmpDir(s"storefuzz_$run") + "/t"
      val st = new SnapshotStore(spark, root, numBuckets = 4,
        deleteKeys = Seq("k"), maxDeltas = maxD, foldBucketBytes = fbb,
        tombBroadcastBytes = tbb)
      def rows(kv: Seq[(String, Int)]) = kv.toDF("k", "v")
        .withColumn("bucket", st.bucketCol(col("k")))
      var model: Map[String, Int] = (1 to 30).map(i => s"k$i" -> i).toMap
      st.commitFull(rows(model.toSeq), 0L)
      for (b <- 1 to 6) {
        val universe = (1 to 40).map(i => s"k$i")
        val adds = universe.filter(_ => rnd.nextInt(100) < 25)
          .map(k => k -> rnd.nextInt(10000)).toMap
        val pureDeletes = universe.filter(_ => rnd.nextInt(100) < 15)
        val ghosts = Seq(s"ghost_${b}_${rnd.nextInt(5)}") // never existed
        val tombKeys = (adds.keys ++ pureDeletes ++ ghosts).toSeq.distinct
        model = (model -- tombKeys) ++ adds
        st.commitDelta(rows(adds.toSeq),
          tombKeys.toDF("k").withColumn("bucket", st.bucketCol(col("k"))), b.toLong)
        val back = st.read().get.select("k", "v").as[(String, Int)].collect().toMap
        assert(back == model,
          s"maxDeltas=$maxD batch=$b: extra=${(back.toSet -- model.toSet).take(3)} " +
            s"missing=${(model.toSet -- back.toSet).take(3)}")
      }
      st.vacuum()
      assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap == model)
    }
  }

  test("bucket-local fold: hot bucket folds to a new base, quiet chain consolidates") {
    val root = tmpDir("store9")
    val maxD = 2
    val st = new SnapshotStore(spark, root, numBuckets = 4,
      deleteKeys = Seq("k"), maxDeltas = maxD, foldBucketBytes = 50000L)
    def rows(kv: Seq[(String, String)]) = kv.toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    // discover key->bucket routing driver-side so the test can target one
    // bucket with fat payloads and keep the others quiet
    val keys = (1 to 200).map(i => s"k$i")
    val kb = rows(keys.map(_ -> "x")).select("k", "bucket")
      .as[(String, Int)].collect().toMap
    val hotBucket = kb("k1")
    val hotKeys = keys.filter(k => kb(k) == hotBucket)
    val quietKeys = keys.filterNot(k => kb(k) == hotBucket)
    assert(hotKeys.size >= 10 && quietKeys.size >= 10, "bucketing degenerated")
    // payloads must be INCOMPRESSIBLE (random), or parquet's codec erases
    // the byte-size signal the hot/quiet split keys on
    val prnd = new scala.util.Random(7)
    def fat(): String = Array.fill(10000)((' ' + prnd.nextInt(94)).toChar).mkString
    var model: Map[String, String] = keys.map(_ -> "base").toMap
    st.commitFull(rows(model.toSeq), 0L)
    // 3 deltas (chain trips at the 3rd): each writes ~10 fat rows into the
    // hot bucket (~100 KB per delta) and 2 small rows elsewhere
    for (b <- 1 to 3) {
      val adds = (hotKeys.take(10).map(k => k -> s"${fat()}$b") ++
        quietKeys.slice(2 * b, 2 * b + 2).map(k => k -> s"small$b")).toMap
      model = model ++ adds
      st.commitDelta(rows(adds.toSeq),
        adds.keys.toSeq.toDF("k").withColumn("bucket", st.bucketCol(col("k"))), b.toLong)
      assert(st.read().get.select("k", "v").as[(String, String)].collect().toMap == model,
        s"fold mismatch after batch $b")
    }
    // manifest shape after the fold at batch 3: the hot bucket's base moved
    // to the fold dir (snap_...3B), quiet buckets still point at snap_0's
    // base, and the chain is ONE delta scoped to a set excluding hotBucket
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$root/manifest_${f"${3L}%014d"}.txt"))
    val baseLines = manifest.linesIterator.filterNot(_.startsWith("D\t")).toSeq
    val hotLine = baseLines.find(_.startsWith(s"$hotBucket\t")).get
    assert(hotLine.contains("B/bucket="), s"hot bucket base did not fold: $hotLine")
    assert(baseLines.filterNot(_.startsWith(s"$hotBucket\t"))
      .forall(l => l.endsWith("\t") || l.contains("snap_00000000000000/")),
      s"quiet bucket base was rewritten: $baseLines")
    val dLines = manifest.linesIterator.filter(_.startsWith("D\t")).toSeq
    assert(dLines.size == 1, s"chain not consolidated: $dLines")
    val scope = dLines.head.split("\t").last
    assert(scope != "*" && !scope.split(",").contains(hotBucket.toString),
      s"consolidated delta not scoped away from the hot bucket: $scope")
    // continue committing past the fold; semantics hold, then vacuum
    for (b <- 4 to 6) {
      val adds = Map(quietKeys(b) -> s"later$b", hotKeys(b) -> s"later$b")
      model = model ++ adds
      st.commitDelta(rows(adds.toSeq),
        adds.keys.toSeq.toDF("k").withColumn("bucket", st.bucketCol(col("k"))), b.toLong)
    }
    st.vacuum()
    assert(st.read().get.select("k", "v").as[(String, String)].collect().toMap == model)
    // bucket-pruned read of the hot bucket agrees with the full fold
    val hotRows = st.readBuckets(Seq(hotBucket)).get
      .select("k", "v").as[(String, String)].collect().toMap
    assert(hotRows == model.filter { case (k, _) => kb(k) == hotBucket })
  }

  test("empty delta is metadata-only: no chain growth, no fold, no data dirs") {
    val root = tmpDir("store10")
    val st = new SnapshotStore(spark, root, numBuckets = 2,
      deleteKeys = Seq("k"), maxDeltas = 2)
    val base = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(base, 0L)
    val empty = base.limit(0)
    // maxDeltas(=2)+3 empty batches: were these appended, the chain bound
    // would have tripped a pointless fold-to-base
    for (b <- 1 to 5)
      st.commitDelta(empty, empty.select("k", "bucket"), b.toLong)
    assert(st.latest.contains(5L))
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$root/manifest_${f"${5L}%014d"}.txt"))
    assert(!manifest.contains("D\t"), s"empty deltas grew the chain: $manifest")
    val snapDirs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("snap_")).toSeq
    assert(snapDirs == Seq("snap_00000000000000"), s"empty deltas wrote data: $snapDirs")
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap ==
      Map("a" -> 1, "b" -> 2))
    // contract check still bites: additions without covering tombstones
    intercept[IllegalArgumentException] {
      st.commitDelta(Seq(("c", 3)).toDF("k", "v")
        .withColumn("bucket", st.bucketCol(col("k"))), empty.select("k", "bucket"), 6L)
    }
  }

  test("term sidecars: candidateBuckets prunes point lookups, never loses a row") {
    val root = tmpDir("store11")
    val nb = 8
    val st = new SnapshotStore(spark, root, numBuckets = nb,
      deleteKeys = Seq("k"), maxDeltas = 8,
      termExpr = Some(array(col("t1"), col("t2"))))
    def rows(kvt: Seq[(String, String, String)]) = kvt.toDF("k", "t1", "t2")
      .withColumn("bucket", st.bucketCol(col("k")))
    val base = (1 to 64).map(i => (s"k$i", s"term_$i", if (i % 2 == 0) s"shared_even" else null))
    st.commitFull(rows(base), 0L)
    val kb = rows(base).select("k", "bucket").as[(String, Int)].collect().toMap

    // no false negative: a stored term's bucket is always a candidate
    for (i <- Seq(1, 17, 33, 64)) {
      val cand = st.candidateBuckets(Seq(s"term_$i")).get
      assert(cand.contains(kb(s"k$i")), s"term_$i's bucket pruned away")
    }
    // shared term: every bucket holding an even key is a candidate
    val evenBuckets = base.filter(_._1.stripPrefix("k").toInt % 2 == 0)
      .map(t => kb(t._1)).toSet
    assert(evenBuckets.subsetOf(st.candidateBuckets(Seq("shared_even")).get.toSet))
    // absent term: pruned well below the full bucket set (bloom FPR ~1%;
    // deterministic data + hash make this stable)
    val absent = st.candidateBuckets(Seq("no_such_term_xyz")).get
    assert(absent.size < nb, s"absent term candidates not pruned: $absent")
    // plan shape: the pruned read's input files stay inside candidate buckets
    val cand1 = st.candidateBuckets(Seq("term_1")).get
    st.readBuckets(cand1).foreach { df =>
      val ok = cand1.map(b => s"bucket=$b/").toSet
      assert(df.inputFiles.forall(f => ok.exists(f.contains)),
        s"pruned read scanned outside candidate buckets: ${df.inputFiles.toSeq}")
    }

    // delta adds extend the index: a brand-new term in a delta is findable
    val adds = Seq(("k100", "delta_term", null: String))
    st.commitDelta(rows(adds),
      Seq("k100").toDF("k").withColumn("bucket", st.bucketCol(col("k"))), 1L)
    val cand2 = st.candidateBuckets(Seq("delta_term")).get
    val b100 = rows(adds).select("bucket").as[Int].head()
    assert(cand2.contains(b100), "delta-added term's bucket pruned away")

    // delete-only delta writes an EMPTY authoritative sidecar: the delta
    // contributes no candidates (instead of conservatively its full scope)
    st.commitDelta(rows(Seq.empty),
      Seq("k5").toDF("k").withColumn("bucket", st.bucketCol(col("k"))), 2L)
    assert(new java.io.File(s"$root/snap_${f"${2L}%014d"}/_terms.bloom").exists(),
      "delete-only delta must land an empty sidecar")
    assert(st.candidateBuckets(Seq("still_absent_term")).get.size < nb)

    // conservative fallback: a dir with its sidecar gone contributes all
    // its buckets — pruning degrades, rows are never lost
    assert(new java.io.File(s"$root/snap_${f"${0L}%014d"}/_terms.bloom").delete())
    val candAll = st.candidateBuckets(Seq("no_such_term_xyz")).get.toSet
    assert(base.map(t => kb(t._1)).toSet.subsetOf(candAll),
      "missing sidecar must include all of that dir's buckets")

    // a store without termExpr has no index
    val plain = new SnapshotStore(spark, root + "_plain", numBuckets = 2)
    assert(plain.candidateBuckets(Seq("x")).isEmpty)
  }

  test("multi-writer guard: a live foreign lease fails a stage loudly, store intact") {
    val root = tmpDir("store12")
    val st = new SnapshotStore(spark, root, numBuckets = 2,
      deleteKeys = Seq("k"), maxDeltas = 8)
    val base = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(base, 0L)
    // simulate another writer mid-stage: a fresh lease under a foreign id
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/_lease"),
      "other-writer-uuid")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$root/._lease.crc"))
    val adds = Seq(("c", 3)).toDF("k", "v").withColumn("bucket", st.bucketCol(col("k")))
    val tombs = Seq("c").toDF("k").withColumn("bucket", st.bucketCol(col("k")))
    val e = intercept[RuntimeException] { st.stageDelta(adds, tombs, 1L) }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    intercept[RuntimeException] { st.stageFull(base, 1L) }
    intercept[RuntimeException] { st.vacuum() }
    // store unharmed: pointer and content unchanged
    assert(st.latest.contains(0L))
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap ==
      Map("a" -> 1, "b" -> 2))
    // operator break -> the stage proceeds; a completed stage releases the
    // lease so the next writer is never blocked
    st.breakLease()
    st.commitDelta(adds, tombs, 1L)
    assert(!new java.io.File(s"$root/_lease").exists(), "lease not released")
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 3))
    // a writer always re-claims its OWN lease (retry after failed stage)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/_lease"), st.writerId)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$root/._lease.crc"))
    st.commitDelta(Seq(("d", 4)).toDF("k", "v").withColumn("bucket", st.bucketCol(col("k"))),
      Seq("d").toDF("k").withColumn("bucket", st.bucketCol(col("k"))), 2L)
    assert(st.read().get.count() == 4)
  }

  test("delta re-stage after a crash is idempotent; finalize replays cleanly") {
    val root = tmpDir("store7")
    val st = new SnapshotStore(spark, root, numBuckets = 2,
      deleteKeys = Seq("k"), maxDeltas = 8)
    val base = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("bucket", st.bucketCol(col("k")))
    st.commitFull(base, 0L)
    val adds = Seq(("a", 10)).toDF("k", "v").withColumn("bucket", st.bucketCol(col("k")))
    val tombs = Seq("a").toDF("k").withColumn("bucket", st.bucketCol(col("k")))
    // crash window: staged but never finalized -> readers still see snap 0
    st.stageDelta(adds, tombs, 1L)
    assert(st.latest.contains(0L))
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap ==
      Map("a" -> 1, "b" -> 2))
    assert(st.isStagedNotFinal(1L))
    // re-run re-stages the same id (overwrite), then finalizes
    st.stageDelta(adds, tombs, 1L)
    st.finalizeCommit(1L)
    assert(st.read().get.select("k", "v").as[(String, Int)].collect().toMap ==
      Map("a" -> 10, "b" -> 2))
  }
}
