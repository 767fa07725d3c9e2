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
    val st = new SnapshotStore(spark, root, numBuckets = 4,
      deleteKeys = Seq("k"), maxDeltas = maxD)
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
    val rnd = new scala.util.Random(42)
    for ((maxD, run) <- Seq((1, "a"), (2, "b"), (4, "c"))) {
      val root = tmpDir(s"storefuzz_$run") + "/t"
      val st = new SnapshotStore(spark, root, numBuckets = 4,
        deleteKeys = Seq("k"), maxDeltas = maxD)
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
