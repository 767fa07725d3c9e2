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
}
