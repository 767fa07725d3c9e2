package graft.state

import graft.GraftSpec
import org.apache.spark.sql.functions._

class CompactedAppendTableSpec extends GraftSpec {
  import spark.implicits._

  test("file count stays bounded across many appends; data never lost") {
    val root = tmpDir("cat1") + "/t"
    for (b <- 0 until 100)
      CompactedAppendTable.append(spark, root,
        Seq((b.toLong, s"batch$b")).toDF("batchId", "tag"), maxFiles = 8)
    val data = CompactedAppendTable.read(spark, root).get
    assert(data.count() == 100)
    assert(data.agg(sum("batchId")).head().getLong(0) == (0 until 100).sum.toLong)
    // bounded: current generation holds at most maxFiles+1 data files
    // (the append that trips the threshold compacts right after)
    val cur = new java.io.File(CompactedAppendTable.currentDir(spark, root))
    val files = cur.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 9, s"file count $files not bounded")
    // exactly one generation dir survives (stale ones swept)
    val gens = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("gen_"))
    assert(gens.length == 1, s"stale generations: ${gens.mkString(",")}")
  }

  test("orphan generation from a crashed compaction is overwritten and swept") {
    val root = tmpDir("cat2") + "/t"
    (0 until 3).foreach(b => CompactedAppendTable.append(spark, root,
      Seq((b.toLong, "x")).toDF("batchId", "tag"), maxFiles = 100))
    // simulate a crash mid-compaction: gen_1 data written, pointer NOT
    // flipped (still gen_0) — readers must keep seeing gen_0
    Seq((99L, "orphan")).toDF("batchId", "tag")
      .write.parquet(s"$root/gen_1")
    assert(CompactedAppendTable.read(spark, root).get.count() == 3)
    // next compaction overwrites the orphan and flips cleanly
    (0 until 10).foreach(b => CompactedAppendTable.append(spark, root,
      Seq((100L + b, "y")).toDF("batchId", "tag"), maxFiles = 4))
    val data = CompactedAppendTable.read(spark, root).get
    assert(data.count() == 13)
    assert(data.filter(col("tag") === "orphan").count() == 0, "orphan row leaked")
  }

  test("empty table reads as None; exists is false") {
    val root = tmpDir("cat3") + "/t"
    assert(!CompactedAppendTable.exists(spark, root))
    assert(CompactedAppendTable.read(spark, root).isEmpty)
  }
}
