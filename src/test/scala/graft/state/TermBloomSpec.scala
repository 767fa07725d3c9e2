package graft.state

import graft.GraftSpec
import org.apache.hadoop.fs.Path

/** TermBloom invariants the store's pruning correctness rests on: zero
  * false negatives (ever), useful false-positive rate at the designed
  * bits/element, union = OR, and a lossless sidecar round trip. */
class TermBloomSpec extends GraftSpec {

  test("no false negatives; FPR near design point at 10 bits/element") {
    val n = 10000
    val bl = TermBloom.sized(n.toLong)
    val in = (0 until n).map(i => s"iri_$i")
    in.foreach(t => bl.put(TermBloom.hash(t)))
    assert(in.forall(t => bl.mightContain(TermBloom.hash(t))), "false negative")
    val probes = (0 until 100000).map(i => s"absent_$i")
    val fp = probes.count(t => bl.mightContain(TermBloom.hash(t)))
    // design FPR ~1%; allow generous slack (deterministic hash, so stable)
    assert(fp < 3000, s"false-positive rate degenerate: $fp / 100000")
  }

  test("orWith unions membership; sizing clamps hold") {
    val a = TermBloom.sized(100)
    val b = TermBloom.sized(100)
    a.put(TermBloom.hash("only_a"))
    b.put(TermBloom.hash("only_b"))
    a.orWith(b)
    assert(a.mightContain(TermBloom.hash("only_a")))
    assert(a.mightContain(TermBloom.hash("only_b")))
    // mismatched shapes refuse instead of silently corrupting
    intercept[IllegalArgumentException] { a.orWith(TermBloom.sized(1L << 24)) }
    // tiny n still gets the floor size; huge n saturates at the cap
    assert(TermBloom.sized(1).bits.length == (1 << 10) / 64)
    assert(TermBloom.sized(Long.MaxValue / 16).bits.length == ((1L << 27) / 64).toInt)
  }

  test("sidecar write/read round trip; unreadable file reads as None") {
    val dir = tmpDir("bloomio")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = Map(
      0 -> { val b = TermBloom.sized(10); b.put(TermBloom.hash("x")); b },
      5 -> { val b = TermBloom.sized(10); b.put(TermBloom.hash("y")); b })
    val p = new Path(dir, "_terms.bloom")
    TermBloom.write(fs, p, m)
    val back = TermBloom.read(fs, p).get
    assert(back.keySet == Set(0, 5))
    assert(back(0).mightContain(TermBloom.hash("x")))
    assert(!back(5).mightContain(TermBloom.hash("x")))
    assert(back(5).mightContain(TermBloom.hash("y")))
    // empty map round-trips (delete-only delta sidecar)
    TermBloom.write(fs, p, Map.empty)
    assert(TermBloom.read(fs, p).get.isEmpty)
    // garbage magic -> None (conservative fallback at the caller)
    val out = fs.create(p, true)
    out.write(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)); out.close()
    assert(TermBloom.read(fs, p).isEmpty)
    assert(TermBloom.read(fs, new Path(dir, "nope")).isEmpty)
  }
}
