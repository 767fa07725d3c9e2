package graft.plans

import graft.GraftSpec
import graft.model.{Quad, TermKind}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class QuadDiffSpec extends GraftSpec {
  import spark.implicits._

  private def q(i: Int, v: String): Quad =
    Quad(s"http://s/$i", "http://p", v, TermKind.Literal, "", "", "http://g")
  private def df(qs: Seq[Quad]): DataFrame = qs.toDF()
  private def asSet(d: DataFrame): Set[Quad] =
    d.select(QuadDiff.quadCols.map(col): _*).as[Quad].collect().toSet

  test("diff emits + for new rows, - for removed rows, nothing for kept") {
    val prev = df(Seq(q(1, "a"), q(2, "b"), q(3, "c")))
    val next = df(Seq(q(2, "b"), q(3, "c2"), q(4, "d")))
    val patch = QuadDiff.diff(prev, next)
    val adds = asSet(patch.filter($"op" === "+"))
    val dels = asSet(patch.filter($"op" === "-"))
    assert(adds == Set(q(3, "c2"), q(4, "d")))
    assert(dels == Set(q(1, "a"), q(3, "c")))
    // update = delete+insert pair (reference parse_trx_logs.sql:14-15)
    assert(adds.intersect(dels).isEmpty)
  }

  test("diff(a, a) is empty; diff is duplicate-insensitive") {
    val a = df(Seq(q(1, "a"), q(1, "a"), q(2, "b"))) // dup row
    assert(QuadDiff.diff(a, a.dropDuplicates()).count() == 0 ||
      QuadDiff.diff(a.dropDuplicates(), a.dropDuplicates()).count() == 0)
  }

  test("algebra: apply(base, diff(base, next)) == next") {
    val base = df((1 to 50).map(i => q(i, s"v$i")))
    val next = df((11 to 60).map(i => q(i, if (i % 7 == 0) s"w$i" else s"v$i")))
    val patch = QuadDiff.diff(base, next)
    assert(asSet(QuadDiff.apply(base, patch)) == asSet(next))
  }

  test("supportTransition emits only 0<->positive transitions") {
    val state = Seq((q(1, "a"), 2L), (q(2, "b"), 1L))
      .map { case (qq, s) => (qq.s, qq.p, qq.oLex, qq.oKind, qq.oDtype, qq.oLang, qq.g, s) }
      .toDF("s", "p", "oLex", "oKind", "oDtype", "oLang", "g", "support")
    val delta = Seq((q(1, "a"), -1L), (q(2, "b"), -1L), (q(3, "c"), 2L))
      .map { case (qq, d) => (qq.s, qq.p, qq.oLex, qq.oKind, qq.oDtype, qq.oLang, qq.g, d) }
      .toDF("s", "p", "oLex", "oKind", "oDtype", "oLang", "g", "d")
    val (patches, newState) = QuadDiff.supportTransition(state, delta)
    val byOp = patches.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // q1: 2-1=1 stays positive -> no patch; q2: 1-1=0 -> '-'; q3: 0+2 -> '+'
    assert(byOp == Set(("-", "http://s/2"), ("+", "http://s/3")))
    val states = newState.select("s", "support").as[(String, Long)].collect().toMap
    assert(states == Map("http://s/1" -> 1L, "http://s/3" -> 2L))
  }
}
