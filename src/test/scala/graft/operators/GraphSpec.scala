package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class GraphSpec extends SparkTestBase with Matchers {

  private def sym(pairs: Seq[(String, String)]) = {
    val ss = spark
    import ss.implicits._
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("pageRank: symmetric K3 stays uniform; ranks sum to ~1") {
    val e = sym(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    val out = Graph.pageRank(e, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("rank"))).toMap
    assert(out.size == 3)
    out.values.foreach { case (d, _) => assert(d == 2L) }
    // full symmetry: every node's rank program is identical
    assert(out.values.map(_._2).toSet.size == 1)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("pageRank: a star's center outranks its leaves") {
    val e = sym(Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3")))
    val out = Graph.pageRank(e, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("rank"))).toMap
    assert(out("hub")._1 == 3L && out("l1")._1 == 1L)
    assert(out("hub")._2 > out("l1")._2)
    // leaves are symmetric
    assert(out("l1")._2 == out("l2")._2 && out("l2")._2 == out("l3")._2)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("pageRank: duplicate input edges collapse; disconnected " +
    "components keep their own mass") {
    val ss = spark
    import ss.implicits._
    val e = (Seq(("a", "b"), ("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")))
      .toDF("src", "dst")
    val out = Graph.pageRank(e, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    // two symmetric 2-cliques: all four nodes identical by symmetry
    assert(out.values.toSet.size == 1)
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
  }
}
