package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AffinitySpec extends SparkTestBase {

  test("pairAffinity: hand counts, duplicate rows collapse, minSupport") {
    val ss = spark
    import ss.implicits._
    // Baskets: b1={x,y,z}, b2={x,y}, b3={x,z}, b4={y} (+ a duplicate
    // (b1,x) row that must not double-count). N=4 baskets.
    val bi = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("b", "i")
    val out = Affinity.pairAffinity(bi, "b", "i", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("support"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift"))).toMap
    // {x,y} in b1,b2: n=2, n_x=3, n_y=3 -> support .5, conf 2/3, lift 2*4/9
    assert(out(("x", "y")) == ((2L, 3L, 3L, 0.5, 0.666667, 0.888889)))
    // {x,z} in b1,b3: n=2, n_z=2 -> conf 2/3, lift 2*4/6
    assert(out(("x", "z")) == ((2L, 3L, 2L, 0.5, 0.666667, 1.333333)))
    // {y,z} co-occurs only in b1 -> filtered by minSupport=2
    assert(out.size == 2)
  }

  test("pairAffinity: pairs are unordered and distinct per basket") {
    val ss = spark
    import ss.implicits._
    val bi = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "a")).toDF("b", "i")
    val rows = Affinity.pairAffinity(bi, "b", "i").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "a" && rows.head.getString(1) == "b")
    assert(rows.head.getLong(2) == 2L)
  }
}
