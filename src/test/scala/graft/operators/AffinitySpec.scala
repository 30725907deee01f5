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

  test("also-bought shape (q166): directional union + top-3 by lift with " +
    "tie-break on n_pair then partner") {
    val ss = spark
    import ss.implicits._
    // N=5 baskets: 1={a,b,c}, 2={a,b}, 3={a,c}, 4={a,d}, 5={b,c}.
    // n_a=4, n_b=3, n_c=3, n_d=1; pairs: (a,b)=2, (a,c)=2, (a,d)=1,
    // (b,c)=2. Lifts: (a,d)=5/4=1.25, (b,c)=10/9=1.111111,
    // (a,b)=(a,c)=10/12=0.833333 — a genuine lift tie for brand `a`,
    // broken by partner name (same n_pair).
    val bi = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "a"), (4L, "d"),
      (5L, "b"), (5L, "c")
    ).toDF("b", "i")
    val aff = Affinity.pairAffinity(bi, "b", "i", minSupport = 1L)
    val directional = aff
      .select(col("item_a").as("brand"), col("item_b").as("partner"),
        col("n_pair"), col("lift"))
      .unionByName(aff.select(col("item_b").as("brand"),
        col("item_a").as("partner"), col("n_pair"), col("lift")))
    val out = Relational.topKPerGroup(directional, Seq("brand"),
        Seq(col("lift").desc, col("n_pair").desc, col("partner")), k = 3,
        rankCol = Some("rank"))
      .collect()
      .map(r => (r.getString(0), r.getInt(4)) ->
        (r.getString(1), r.getAs[Double]("lift"))).toMap
    assert(out(("a", 1)) == (("d", 1.25)))
    assert(out(("a", 2)) == (("b", 0.833333))) // lift tie: partner asc
    assert(out(("a", 3)) == (("c", 0.833333)))
    assert(out(("b", 1)) == (("c", 1.111111)))
    assert(out(("b", 2)) == (("a", 0.833333)))
    assert(out(("d", 1)) == (("a", 1.25)))
    assert(out.size == 8) // a:3, b:2, c:2, d:1
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
