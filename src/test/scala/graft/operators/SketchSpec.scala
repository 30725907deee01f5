package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchSpec extends SparkTestBase {

  test("hllSketch: merge(sketch(A), sketch(B)) == sketch(A ∪ B) as a " +
    "table — the mergeability contract, exact, with overlap") {
    val ss = spark
    import ss.implicits._
    // Overlapping halves: ids 0..599 and 400..999 (200 shared keys) —
    // merge must be idempotent on the overlap, not double-count.
    val a = (0L to 599L).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    val b = (400L to 999L).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    val union = (0L to 999L).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    val merged = Sketch.hllMerge(
      Seq(Sketch.hllSketch(a, Seq("g"), "v"),
        Sketch.hllSketch(b, Seq("g"), "v")), Seq("g"))
    val rescan = Sketch.hllSketch(union, Seq("g"), "v")
    val m = merged.collect().map(r => (r.getString(0), r.getInt(1)) ->
      r.getInt(2)).toMap
    val s = rescan.collect().map(r => (r.getString(0), r.getInt(1)) ->
      r.getInt(2)).toMap
    assert(m == s)
  }

  test("hllEstimate: within 15% of true cardinality on both estimator " +
    "branches (linear counting at n=80, raw HLL at n=20000)") {
    val ss = spark
    import ss.implicits._
    val small = (0L until 80L).map(i => ("s", i * 7L + 3L)).toDF("g", "v")
    val big = (0L until 20000L).map(i => ("b", i * 31L + 11L)).toDF("g", "v")
    val est = Sketch.hllEstimate(
      Sketch.hllSketch(small.unionByName(big), Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("s") - 80.0) / 80.0 < 0.15, s"small: ${est("s")}")
    assert(math.abs(est("b") - 20000.0) / 20000.0 < 0.15, s"big: ${est("b")}")
  }

  test("logHistSketch: merge == rescan; values < 8 land in exact " +
    "singleton buckets; zero gets its own bucket") {
    val ss = spark
    import ss.implicits._
    val a = Seq(("g", 0L), ("g", 1L), ("g", 5L), ("g", 100L)).toDF("g", "v")
    val b = Seq(("g", 5L), ("g", 103L), ("g", 5000L)).toDF("g", "v")
    val union = a.unionByName(b)
    val merged = Sketch.logHistMerge(
      Seq(Sketch.logHistSketch(a, Seq("g"), "v"),
        Sketch.logHistSketch(b, Seq("g"), "v")), Seq("g"))
    val rescan = Sketch.logHistSketch(union, Seq("g"), "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(toMap(merged) == toMap(rescan))
    val keys = toMap(rescan)
    assert(keys((0, 0L)) == 1L)      // the zero bucket
    assert(keys((1, 4L)) == 1L)      // v=1 exact: b=1, q=4, lb=1
    assert(keys((3, 5L)) == 2L)      // v=5 twice: b=3, q=5, lb=5
    // 100 and 103 share bucket b=7, q = 800/128 = 6 -> lb = 96
    assert(keys((7, 6L)) == 2L)
  }

  test("momentsSketch: report over merged halves equals Profile.numeric " +
    "on the union (minus n_distinct), nulls bookkept") {
    val ss = spark
    import ss.implicits._
    val a = Seq((1.5, Some(10.0)), (2.25, None), (3.0, Some(30.0)))
      .toDF("x", "y")
    val b = Seq((4.5, Some(20.0)), (0.75, None)).toDF("x", "y")
    val merged = Sketch.momentsReport(Sketch.momentsMerge(Seq(
      Sketch.momentsSketch(a, Seq("x", "y")),
      Sketch.momentsSketch(b, Seq("x", "y")))))
    val direct = Profile.numeric(a.unionByName(b), Seq("x", "y"))
      .drop("n_distinct")
    val m = merged.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(m == d)
    // hand check: x has no nulls, sum 12.0, mean 2.4; y has 2 nulls
    assert(m("x") == Seq(5L, 0L, 0.75, 4.5, 12.0, 2.4))
    assert(m("y") == Seq(5L, 2L, 10.0, 30.0, 60.0, 20.0))
  }

  test("logHistPsi: identical distributions score exactly 0; hand PSI " +
    "for a missing-bucket shift") {
    val ss = spark
    import ss.implicits._
    // group a: 8 values of 1 -> bucket (1,4) only.
    // ref: 8 of 1 + 8 of 2 -> buckets (1,4) and (2,4).
    // B = 2; pa = (9/10, 1/10); pr = (9/18, 9/18).
    // terms = 0.4*ln6(1.8) + (-0.4)*ln6(0.2)
    //       = 0.4*0.587787 + 0.4*1.609438 = 0.2351148 + 0.6437752
    // psi = 0.87889.
    val a = Seq.fill(8)(("a", 1L)).toDF("g", "v")
    val refData = (Seq.fill(8)(1L) ++ Seq.fill(8)(2L)).map(Tuple1(_)).toDF("v")
    val ref = Sketch.logHistSketch(refData, Seq.empty, "v")
    val psi = Sketch.logHistPsi(
        Sketch.logHistSketch(a, Seq("g"), "v"), Seq("g"), ref)
      .head()
    assert(psi.getAs[Long]("n_buckets") == 2L)
    assert(psi.getAs[Double]("psi") == 0.87889)
    // self-comparison: every bucket has pa == pr -> ln(1) = 0 -> psi 0
    val self = Sketch.logHistPsi(
        Sketch.logHistSketch(refData.withColumn("g", lit("r")), Seq("g"), "v"),
        Seq("g"), ref)
      .head()
    assert(self.getAs[Double]("psi") == 0.0)
  }

  test("cmsSketch: merge == rescan as a table; estimates are upper " +
    "bounds and exact in a sparse sketch; uninserted key reads 0") {
    val ss = spark
    import ss.implicits._
    val a = Seq((100L, 5L), (200L, 3L)).toDF("k", "w")
    val b = Seq((100L, 2L), (300L, 7L)).toDF("k", "w")
    val union = Seq((100L, 7L), (200L, 3L), (300L, 7L)).toDF("k", "w")
    val merged = Sketch.cmsMerge(Seq(
      Sketch.cmsSketch(a, "k", Some("w")),
      Sketch.cmsSketch(b, "k", Some("w"))))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(toMap(merged) == toMap(Sketch.cmsSketch(union, "k", Some("w"))))
    // sparse sketch (3 keys, 4096 cells): no collisions -> exact
    val keys = Seq((100L, 7L), (200L, 3L), (300L, 7L), (999L, 0L))
      .toDF("k", "true_n")
    val est = Sketch.cmsLookup(merged, keys, "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, (t, e)) <- est) assert(e >= t, s"key $k: est $e < true $t")
    assert(est(100L) == ((7L, 7L)))
    assert(est(200L) == ((3L, 3L)))
    assert(est(300L) == ((7L, 7L)))
    assert(est(999L)._2 == 0L) // never inserted, empty cells
  }

  test("logHistQuantiles: bucket lower bound sandwiches the exact " +
    "quantile within 12.5% relative width") {
    val ss = spark
    import ss.implicits._
    // 1..1000: exact p50 = 500, p90 = 900, p99 = 990.
    val df = (1L to 1000L).map(v => ("g", v)).toDF("g", "v")
    val q = Sketch.logHistQuantiles(
        Sketch.logHistSketch(df, Seq("g"), "v"), Seq("g"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .head()
    for ((name, exact) <- Seq("p50" -> 500.0, "p90" -> 900.0, "p99" -> 990.0)) {
      val lb = q.getAs[Long](name).toDouble
      assert(lb <= exact && exact < lb * 1.125 + 1,
        s"$name: lb=$lb exact=$exact")
    }
  }

  test("logHistEmd: identical sketches 0, whole-mass one-bucket shift exactly 1") {
    val ss = spark
    import ss.implicits._
    // v=8 -> bucket (b=4, q=4); v=10 -> (4, 5): adjacent buckets
    val eights = Seq.fill(5)(("s", 8L)).toDF("g", "v")
    val tens = Seq.fill(5)(("s", 10L)).toDF("g", "v")
    val skA = Sketch.logHistSketch(eights, Seq("g"), "v")
    val refSame = Sketch.logHistSketch(eights, Seq.empty, "v")
    val refShift = Sketch.logHistSketch(tens, Seq.empty, "v")
    val same = Sketch.logHistEmd(skA, Seq("g"), refSame).head()
    assert(same.getLong(1) == 1L && same.getDouble(2) == 0.0)
    val shift = Sketch.logHistEmd(skA, Seq("g"), refShift).head()
    assert(shift.getLong(1) == 2L && shift.getDouble(2) == 1.0)
    // unequal masses still compare as distributions: 5x8 vs 10x10
    val refBig = Sketch.logHistSketch(
      Seq.fill(10)(("s", 10L)).toDF("g", "v"), Seq.empty, "v")
    assert(Sketch.logHistEmd(skA, Seq("g"), refBig).head()
      .getDouble(2) == 1.0)
    // a K-index-unit whole-mass shift reads as K, not 1: v=8 is
    // bucket (4,4) idx 20, v=32 is (6,4) idx 28 -> gap 8, even though
    // neither sketch has mass in the interior buckets
    val refFar = Sketch.logHistSketch(
      Seq.fill(5)(("s", 32L)).toDF("g", "v"), Seq.empty, "v")
    assert(Sketch.logHistEmd(skA, Seq("g"), refFar).head()
      .getDouble(2) == 8.0)
  }

  test("logHistKs: identical 0, disjoint 1, partial overlap exact " +
    "rational with sup location") {
    val ss = spark
    import ss.implicits._
    val eights = Seq.fill(5)(("s", 8L)).toDF("g", "v")
    val skA = Sketch.logHistSketch(eights, Seq("g"), "v")
    val same = Sketch.logHistKs(skA, Seq("g"),
      Sketch.logHistSketch(eights, Seq.empty, "v")).head()
    assert(same.getDouble(2) == 0.0)
    val far = Sketch.logHistKs(skA, Seq("g"),
      Sketch.logHistSketch(Seq.fill(5)(("s", 32L)).toDF("g", "v"),
        Seq.empty, "v")).head()
    // whole mass apart: sup = 1 at A's bucket idx 4*4+4 = 20
    assert(far.getDouble(2) == 1.0 && far.getLong(3) == 20L)
    // ref = 2x8 + 3x10: at idx 20 |5*5 - 2*5|/25 = 0.6
    val mixed = Sketch.logHistKs(skA, Seq("g"),
      Sketch.logHistSketch(
        (Seq.fill(2)(("s", 8L)) ++ Seq.fill(3)(("s", 10L))).toDF("g", "v"),
        Seq.empty, "v")).head()
    assert(mixed.getDouble(2) == 0.6 && mixed.getLong(3) == 20L)
  }

  test("hllOverlap: identical groups jaccard 1, near-disjoint small, " +
    "union dominates") {
    val ss = spark
    import ss.implicits._
    val same = ((1L to 300L).map(("a", _)) ++ (1L to 300L).map(("b", _)))
      .toDF("g", "u")
    val s1 = Sketch.hllOverlap(Sketch.hllSketch(same, Seq("g"), "u"), "g")
      .head()
    // identical key sets: identical registers, union == both
    assert(s1.getDouble(2) == s1.getDouble(3) &&
      s1.getDouble(3) == s1.getDouble(4))
    assert(s1.getDouble(5) == s1.getDouble(4) && s1.getDouble(6) == 1.0)
    val disj = ((1L to 300L).map(("a", _)) ++
      (100001L to 100300L).map(("b", _))).toDF("g", "u")
    val s2 = Sketch.hllOverlap(Sketch.hllSketch(disj, Seq("g"), "u"), "g")
      .head()
    assert(s2.getDouble(4) >= s2.getDouble(2) &&
      s2.getDouble(4) >= s2.getDouble(3)) // union dominates both
    assert(s2.getDouble(5) >= 0.0 && s2.getDouble(6) < 0.3) // near-disjoint
  }

  test("bottomKSketch: merge(sig(A), sig(B)) == sig(A ∪ B) as a table; " +
    "k-bounded per group") {
    val ss = spark
    import ss.implicits._
    val a = (1L to 600L).map(("g", _)).toDF("g", "u")
    val b = (301L to 900L).map(("g", _)).toDF("g", "u")
    val merged = Sketch.bottomKMerge(Seq(
      Sketch.bottomKSketch(a, Seq("g"), "u"),
      Sketch.bottomKSketch(b, Seq("g"), "u")), Seq("g"))
    val rescan = Sketch.bottomKSketch(a.unionAll(b), Seq("g"), "u")
    assert(merged.count() == Sketch.BkK)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      rescan.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("bottomKIntersect: small pairs exact, bounded error on a known " +
    "J = 1/3 overlap where inclusion-exclusion has no guarantee") {
    val ss = spark
    import ss.implicits._
    // |∪| = 250 ≤ k: the merged signature IS the union, membership is
    // exact, so jaccard_bk is EXACTLY |∩|/|∪| = 50/250 = 0.2
    val small = ((1L to 150L).map(("a", _)) ++
      (101L to 250L).map(("b", _))).toDF("g", "u")
    val ex = Sketch.bottomKIntersect(
      Sketch.bottomKSketch(small, Seq("g"), "u"),
      Sketch.hllSketch(small, Seq("g"), "u"), "g").head()
    assert(ex.getLong(2) == 250L && ex.getLong(3) == 50L &&
      ex.getDouble(4) == 0.2)

    // large pair, true J = 1/3 (|∩| = 5000, |∪| = 15000): bounded
    // error |Ĵ − J| ≤ 3·sqrt(J(1−J)/k) ≈ 0.089
    val big = ((1L to 10000L).map(("a", _)) ++
      (5001L to 15000L).map(("b", _))).toDF("g", "u")
    val r = Sketch.bottomKIntersect(
      Sketch.bottomKSketch(big, Seq("g"), "u"),
      Sketch.hllSketch(big, Seq("g"), "u"), "g").head()
    assert(r.getLong(2) == Sketch.BkK)
    assert(math.abs(r.getDouble(4) - 1.0 / 3) <= 0.089)
    // composed intersection: J bound x HLL union (±15% spec bound)
    assert(math.abs(r.getDouble(6) - 5000.0) <= 5000.0 * 0.45)
    // disjoint pair: exactly zero shared hashes -> jaccard_bk == 0.0
    val disj = ((1L to 5000L).map(("a", _)) ++
      (100001L to 105000L).map(("b", _))).toDF("g", "u")
    val d = Sketch.bottomKIntersect(
      Sketch.bottomKSketch(disj, Seq("g"), "u"),
      Sketch.hllSketch(disj, Seq("g"), "u"), "g").head()
    assert(d.getLong(3) == 0L && d.getDouble(4) == 0.0 &&
      d.getDouble(6) == 0.0)
  }
}
