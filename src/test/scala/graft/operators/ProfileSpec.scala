package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** One-pass numeric profiling: null/distinct bookkeeping on a frame
  * that actually has nulls, and partition-order independence of the
  * decimal-exact sum/mean. */
class ProfileSpec extends SparkTestBase with Matchers {

  private def frame = {
    val ss = spark
    import ss.implicits._
    Seq[(java.lang.Double, java.lang.Double)](
      (1.25, 10.0), (2.5, null), (2.5, 30.5), (null, 40.0), (4.0, 40.0))
      .toDF("a", "b")
  }

  test("numeric counts rows, nulls and exact distincts per column") {
    val got = Profile.numeric(frame, Seq("a", "b"))
      .orderBy("col_name").collect()
    got.map(_.getString(0)) shouldBe Array("a", "b")
    val a = got(0); val b = got(1)
    a.getLong(1) shouldBe 5            // n_rows
    a.getLong(2) shouldBe 1            // n_null
    a.getLong(3) shouldBe 3            // ndv: 1.25, 2.5, 4.0
    a.getDouble(4) shouldBe 1.25       // vmin
    a.getDouble(5) shouldBe 4.0        // vmax
    a.getDouble(6) shouldBe 10.25      // vsum (nulls skipped)
    a.getDouble(7) shouldBe 2.5625     // vmean over 4 non-null
    b.getLong(2) shouldBe 1
    b.getLong(3) shouldBe 3            // 10.0, 30.5, 40.0
    b.getDouble(6) shouldBe 120.5
    b.getDouble(7) shouldBe 30.125
  }

  test("numeric sum/mean are partition-order independent") {
    val base = Profile.numeric(frame, Seq("a", "b"))
      .orderBy("col_name").collect().map(r => (r.getDouble(6), r.getDouble(7)))
    val shuffled = Profile.numeric(frame.repartition(7), Seq("a", "b"))
      .orderBy("col_name").collect().map(r => (r.getDouble(6), r.getDouble(7)))
    shuffled shouldBe base
  }

  test("histogram buckets partition [min,max]: counts total, edges meet, top edge closed") {
    val ss = spark
    import ss.implicits._
    val vals = (0 until 100).map(i => i.toDouble) :+ 100.0
    val h = Profile.histogram(vals.toDF("v"), "v", 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    h.map(_._4).sum shouldBe vals.length
    h.map(_._1) shouldBe (0L until 10L).toArray
    // spans are contiguous and cover [0, 100]
    h.head._2 shouldBe 0.0
    h.last._3 shouldBe 100.0
    h.sliding(2).foreach { case Array(a, b) => a._3 shouldBe b._2 }
    // v == max lands in the last bucket, not an 11th
    h.last._4 shouldBe 11 // 90..99 plus the clamped 100
    // nulls are excluded, not a bucket
    val withNull = (vals.map(Option(_)) :+ None).toDF("v")
    Profile.histogram(withNull, "v", 10)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0) shouldBe
      vals.length
  }

  test("histogram of a constant column is one zero-span bucket") {
    val ss = spark
    import ss.implicits._
    val h = Profile.histogram(Seq.fill(7)(3.5).toDF("v"), "v", 10).collect()
    h.length shouldBe 1
    h.head.getLong(0) shouldBe 0L
    h.head.getLong(3) shouldBe 7L
  }

  test("strings counts rows, nulls, exact distincts and length stats per column") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Some("aa"), Some("x")),
      (Some("aa"), Some("yyy")),
      (Some("bbbb"), None),
      (None, Some("x")),
      (Some(""), Some("zz"))).toDF("a", "b")
    val out = Profile.strings(df, Seq("a", "b"))
      .orderBy("col_name").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // a: 5 rows, 1 null, distinct {aa, bbbb, ""}; lens 2,2,4,0 -> sum 8
    out("a") shouldBe ((5L, 1L, 3L, 0L, 4L, 8L))
    // b: 5 rows, 1 null, distinct {x, yyy, zz}; lens 1,3,1,2 -> sum 7
    out("b") shouldBe ((5L, 1L, 3L, 1L, 3L, 7L))
  }

  test("strings profile is partition-order independent") {
    val ss = spark
    import ss.implicits._
    val base = (1 to 400).map(i => (s"v${i % 13}", s"w${i % 7}"))
    val one = Profile.strings(base.toDF("a", "b").repartition(1), Seq("a", "b"))
      .orderBy("col_name").collect().map(_.toSeq)
    val many = Profile.strings(base.toDF("a", "b").repartition(17), Seq("a", "b"))
      .orderBy("col_name").collect().map(_.toSeq)
    many shouldBe one
  }

  test("corrMatrix: perfect/anti/zero correlation, constant is NULL, " +
    "null rows drop listwise") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1.0, 2.0, -1.0, 7.0, Some(1.0)),
      (2.0, 4.0, -2.0, 7.0, Some(2.0)),
      (3.0, 6.0, -3.0, 7.0, Some(9.0)),
      (4.0, 8.0, -4.0, 7.0, None) // null in e: row dropped everywhere
    ).toDF("a", "b", "c", "d", "e")
    val out = Profile.corrMatrix(rows, Seq("a", "b", "c", "d", "e"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.getAs[java.lang.Double]("corr")))).toMap
    assert(out.size == 10)
    out.values.foreach { case (n, _) => assert(n == 3L) } // listwise
    assert(out(("a", "b")) == ((3L, Some(1.0))))   // b = 2a
    assert(out(("a", "c")) == ((3L, Some(-1.0))))  // c = -a
    assert(out(("a", "d"))._2.isEmpty)             // d constant
    // a vs e = {1,2,9} on {1,2,3}: positive but below 1
    val rae = out(("a", "e"))._2.get
    assert(rae > 0.8 && rae < 1.0)
  }

  test("keySkew: uniform key is ~0 Gini, hot key dominates, hand values") {
    val ss = spark
    import ss.implicits._
    // u: 4 keys x 5 rows (uniform -> Gini 0)
    // h: counts {a:17, b:1, c:1, d:1}: sorted asc (1,1,1,17), k=4, n=20
    //    gn = (2-5)*1 + (4-5)*1 + (6-5)*1 + (8-5)*17 = 48 -> 48/80 = 0.6
    val rows = (0 until 20).map { i =>
      (s"k${i % 4}", if (i < 17) "a" else Seq("b", "c", "d")(i - 17))
    }
    val out = Profile.keySkew(rows.toDF("u", "h"), Seq("u", "h"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getAs[Double]("top_share"), r.getAs[Double]("gini"))).toMap
    assert(out("u") == ((20L, 4L, 5L, "k3", 0.25, 0.0)))
    assert(out("h") == ((20L, 4L, 17L, "a", 0.85, 0.6)))
  }

  test("keySkew: nulls are excluded, report is partition-order independent") {
    val ss = spark
    import ss.implicits._
    val rows = (1 to 100).map(i =>
      (if (i % 10 == 0) None else Some(s"k${i % 3}")))
    val one = Profile.keySkew(rows.toDF("a").repartition(1), Seq("a"))
      .collect().map(_.toSeq)
    val many = Profile.keySkew(rows.toDF("a").repartition(13), Seq("a"))
      .collect().map(_.toSeq)
    many shouldBe one
    assert(one.head(1) == 90L) // 10 nulls dropped
  }

  test("benford: integer digit extraction across magnitudes, full 1-9 " +
    "grid, ppm arithmetic, zero/negative dropped") {
    val ss = spark
    import ss.implicits._
    // x100 scale: 1.23->123, 19.9->1990, 100.0->10000, 2.5->250,
    // 95.0->9500; 0 and -3.2 drop. Digits: 1,1,1,2,9 of total 5.
    val df = Seq(1.23, 19.9, 100.0, 2.5, 0.0, -3.2, 95.0).toDF("v")
    val out = Profile.benford(df, "v", scale = 100L)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 9) // every digit present even with n = 0
    assert(out(1) == ((3L, 600000L, 301030L, 298970L)))
    assert(out(2) == ((1L, 200000L, 176091L, 23909L)))
    assert(out(9) == ((1L, 200000L, 45757L, 154243L)))
    assert(out(5) == ((0L, 0L, 79181L, 79181L)))
  }

  test("concentration: integer HHI ppm and inverse-Simpson effective count") {
    val ss = spark
    import ss.implicits._
    // g: a,a,a,b -> HHI = 10/16 = 625000 ppm, eff = 1.6;
    // h: two equal sources -> 500000 ppm, eff 2.0;
    // k: one source -> the 1e6 ppm / eff 1.0 pole.
    val rows = Seq(("g", "a"), ("g", "a"), ("g", "a"), ("g", "b"),
      ("h", "a"), ("h", "b"), ("k", "z")).toDF("grp", "src")
    val out = Profile.concentration(rows, Seq("grp"), "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("eff_cats")))).toMap
    assert(out("g") == ((4L, 2L, 625000L, 1.6)))
    assert(out("h") == ((2L, 2L, 500000L, 2.0)))
    assert(out("k") == ((1L, 1L, 1000000L, 1.0)))
  }

  test("contract checks: orphans incl. NULL FK, dup-PK row counting, NULL predicate = violation") {
    val ss = spark
    import ss.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val ri = Profile.refIntegrity(child, "fk", parent, "pk", "ri").head()
    // 9 has no parent; a NULL FK would vanish in an inner join: 2 bad
    assert((ri.getString(0), ri.getLong(1), ri.getLong(2),
      ri.getLong(3)) == (("ri", 4L, 2L, 500000L)))
    val dup = Profile.dupPk(
      Seq(1L, 1L, 1L, 2L, 3L).toDF("pk"), "pk", "dp").head()
    assert((dup.getLong(1), dup.getLong(2), dup.getLong(3)) ==
      ((5L, 3L, 600000L))) // ALL rows of the duplicated key count
    val clean = Profile.dupPk(Seq(1L, 2L).toDF("pk"), "pk", "dp").head()
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L)
    // a predicate that cannot evaluate (NULL) is a failed check
    val cr = Profile.checkRow(
      Seq(Some(5L), Some(-1L), None).toDF("v"), "c",
      col("v") <= 0L).head()
    assert((cr.getLong(1), cr.getLong(2)) == ((3L, 2L)))
  }

  test("kAnonymity: min class size, min sensitive diversity, " +
    "suppression ppm") {
    val ss = spark
    import ss.implicits._
    // class A: 3 rows, 2 distinct sens; B: 1 row (the k=1 leak, l=1);
    // C: 6 rows, 3 distinct
    val df = (Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 5L)) ++
      (0 until 6).map(i => ("C", (i % 3).toLong))).toDF("quasi", "sens")
    val out = Profile.kAnonymity(df, Seq("quasi"), "sens", kMin = 5).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4), out.getLong(5)) ==
      ((10L, 3L, 1L, 1L, 400000L, 3333333L)))
  }

  test("looAblation: hand leave-one-out deltas, whole-corpus group " +
    "gets NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 2L), ("a", 4L), ("b", 10L)).toDF("src", "v")
    val out = Profile.looAblation(df, "src", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5)))).toMap
    // removing a: mean jumps 16/3 -> 10 (delta = 14/3)
    assert(out("a") == ((2L, 3.0, 10.0, 4.666667, 666666L)))
    assert(out("b") == ((1L, 10.0, 3.0, -2.333333, 333333L)))
    val solo = Profile.looAblation(
      Seq(("a", 1L)).toDF("src", "v"), "src", "v").head()
    assert(solo.isNullAt(3) && solo.isNullAt(4))
  }

  test("rejectionAttribution: first-fail in order, unconditional " +
    "totals, kept row") {
    val ss = spark
    import ss.implicits._
    val df = Seq((true, false), (true, true), (false, true),
      (false, false)).toDF("fa", "fb")
    val out = Profile.rejectionAttribution(df,
        Seq("ga" -> col("fa"), "gb" -> col("fb")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    // ga shadows gb on the (true, true) row: gb's first count is 1
    // while its unconditional kill count is 2
    assert(out("ga") == ((2L, Some(2L), 500000L, Some(500000L))))
    assert(out("gb") == ((1L, Some(2L), 250000L, Some(500000L))))
    assert(out("kept") == ((1L, None, 250000L, None)))
  }

  test("gini: hand rank-formula values, equal-values zero, " +
    "top-decile share") {
    val ss = spark
    import ss.implicits._
    val df = (Seq(1L, 2L, 3L, 4L).map(("g", _)) ++
      Seq(5L, 5L, 5L).map(("e", _)) ++ Seq(0L, 0L).map(("z", _)))
      .toDF("grp", "v")
    val out = Profile.gini(df, Seq("grp"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    // 1,2,3,4: G = (2*30 - 5*10)/(4*10) = 0.25; top ceil(4/10)=1 row = 4
    assert(out("g") == ((4L, 10L, Some(0.25), Some(400000L))))
    // equal values: perfectly even, G = 0; top 1 of 3 = 5/15
    assert(out("e") == ((3L, 15L, Some(0.0), Some(333333L))))
    // zero total: undefined
    assert(out("z") == ((2L, 0L, None, None)))
  }

  test("lDiversityProfile: per-l rollup with micro-nat worst entropy") {
    val ss = spark
    import ss.implicits._
    // class A: {x,x,y} -> l=2, h = floor((2*ln(3/2)+ln(3))micro/3 + .5)
    //   = floor((810930 + 1098612)/3 + .5) = 636514
    // class B: {z,z} -> l=1, h = 0
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "z"), ("B", "z"))
      .toDF("q", "s")
    val out = Profile.lDiversityProfile(df, Seq("q"), "s")
      .collect().map(r => r.getAs[Long]("l") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("min_h_micro")))).toMap
    out(1L) shouldBe ((1L, 2L, 0L))
    out(2L) shouldBe ((1L, 3L, 636514L))
  }

  test("tCloseness: hand EMD, violation count, constant-attribute zero") {
    val ss = spark
    import ss.implicits._
    // A = {1,1,2} (emd 266666 micro), B = {2,2} (emd 400000 micro)
    // t_max = 0.4; avg = (3*266666 + 2*400000) div 5 = 319999; both > 0.2
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 2))
      .toDF("q", "v")
    val r = Profile.tCloseness(df, Seq("q"), "v").head()
    r.getAs[Long]("n_rows") shouldBe 5L
    r.getAs[Long]("n_classes") shouldBe 2L
    r.getAs[Long]("m") shouldBe 2L
    r.getAs[Double]("t_max") shouldBe 0.4
    r.getAs[Long]("avg_micro") shouldBe 319999L
    r.getAs[Long]("n_over") shouldBe 2L
    // constant sensitive attribute: no interior cut -> EMD 0 everywhere
    val const = Profile.tCloseness(
      Seq(("A", 7), ("B", 7)).toDF("q", "v"), Seq("q"), "v").head()
    const.getAs[Long]("m") shouldBe 1L
    const.getAs[Double]("t_max") shouldBe 0.0
    const.getAs[Long]("n_over") shouldBe 0L
  }
}
