package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Hand-value pins for the k-sample / paired test statistics added
  * beside the two-sample family: one-way ANOVA, Kruskal–Wallis,
  * McNemar, the G-test, Cohen's d, Brown–Forsythe, Cochran–Armitage.
  * Every expected value replays the operator's DOCUMENTED exact
  * program (integer floors included), not a float library's answer —
  * where they differ the scaladoc's quantization contract is the
  * thing under test. */
class EvalStatsSpec extends SparkTestBase with Matchers {

  test("anovaOneWay: exact SS on evenly-dividing groups") {
    val ss = spark
    import ss.implicits._
    // g1 = {1,3} (S=4, Q=10, A=8), g2 = {5,7} (S=12, Q=74, A=72)
    // S=16 n=4: ssb = 80 - 64 = 16, ssw = 84 - 80 = 4
    // f = 16*2/(4*1) = 8; eta2 = 16/20 = 0.8
    val df = Seq(("a", 1), ("a", 3), ("b", 5), ("b", 7)).toDF("g", "v")
    val r = Eval.anovaOneWay(df, "g", "v").head()
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Long]("ssb") shouldBe 16L
    r.getAs[Long]("ssw") shouldBe 4L
    r.getAs[Double]("f") shouldBe 8.0
    r.getAs[Double]("eta2") shouldBe 0.8
  }

  test("anovaOneWay: grand-mean floor quantization; degenerate NULLs") {
    val ss = spark
    import ss.implicits._
    // g1 = {1,2,3} (A = 36 div 3 = 12), g2 = {5,7} (A = 144 div 2 = 72)
    // S=18 n=5: S^2 div n = 324 div 5 = 64 (true 64.8) -> ssb = 84-64 = 20
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 5), ("b", 7))
      .toDF("g", "v")
    val r = Eval.anovaOneWay(df, "g", "v").head()
    r.getAs[Long]("ssb") shouldBe 20L
    r.getAs[Long]("ssw") shouldBe 4L
    r.getAs[Double]("f") shouldBe 15.0
    // single group: k = 1 -> F NULL
    val one = Eval.anovaOneWay(Seq(("a", 1), ("a", 2)).toDF("g", "v"),
      "g", "v").head()
    one.isNullAt(one.fieldIndex("f")) shouldBe true
    // constant values: ssw = 0 -> F NULL, eta2 NULL (0/0)
    val const = Eval.anovaOneWay(
      Seq(("a", 5), ("a", 5), ("b", 5)).toDF("g", "v"), "g", "v").head()
    const.isNullAt(const.fieldIndex("f")) shouldBe true
    const.isNullAt(const.fieldIndex("eta2")) shouldBe true
  }

  test("kruskalWallis: no ties, exact-dividing ranks") {
    val ss = spark
    import ss.implicits._
    // {1,2,3} vs {4,5,6}: R2 = 12/30, B = 12/75 exact; H = 12*87/42 - 21
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val r = Eval.kruskalWallis(df, "g", "v").head()
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Long]("ties") shouldBe 0L
    r.getAs[Double]("h") shouldBe 3.857143
    r.getAs[Double]("h_tie") shouldBe 3.857143
  }

  test("kruskalWallis: tie correction and the documented unit floor") {
    val ss = spark
    import ss.implicits._
    // {1,1} vs {2}: r2(1) = 3, r2(2) = 6; B1 = 36 div 8 = 4 (true 4.5),
    // B2 = 9; H = 12*13/12 - 12 = 1.0; T = 6, corr = 0.75 -> h_tie = 4/3
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("g", "v")
    val r = Eval.kruskalWallis(df, "g", "v").head()
    r.getAs[Long]("ties") shouldBe 6L
    r.getAs[Double]("h") shouldBe 1.0
    r.getAs[Double]("h_tie") shouldBe 1.333333
    // all values tied: correction 0 -> h_tie NULL
    val allTied = Eval.kruskalWallis(
      Seq(("a", 7), ("b", 7), ("b", 7)).toDF("g", "v"), "g", "v").head()
    allTied.isNullAt(allTied.fieldIndex("h_tie")) shouldBe true
  }

  test("kruskalWallis: sum(R2/n) past BIGINT stays exact (DECIMAL fold)") {
    // 2.2M distinct values by parity: sum R2g'/(4 n_g) ~ n^3 = 1.06e19 >
    // Long.MaxValue — the r13 BIGINT fold wrapped silently here. Ranks
    // of 0..n-1 are v+1; R_even = m^2 (first m odds), R_odd = m(m+1);
    // H = 12 (R_e^2 + R_o^2)/(m n (n+1)) - 3(n+1) analytically, and the
    // engine's <= 2-unit div floor perturbs H by ~1e-12.
    val n = 2200000L
    val m = n / 2
    val df = spark.range(n).selectExpr("id % 2 as g", "id as v")
    val r = Eval.kruskalWallis(df, "g", "v").head()
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Long]("n") shouldBe n
    val re = BigDecimal(m) * BigDecimal(m)
    val ro = BigDecimal(m) * BigDecimal(m + 1)
    val exp = (BigDecimal(12) * (re * re + ro * ro) /
      (BigDecimal(m) * BigDecimal(n) * BigDecimal(n + 1)) -
      BigDecimal(3) * BigDecimal(n + 1)).toDouble
    val h = r.getAs[Double]("h")
    h should not be null.asInstanceOf[Any]
    math.abs(h - exp) should be < 1e-5
    (h >= 0.0) shouldBe true // a wrapped BIGINT fold goes wildly negative
  }

  test("mcnemar: continuity-corrected discordant cells") {
    val ss = spark
    import ss.implicits._
    // b = 5, c = 2: chi2 = (|3|-1)^2 / 7 = 4/7
    val df = Seq.fill(2)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq((false, false))
    val r = Eval.mcnemar(df.toDF("g1", "g2"), "g1", "g2").head()
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Long]("b") shouldBe 5L
    r.getAs[Long]("c") shouldBe 2L
    r.getAs[Double]("chi2") shouldBe 0.571429
    // perfect agreement: b = c = 0 -> NULL (undefined, not 0)
    val agree = Eval.mcnemar(
      Seq((true, true), (false, false)).toDF("g1", "g2"), "g1", "g2").head()
    agree.isNullAt(agree.fieldIndex("chi2")) shouldBe true
  }

  test("gTest: micro-nat cells match the hand fold; independence is 0") {
    val ss = spark
    import ss.implicits._
    // cells 10/10/10/30: terms 10*ln1.5 + 20*ln0.75 + 30*ln1.125
    // micro-nats: 405465, -287682, 117783 -> sum 1834500, G = 3.669
    val df = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))).toDF("a", "b")
    val r = Eval.gTest(df, "a", "b").head()
    r.getAs[Long]("n") shouldBe 60L
    r.getAs[Long]("dof") shouldBe 1L
    r.getAs[Long]("g_micro") shouldBe 3669000L
    r.getAs[Double]("g") shouldBe 3.669
    // exact independence: every cell O = rc/n -> each ln(1) = 0
    val ind = (Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("x", "v")) ++
      Seq.fill(4)(("y", "u")) ++ Seq.fill(4)(("y", "v"))).toDF("a", "b")
    Eval.gTest(ind, "a", "b").head().getAs[Long]("g_micro") shouldBe 0L
  }

  test("cohensD: pooled-SD effect size with Hedges correction") {
    val ss = spark
    import ss.implicits._
    // a = {2,4,6} (ssw 8), b = {1,3} (ssw 2): s2 = 10/3,
    // d = 2/sqrt(10/3) = 1.095445, g = d * 8/11 = 0.796687
    val df = Seq(("a", 2), ("a", 4), ("a", 6), ("b", 1), ("b", 3))
      .toDF("g", "v")
    val r = Eval.cohensD(df, "g", "v", "a", "b").head()
    r.getAs[Long]("n_a") shouldBe 3L
    r.getAs[Long]("n_b") shouldBe 2L
    r.getAs[Double]("mean_a") shouldBe 4.0
    r.getAs[Double]("mean_b") shouldBe 2.0
    r.getAs[Double]("d") shouldBe 1.095445
    r.getAs[Double]("g") shouldBe 0.796687
    // constant groups: pooled SS 0 -> NULL d
    val const = Eval.cohensD(
      Seq(("a", 5), ("a", 5), ("b", 3)).toDF("g", "v"), "g", "v", "a", "b")
      .head()
    const.isNullAt(const.fieldIndex("d")) shouldBe true
  }

  test("brownForsythe: lower-median deviations through the ANOVA program") {
    val ss = spark
    import ss.implicits._
    // g1 = {1,2,3,100}: lower median (rank (4+1) div 2 = 2) = 2,
    //   z = {1,0,1,98} (S=100, Q=9606, A=2500)
    // g2 = {5,5,5}: median 5, z = {0,0,0}
    // ssb = 2500 - (10000 div 7 = 1428) = 1072; ssw = 9606 - 2500 = 7106
    // f = 1072*5/7106 = 0.754292
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 100),
      ("b", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val r = Eval.brownForsythe(df, "g", "v").head()
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Long]("n") shouldBe 7L
    r.getAs[Long]("ssb") shouldBe 1072L
    r.getAs[Long]("ssw") shouldBe 7106L
    r.getAs[Double]("f") shouldBe 0.754292
  }

  test("cochranArmitage: exact linear-trend chi-square") {
    val ss = spark
    import ss.implicits._
    // doses 0/1/2, n = 10 each, r = 2/5/8: A = 30*21 - 15*30 = 180,
    // z2 = 30*180^2 / (15*15*(30*50-900)) = 7.2, direction +1
    val rows = (0 until 10).flatMap { i =>
      Seq((0, i < 2), (1, i < 5), (2, i < 8))
    }
    val r = Eval.cochranArmitage(rows.toDF("dose", "y"), "dose", "y").head()
    r.getAs[Long]("n") shouldBe 30L
    r.getAs[Long]("r") shouldBe 15L
    r.getAs[Long]("k") shouldBe 3L
    r.getAs[Double]("z2") shouldBe 7.2
    r.getAs[Long]("direction") shouldBe 1L
    // constant outcome: R = N -> NULL
    val const = Eval.cochranArmitage(
      Seq((0, true), (1, true)).toDF("dose", "y"), "dose", "y").head()
    const.isNullAt(const.fieldIndex("z2")) shouldBe true
    // decreasing trend flips the sign
    val dec = (0 until 10).flatMap { i => Seq((0, i < 8), (2, i < 2)) }
    Eval.cochranArmitage(dec.toDF("dose", "y"), "dose", "y")
      .head().getAs[Long]("direction") shouldBe -1L
  }

  test("sprt: micro-nat LLR literals, Wald boundaries, three decisions") {
    val ss = spark
    import ss.implicits._
    // p0 = 1/4, p1 = 1/2: w1 = ln2 -> 693147, w0 = ln(2/3) -> -405465
    // boundaries ln(19) -> +/-2944439
    // h1: 8/10 -> 4734246 >= up; h0: 1/10 -> -2956038 <= lo;
    // go: 2/4 -> 575364 continue
    val rows =
      (1 to 8).map(_ => ("h1", true)) ++ (1 to 2).map(_ => ("h1", false)) ++
      Seq(("h0", true)) ++ (1 to 9).map(_ => ("h0", false)) ++
      Seq(("go", true), ("go", true), ("go", false), ("go", false))
    val out = Eval.sprt(rows.toDF("g", "y"), "y", 1L, 4L, 1L, 2L,
        50L, 50L, by = Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("llr_micro"), r.getAs[String]("decision")))).toMap
    out("h1") shouldBe ((4734246L, "accept_h1"))
    out("h0") shouldBe ((-2956038L, "accept_h0"))
    out("go") shouldBe ((575364L, "continue"))
    val one = Eval.sprt(Seq(("x", true)).toDF("g", "y"), "y",
      1L, 4L, 1L, 2L, 50L, 50L, by = Seq("g")).head()
    one.getAs[Long]("upper_micro") shouldBe 2944439L
    one.getAs[Long]("lower_micro") shouldBe -2944439L
  }
}
