package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Exactness of the rank-sum ROC-AUC: hand-computed tie handling,
  * closed-form extremes, and grouped evaluation. */
class EvalSpec extends SparkTestBase with Matchers {

  test("rocAuc: average-rank tie handling matches the hand computation") {
    val ss = spark
    import ss.implicits._
    // scores: neg {1, 2, 2, 4}, pos {2, 3, 5}
    //   pos@2: 1 below + 2 tied/2 = 2.0
    //   pos@3: 3 below            = 3.0
    //   pos@5: 4 below            = 4.0
    // U = 9.0 -> u2 = 18; AUC = 9 / (3*4) = 0.75
    val df = Seq(
      (1, false), (2, false), (2, false), (4, false),
      (2, true), (3, true), (5, true)).toDF("s", "y")
    val r = Eval.rocAuc(df, "s", "y").head()
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Long]("n_neg") shouldBe 4L
    r.getAs[Long]("u2") shouldBe 18L
    r.getAs[Double]("auc") shouldBe 0.75
  }

  test("rocAuc: perfect separation is 1, inverted is 0, single-class NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("sep", 1, false), ("sep", 2, false), ("sep", 3, true), ("sep", 4, true),
      ("inv", 3, false), ("inv", 4, false), ("inv", 1, true), ("inv", 2, true),
      ("one", 1, true), ("one", 2, true)).toDF("g", "s", "y")
    val out = Eval.rocAuc(df, "s", "y", by = Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("auc"))) None
         else Some(r.getAs[Double]("auc")))).toMap
    out("sep") shouldBe Some(1.0)
    out("inv") shouldBe Some(0.0)
    out("one") shouldBe None
  }

  test("calibrationTable: floored bins (negatives too); ppm positive rate") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (-3, true), (-1, false),  // both in bin floor(-3/2) = -2 / floor(-1/2) = -1
      (0, true), (1, false),    // bin 0
      (4, true), (5, true)      // bin 2
    ).toDF("s", "y")
    val out = Eval.calibrationTable(df, "s", "y", binWidth = 2L)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pos_rate_micro")))).toMap
    out(-2L) shouldBe ((1L, 1L, 1000000L))
    out(-1L) shouldBe ((1L, 0L, 0L))
    out(0L) shouldBe ((2L, 1L, 500000L))
    out(2L) shouldBe ((2L, 2L, 1000000L))
    out.size shouldBe 4
  }

  test("rocAuc: all-tied scores give 0.5 exactly") {
    val ss = spark
    import ss.implicits._
    val df = Seq((7, true), (7, true), (7, false), (7, false), (7, false))
      .toDF("s", "y")
    val r = Eval.rocAuc(df, "s", "y").head()
    // u2 = sum over the one tie group: np*(2*0 + nn) = 2*3 = 6 = n_pos*n_neg
    r.getAs[Long]("u2") shouldBe 6L
    r.getAs[Double]("auc") shouldBe 0.5
  }

  test("youdenThreshold: hand-computed argmax with tie toward the stricter cut") {
    val ss = spark
    import ss.implicits._
    // neg {1, 3}, pos {2, 4}; candidates (desc): t=4: tp=1 fp=0 j2n=2
    //   t=3: tp=1 fp=1 j2n=0; t=2: tp=2 fp=1 j2n=2; t=1: tp=2 fp=2 j2n=0
    // max j2n=2 at t=4 and t=2 — tie resolves to the HIGHER threshold
    val df = Seq((1, false), (3, false), (2, true), (4, true)).toDF("s", "y")
    val r = Eval.youdenThreshold(df, "s", "y").head()
    r.getAs[Int]("threshold") shouldBe 4
    r.getAs[Long]("tp") shouldBe 1L
    r.getAs[Long]("fp") shouldBe 0L
    r.getAs[Long]("j2n") shouldBe 2L
    r.getAs[Long]("j_micro") shouldBe 500000L
  }

  test("prAuc: hand-computed step-wise average precision with ties") {
    val ss = spark
    import ss.implicits._
    // neg {1, 2, 2, 4}, pos {2, 3, 5}; thresholds desc:
    //   s=5: np=1 tp=1 fp=0 -> (1*1)/(1*3)  = 0.333333333
    //   s=4: np=0                           = 0
    //   s=3: np=1 tp=2 fp=1 -> (1*2)/(3*3)  = 0.222222222
    //   s=2: np=1 tp=3 fp=3 -> (1*3)/(6*3)  = 0.166666667
    //   s=1: np=0                           = 0
    // AP = 0.722222222 -> round 6 = 0.722222
    val df = Seq(
      (1, false), (2, false), (2, false), (4, false),
      (2, true), (3, true), (5, true)).toDF("s", "y")
    val r = Eval.prAuc(df, "s", "y").head()
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Long]("n_neg") shouldBe 4L
    r.getAs[Double]("ap") shouldBe 0.722222
  }

  test("prAuc: perfect separation is 1, single-class groups are NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("sep", 1, false), ("sep", 2, false), ("sep", 3, true), ("sep", 4, true),
      ("pos", 1, true), ("pos", 2, true),
      ("neg", 1, false), ("neg", 2, false)).toDF("g", "s", "y")
    val out = Eval.prAuc(df, "s", "y", by = Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("ap"))) None
         else Some(r.getAs[Double]("ap")))).toMap
    out("sep") shouldBe Some(1.0)
    out("pos") shouldBe None
    out("neg") shouldBe None
  }

  test("rrfFuse: integer contributions, tie to lower id, opposed rankers balance") {
    val ss = spark
    import ss.implicits._
    // ranker A (score desc): 1, 2, 3 — ranker B (len desc): 3, 2, 1
    val df = Seq((1L, 30, 10L), (2L, 20, 20L), (3L, 10, 30L))
      .toDF("id", "score", "len")
    val out = Eval.rrfFuse(df, "id", by = Nil,
        rankers = Seq("a" -> Seq(col("score").desc), "b" -> Seq(col("len").desc)),
        k = 60, topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b")))
    // 10^6 // 61 = 16393, // 62 = 16129, // 63 = 15873
    // id1: 16393+15873 = 32266; id2: 16129*2 = 32258; id3: 15873+16393
    // ids 1 and 3 tie at 32266 -> ascending id wins
    out shouldBe Array(
      (1L, 32266L, 1L, 3L),
      (3L, 32266L, 3L, 1L),
      (2L, 32258L, 2L, 2L))
  }

  test("youdenThreshold: perfect separation picks the lowest positive score") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1, false), (2, false), (10, true), (11, true)).toDF("s", "y")
    val r = Eval.youdenThreshold(df, "s", "y").head()
    // j2n maxes at 2*2 = 4 anywhere in (2, 10]; candidates are distinct
    // scores, so t=10 (J = 1 exactly)
    r.getAs[Int]("threshold") shouldBe 10
    r.getAs[Long]("j_micro") shouldBe 1000000L
  }

  test("twoProportionZ: hand counts and the textbook statistic") {
    val ss = spark
    import ss.implicits._
    // A: 4 units, 1 success; B: 4 units, 3 successes.
    val units = Seq(
      (false, true), (false, false), (false, false), (false, false),
      (true, true), (true, true), (true, true), (true, false)
    ).toDF("variant", "ok")
    val r = Eval.twoProportionZ(units, "variant", "ok").head()
    r.getAs[Long]("n_a") shouldBe 4L
    r.getAs[Long]("c_b") shouldBe 3L
    r.getAs[Double]("p_a") shouldBe 0.25
    r.getAs[Double]("p_b") shouldBe 0.75
    // pooled 0.5: se = sqrt(.5*.5*(1/4+1/4)) = sqrt(0.125)
    val z = BigDecimal(0.5 / math.sqrt(0.5 * 0.5 * (1.0 / 4 + 1.0 / 4)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getAs[Double]("z") shouldBe z
  }

  test("twoProportionZ: degenerate pooled rate yields NULL z") {
    val ss = spark
    import ss.implicits._
    val units = Seq((false, false), (true, false)).toDF("variant", "ok")
    val r = Eval.twoProportionZ(units, "variant", "ok").head()
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("twoProportionZ: by-group arms stay independent") {
    val ss = spark
    import ss.implicits._
    val units = Seq(
      // group g1: identical arms -> z = 0
      ("g1", false, true), ("g1", false, false),
      ("g1", true, true), ("g1", true, false),
      // group g2: all-A-fail vs all-B-convert -> large positive z
      ("g2", false, false), ("g2", false, false),
      ("g2", true, true), ("g2", true, true)
    ).toDF("g", "variant", "ok")
    val out = Eval.twoProportionZ(units, "variant", "ok", by = Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("z")))).toMap
    assert(out("g1") == ((2L, 2L, Some(0.0))))
    // g2: p=0 vs 1, pooled .5: se = sqrt(.25*1) = .5 -> z = 1/.5 = 2
    assert(out("g2") == ((2L, 2L, Some(2.0))))
  }

  test("ksTest: hand gaps, tie at the max goes to the greatest score") {
    val ss = spark
    import ss.implicits._
    // A = {1,2}, B = {2,3}: gaps (x2n) at s=1: 2, s=2: 2, s=3: 0
    // -> D = 2/4 = 0.5, attained at both s=1 and s=2 -> d_at = 2
    val df = Seq((true, 1.0), (true, 2.0), (false, 2.0), (false, 3.0))
      .toDF("a", "v")
    val r = Eval.ksTest(df, "a", "v").head()
    r.getAs[Long]("n_a") shouldBe 2L
    r.getAs[Long]("n_b") shouldBe 2L
    r.getAs[Double]("d") shouldBe 0.5
    r.getAs[Double]("d_at") shouldBe 2.0
  }

  test("ksTest: identical samples give D = 0; disjoint give D = 1") {
    val ss = spark
    import ss.implicits._
    val same = Seq((true, 1.0), (false, 1.0), (true, 5.0), (false, 5.0))
      .toDF("a", "v")
    Eval.ksTest(same, "a", "v").head().getAs[Double]("d") shouldBe 0.0
    val disj = Seq((true, 1.0), (true, 2.0), (false, 8.0), (false, 9.0))
      .toDF("a", "v")
    Eval.ksTest(disj, "a", "v").head().getAs[Double]("d") shouldBe 1.0
  }

  test("decileLift: hand deciles over 1..20, lift concentrates the label") {
    val ss = spark
    import ss.implicits._
    val df = (1 to 20).map(i => (i.toDouble, i > 15)).toDF("s", "y")
    val out = Eval.decileLift(df, "s", "y")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("lift"))).toMap
    assert(out.size == 10)
    assert(out.values.map(_._1).sum == 20L)
    assert(out(1) == ((2L, 0L, 0.0)))
    assert(out(8) == ((2L, 1L, 2.0)))   // {15,16}: one positive
    assert(out(9) == ((2L, 2L, 4.0)))   // {17,18}
    assert(out(10) == ((2L, 2L, 4.0)))  // {19,20}
  }

  test("chiSquareIndependence: zero on independence, hand 2x2, " +
    "zero cells carry expected mass") {
    val ss = spark
    import ss.implicits._
    val indep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val r0 = Eval.chiSquareIndependence(indep, "a", "b").head()
    r0.getAs[Double]("chi2") shouldBe 0.0
    r0.getAs[Long]("dof") shouldBe 1L

    // perfect association with two EMPTY cells: each of the 4 grid
    // cells contributes (o-10)^2/10 = 10 -> chi2 = 40
    val dep = (Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("y", "v")))
      .toDF("a", "b")
    val r1 = Eval.chiSquareIndependence(dep, "a", "b").head()
    r1.getAs[Long]("n") shouldBe 40L
    r1.getAs[Double]("chi2") shouldBe 40.0
  }

  test("spearman: hand ranks — perfect monotone ±1, ties average, " +
    "zero-variance NULL") {
    val ss = spark
    import ss.implicits._
    // g1 perfectly rising, g2 perfectly falling, g3 with ties on both
    // sides (double-ranks x (3,3,6,8), y (2,5,5,8): rho = 60/72),
    // g4 constant x -> NULL.
    val rows = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L),
      ("g2", 1L, 30L), ("g2", 2L, 20L), ("g2", 3L, 10L),
      ("g3", 1L, 5L), ("g3", 1L, 7L), ("g3", 2L, 7L), ("g3", 3L, 9L),
      ("g4", 5L, 1L), ("g4", 5L, 2L)
    ).toDF("g", "x", "y")
    val out = Eval.spearman(rows, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("rho"))))).toMap
    out("g1") shouldBe ((3L, Some(1.0)))
    out("g2") shouldBe ((3L, Some(-1.0)))
    out("g3") shouldBe ((4L, Some(0.833333)))
    out("g4") shouldBe ((2L, None))
    out.size shouldBe 4
  }

  test("mannWhitney: tie-corrected U and continuity-corrected z") {
    val ss = spark
    import ss.implicits._
    // g1: A = (1,2,3), B = (2,4,5,6). Combined ranks with the tie at
    // 2 averaged: R_A = 1 + 2.5 + 4 = 7.5 -> U_A = 1.5. Tie term
    // T = 2^3 - 2 = 6; Var = 12*(8*7*6 - 6)/(12*7*6) = 3960/504.
    // z = (2U - n_a*n_b + 1) / (2*sqrt(Var)) = -8/(2*sqrt(3960/504)).
    // g2: A empty -> NULL z, u_a = 0 - 0 = 0.
    val rows = Seq(
      ("g1", "a", 1L), ("g1", "a", 2L), ("g1", "a", 3L),
      ("g1", "b", 2L), ("g1", "b", 4L), ("g1", "b", 5L), ("g1", "b", 6L),
      ("g2", "b", 1L), ("g2", "b", 2L), ("g2", "c", 9L)
    ).toDF("g", "s", "v")
    val out = Eval.mannWhitney(rows, Seq("g"), "s", "v", "a", "b")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("u_a"),
          Option(r.getAs[java.lang.Double]("z"))))).toMap
    out("g1") shouldBe ((3L, 4L, 1.5, Some(-1.427012)))
    out("g2") shouldBe ((0L, 2L, 0.0, None))
    out.size shouldBe 2
  }

  test("kendallTau: concordance counts and tie-corrected tau-b") {
    val ss = spark
    import ss.implicits._
    // g1 monotone rising -> tau 1; g2 one inversion among (1,1),(2,3),
    // (3,2),(4,4): C=5, D=1, tau = 4/6; g3 ties both sides:
    // (1,1),(1,2),(2,2),(3,1) -> C=1, D=2, Tx=1, Ty=2,
    // tau_b = -1/sqrt(5*4) = -0.223607; g4 all x tied -> NULL.
    val rows = Seq(
      ("g1", 1L, 1L), ("g1", 2L, 2L), ("g1", 3L, 3L),
      ("g2", 1L, 1L), ("g2", 2L, 3L), ("g2", 3L, 2L), ("g2", 4L, 4L),
      ("g3", 1L, 1L), ("g3", 1L, 2L), ("g3", 2L, 2L), ("g3", 3L, 1L),
      ("g4", 7L, 1L), ("g4", 7L, 2L)
    ).toDF("g", "x", "y")
    val out = Eval.kendallTau(rows, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getAs[java.lang.Double]("tau_b"))))).toMap
    out("g1") shouldBe ((3L, 3L, 0L, Some(1.0)))
    out("g2") shouldBe ((4L, 5L, 1L, Some(0.666667)))
    out("g3") shouldBe ((4L, 1L, 2L, Some(-0.223607)))
    out("g4") shouldBe ((2L, 0L, 0L, None))
    out.size shouldBe 4
  }

  test("mutualInformation: micro-nat programs on a hand grid") {
    val ss = spark
    import ss.implicits._
    // cells (x,p)=2, (x,q)=1, (y,q)=1; n=4; margins x=3,y=1 / p=2,q=2.
    // micro-nat terms: 2*ln(8/6)=2*287682, 1*ln(4/6)=-405465,
    // 1*ln(2)=693147 -> smi=863046 -> mi = round(215761.5)/1e6.
    // H(a): 3*287682 + 1*1386294 -> 0.562335; H(b): ln2 -> 0.693147.
    val rows = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q"))
      .toDF("a", "b")
    val out = Eval.mutualInformation(rows, "a", "b").collect()
    out.length shouldBe 1
    out(0).getLong(0) shouldBe 4L
    out(0).getDouble(1) shouldBe 0.215762
    out(0).getDouble(2) shouldBe 0.562335
    out(0).getDouble(3) shouldBe 0.693147
  }

  test("mutualInformation: independent columns score zero") {
    val ss = spark
    import ss.implicits._
    // perfectly independent 2x2 grid: every cell ratio is exactly 1,
    // ln(1) = 0 in any engine -> mi = 0; H = ln 2 both sides.
    val rows = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val out = Eval.mutualInformation(rows, "a", "b").collect()(0)
    out.getDouble(1) shouldBe 0.0
    out.getDouble(2) shouldBe 0.693147
    out.getDouble(3) shouldBe 0.693147
  }

  test("cramersV: perfect association is 1, independence 0, constant NULL") {
    val ss = spark
    import ss.implicits._
    // a<->b perfectly associated (V = 1); a<->c independent (V = 0);
    // a<->k constant column (min(r,c) = 1 -> NULL).
    val rows = Seq(
      ("x", "p", "u", "k"), ("x", "p", "v", "k"),
      ("y", "q", "u", "k"), ("y", "q", "v", "k")
    ).toDF("a", "b", "c", "k")
    val out = Eval.cramersV(rows, Seq(("a", "b"), ("a", "c"), ("a", "k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3),
          Option(r.getAs[java.lang.Double]("v"))))).toMap
    out(("a", "b")) shouldBe ((4L, 4.0, Some(1.0)))
    out(("a", "c")) shouldBe ((4L, 0.0, Some(0.0)))
    out(("a", "k"))._3 shouldBe None
    out.size shouldBe 3
  }

  test("cuped: pooled theta, adjusted means from group sums") {
    val ss = spark
    import ss.implicits._
    // A: (0,0),(2,2); B: (1,2),(3,4). Pooled: vx0=20, theta=1.2,
    // global x-mean 1.5. A: mean 1.0 -> adj 1.0-1.2*(1.0-1.5)=1.6;
    // B: mean 3.0 -> adj 3.0-1.2*(2.0-1.5)=2.4. The raw 2.0 gap
    // shrinks to 0.8 once the covariate explains its share.
    val rows = Seq((false, 0L, 0L), (false, 2L, 2L),
      (true, 1L, 2L), (true, 3L, 4L)).toDF("variant", "x", "y")
    val out = Eval.cuped(rows, "variant", "x", "y")
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getDouble(2),
          Option(r.getAs[java.lang.Double]("mean_y_adj")),
          Option(r.getAs[java.lang.Double]("theta"))))).toMap
    out(false) shouldBe ((2L, 1.0, Some(1.6), Some(1.2)))
    out(true) shouldBe ((2L, 3.0, Some(2.4), Some(1.2)))
  }

  test("cuped: zero covariate variance leaves means unadjusted-NULL") {
    val ss = spark
    import ss.implicits._
    val rows = Seq((false, 5L, 1L), (true, 5L, 3L)).toDF("v", "x", "y")
    val out = Eval.cuped(rows, "v", "x", "y").collect()
    out.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4))
    }
    out.map(_.getDouble(2)).sorted shouldBe Array(1.0, 3.0)
  }

  test("bootstrapMeanCi: constant metric pins the interval; replicates " +
    "are deterministic") {
    val ss = spark
    import ss.implicits._
    // Every replicate of a constant-y corpus has mean exactly y, so
    // the interval collapses to a point — an exact pin that needs no
    // hash bookkeeping.
    val const = (1L to 50L).map(k => (k, 7L)).toDF("k", "y")
    val c = Eval.bootstrapMeanCi(const, "k", "y", b = 50).collect()(0)
    assert((c.getLong(0), c.getDouble(1), c.getDouble(2), c.getDouble(3),
      c.getLong(4)) == ((50L, 7.0, 7.0, 7.0, 50L)))
    // Varied metric: interval brackets sanely and replays bit-for-bit.
    val varied = (1L to 80L).map(k => (k, k % 7L)).toDF("k", "y")
    val r1 = Eval.bootstrapMeanCi(varied, "k", "y", b = 50).collect()(0)
    val r2 = Eval.bootstrapMeanCi(varied, "k", "y", b = 50).collect()(0)
    assert(r1 == r2)
    assert(r1.getDouble(2) <= r1.getDouble(1) &&
      r1.getDouble(1) <= r1.getDouble(3))
  }

  test("isotonicCalibration: PAV pooling via the minimax identity") {
    val ss = spark
    import ss.implicits._
    // g: bin rates (0.4, 0.2, 0.6), equal weights -> PAV pools the
    // violator pair to (0.3, 0.3, 0.6). h: already monotone
    // (0.2, 0.8) -> unchanged. All rates exact rationals.
    def mk(g: String, score: Long, pos: Int, neg: Int) =
      (0 until pos).map(_ => (g, score, true)) ++
        (0 until neg).map(_ => (g, score, false))
    val rows = (mk("g", 0L, 2, 3) ++ mk("g", 1L, 1, 4) ++
      mk("g", 2L, 3, 2) ++ mk("h", 0L, 1, 4) ++ mk("h", 1L, 4, 1))
      .toDF("grp", "score", "label")
    val out = Eval.isotonicCalibration(rows, "score", "label",
        binWidth = 1L, by = Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("g", 0L)) == ((5L, 2L, 0.3)))
    assert(out(("g", 1L)) == ((5L, 1L, 0.3)))
    assert(out(("g", 2L)) == ((5L, 3L, 0.6)))
    assert(out(("h", 0L)) == ((5L, 1L, 0.2)))
    assert(out(("h", 1L)) == ((5L, 4L, 0.8)))
    // the defining property: non-decreasing within each group
    Seq("g", "h").foreach { g =>
      val fits = out.toSeq.filter(_._1._1 == g).sortBy(_._1._2)
        .map(_._2._3)
      assert(fits == fits.sorted)
    }
  }

  test("cohensKappa: hand 2x2 counts, symmetric case, undefined-denominator NULL") {
    val ss = spark
    import ss.implicits._
    // a=4, b=1, c=1, d=4: po = 0.8, kappa = 2(16-1)/(5*5+5*5) = 0.6
    val rows = Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false))
    val out = Eval.cohensKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .select("n", "a", "b", "c", "d", "po_micro", "kappa").head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((10L, 4L, 1L, 1L, 4L)))
    assert(out.getLong(5) == 800000L)
    assert(out.getDouble(6) == 0.6)
    // both raters constant-false: denominator 0 -> kappa NULL, po = 1
    val deg = Eval.cohensKappa(
      Seq.fill(3)((false, false)).toDF("r1", "r2"), "r1", "r2")
      .select("po_micro", "kappa").head()
    assert(deg.getLong(0) == 1000000L)
    assert(deg.isNullAt(1))
  }

  test("fleissKappa: perfect agreement +1, perfect disagreement -1, all-one-category NULL") {
    val ss = spark
    import ss.implicits._
    def k(nps: Seq[Long], r: Int): org.apache.spark.sql.Row =
      Eval.fleissKappa(nps.toDF("n_pos"), "n_pos", r)
        .select("n_items", "pbar", "pbar_e", "kappa").head()
    // R=2: one all-pos item, one all-neg item: pbar=1, pe=0.5, kappa=1
    val a = k(Seq(2L, 0L), 2)
    assert(a.getLong(0) == 2L && a.getDouble(1) == 1.0 &&
      a.getDouble(2) == 0.5 && a.getDouble(3) == 1.0)
    // R=2: both items split 1/1: pbar=0, pe=0.5, kappa=-1
    val b = k(Seq(1L, 1L), 2)
    assert(b.getDouble(1) == 0.0 && b.getDouble(3) == -1.0)
    // all votes positive: pe=1 -> kappa undefined NULL
    val c = k(Seq(2L, 2L), 2)
    assert(c.getDouble(2) == 1.0 && c.isNullAt(3))
    // R=5 mixed hand case: items np = {5,4,0}: spi=(25+0-5)+(16+1-5)+(0+25-5)=52
    // pbar=52/60; sp=9, sn=6: pe=(81+36)/225=0.52; kappa=(52/60-0.52)/0.48
    val d = k(Seq(5L, 4L, 0L), 5)
    assert(d.getDouble(1) == BigDecimal(52.0 / 60.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d.getDouble(2) == 0.52)
    assert(d.getDouble(3) == BigDecimal((52.0 / 60.0 - 0.52) / 0.48)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rankingMetrics: hand DCG/IDCG, perfect ranking = 1, no-relevant NULL/0") {
    val ss = spark
    import ss.implicits._
    // weights: w1=1000000, w2=round(1e6/log2(3))=630930, w3=500000
    val df = Seq(
      // group g: ranked rel order (0, 2, 1) — imperfect
      ("g", 1L, 30L, 0L), ("g", 2L, 20L, 2L), ("g", 3L, 10L, 1L),
      // group p: perfect ranking (2, 1, 0)
      ("p", 1L, 30L, 2L), ("p", 2L, 20L, 1L), ("p", 3L, 10L, 0L),
      // group z: nothing relevant
      ("z", 1L, 30L, 0L), ("z", 2L, 20L, 0L)
    ).toDF("grp", "id", "score", "rel")
    val out = Eval.rankingMetrics(df, "grp", "id", "score", "rel", k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Double]("ndcg")), r.getLong(5)))).toMap
    val g = out("g")
    assert(g._1 == 2L * 630930 + 500000) // 1761860
    assert(g._2 == 2L * 1000000 + 630930) // 2630930
    assert(g._3.get == BigDecimal(1761860.0 / 2630930.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(g._4 == 500000L) // first relevant at rank 2
    assert(out("p")._3.get == 1.0 && out("p")._4 == 1000000L)
    assert(out("z")._3.isEmpty && out("z")._4 == 0L)
  }

  test("rankBiasedOverlap: identical lists sum the suffix table, disjoint top-k is 0, adjacent swap") {
    val ss = spark
    import ss.implicits._
    val sfx = Eval.rboSuffixMicro(10, 900000L)
    val rows =
      (1 to 20).map(i => ("same", i.toLong, 100L - i, 100L - i)) ++
      (1 to 20).map(i => ("rev", i.toLong, 100L - i, i.toLong)) ++
      // swap: B ranks item 1 second and item 2 first, rest identical
      (1 to 20).map(i => ("swap", i.toLong, 100L - i,
        if (i == 1) 98L else if (i == 2) 99L else 100L - i))
    val out = Eval.rankBiasedOverlap(rows.toDF("g", "id", "sa", "sb"),
        "g", "id", "sa", "sb", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("same") == ((10L, sfx.sum)))
    assert(out("rev") == ((0L, 0L)))
    // swapped pair both first-overlap at depth 2
    assert(out("swap") == ((10L, sfx.sum - sfx(0) + sfx(1))))
  }

  test("quantileNormalizeMap: one-group identity; shifted sources align to the same global values") {
    val ss = spark
    import ss.implicits._
    // a single source maps every value to itself (the identity pin)
    val solo = Seq(("s", 5L), ("s", 5L), ("s", 7L), ("s", 9L))
      .toDF("g", "v")
    val idm = Eval.quantileNormalizeMap(solo, "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(idm == Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
    // two shifted sources: A {1, 2}, B {11, 12} — each source's low
    // value lands on the same global position (2) and its high on 12
    val two = Seq(("a", 1L), ("a", 2L), ("b", 11L), ("b", 12L))
      .toDF("g", "v")
    val out = Eval.quantileNormalizeMap(two, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", 1L)) == ((2L, 2L)))
    assert(out(("b", 11L)) == ((2L, 2L)))
    assert(out(("a", 2L)) == ((4L, 12L)))
    assert(out(("b", 12L)) == ((4L, 12L)))
  }

  test("bradleyTerry: 2-item closed form, never-wins item -> 0, strengths sum to 1") {
    val ss = spark
    import ss.implicits._
    // two items: MM converges in one round to W_i / total = 0.8 / 0.2
    val two = Seq(("A", "B", 10L, 8L), ("B", "A", 10L, 2L))
      .toDF("i", "j", "n", "w")
    val out2 = Eval.bradleyTerry(two, "i", "j", "n", "w", iters = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out2("A") == ((8L, 10L, 0.8)))
    assert(out2("B") == ((2L, 10L, 0.2)))
    // B never wins a game: its strength pins to 0, others still rank
    val three = Seq(
      ("A", "B", 2L, 2L), ("B", "A", 2L, 0L),
      ("B", "C", 2L, 0L), ("C", "B", 2L, 2L)
    ).toDF("i", "j", "n", "w")
    val out3 = Eval.bradleyTerry(three, "i", "j", "n", "w", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out3("B") == 0.0)
    assert(out3("A") > 0.0 && out3("C") > 0.0)
    assert(math.abs(out3.values.sum - 1.0) < 1e-6)
  }

  test("conformalGate: exact rank selection, duplicate scores, coverage") {
    val ss = spark
    import ss.implicits._
    val cal = (1L to 10L).toDF("score")
    val test = Seq(5L, 10L, 11L).toDF("score")
    // alpha=1/10: r = min(10, ceil(11*9/10)) = 10 -> q_hat = 10
    val g1 = Eval.conformalGate(cal, test, "score", 1, 10).head()
    assert((g1.getLong(0), g1.getLong(1), g1.getLong(2), g1.getLong(3),
      g1.getLong(4), g1.getLong(5), g1.getLong(6)) ==
      ((10L, 10L, 10L, 3L, 2L, 666666L, 900000L)))
    // alpha=1/2: r = ceil(11/2) = 6 -> q_hat = 6, only 5 covered
    val g2 = Eval.conformalGate(cal, test, "score", 1, 2).head()
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(4),
      g2.getLong(6)) == ((6L, 6L, 1L, 500000L)))
    // duplicate scores: cal {1,1,1,2}, alpha=1/4 -> r = ceil(5*3/4)=4,
    // cum reaches 4 first at score 2
    val g3 = Eval.conformalGate(Seq(1L, 1L, 1L, 2L).toDF("score"),
      Seq(1L, 2L, 3L).toDF("score"), "score", 1, 4).head()
    assert((g3.getLong(1), g3.getLong(2), g3.getLong(4)) ==
      ((4L, 2L, 2L)))
  }

  test("corpusBleu: identical pair 1.0, brevity penalty exact, " +
    "clipping, zero n-gram floor") {
    val ss = spark
    import ss.implicits._
    def bleuOf(cand: String, ref: String) = {
      val docs = Seq((1L, cand), (2L, ref)).toDF("doc_id", "text")
      val pm = Seq((1L, 2L)).toDF("cid", "rid")
      Eval.corpusBleu(docs, "doc_id", "text", pm, "cid", "rid").head()
    }
    val s0 = bleuOf("a b c d e", "a b c d e")
    assert(s0.getDouble(8) == 1.0 && s0.getLong(7) == 0L)
    // candidate shorter but fully contained: all p_n = 1,
    // bp = floor((1 - 5/4)*1e6 + 0.5) = -250000
    val s1 = bleuOf("a b c d", "a b c d e")
    assert(s1.getLong(7) == -250000L)
    assert(s1.getDouble(8) ==
      math.floor(math.exp(-250000.0 / 1e6) * 1e6 + 0.5) / 1e6)
    // clipping: "a a a" vs "a" -> p1 = 1/3; no 4-grams -> bleu 0
    val s2 = bleuOf("a a a", "a")
    assert(s2.getDouble(3) == 0.333333 && s2.getDouble(8) == 0.0)
    // a zero trigram precision floors the whole score
    val s3 = bleuOf("a b c d", "a b x d")
    assert(s3.getDouble(3) == 0.75 && s3.getDouble(5) == 0.0 &&
      s3.getDouble(8) == 0.0)
    // multi-reference pairMap (two refs for one candidate) rejected
    // loudly — an unchecked duplicate would double-count clip/total
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val multi = Seq((1L, 2L), (1L, 3L)).toDF("cid", "rid")
    intercept[IllegalArgumentException] {
      Eval.corpusBleu(docs, "doc_id", "text", multi, "cid", "rid")
    }
  }

  test("corpusBleuMulti: per-gram max clip over references differs from " +
    "single-ref; effective ref length is closest-then-shorter") {
    val ss = spark
    import ss.implicits._
    // cand "a b": ref2 "a" covers a, ref3 "b" covers b — the per-gram
    // MAX over refs clips BOTH unigrams (p1 = 1); single-ref against
    // "a" alone clips only one (p1 = 0.5)
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val single = Eval.corpusBleu(docs, "doc_id", "text",
      Seq((1L, 2L)).toDF("cid", "rid"), "cid", "rid").head()
    val multi = Eval.corpusBleuMulti(docs, "doc_id", "text",
      Seq((1L, 2L), (1L, 3L)).toDF("cid", "rid"), "cid", "rid").head()
    assert(single.getDouble(3) == 0.5)
    assert(multi.getDouble(3) == 1.0)
    // n_pairs counts DISTINCT candidates; effective ref length: both
    // refs are 1 token from cl = 2 — tie resolves to the shorter (1)
    assert(multi.getLong(0) == 1L && multi.getLong(1) == 2L &&
      multi.getLong(2) == 1L)
    // closest wins when not tied: refs of len 1 and 3 around cl = 2 —
    // |1-2| = |3-2| ties -> shorter (1); refs 3 and 9 -> closest (3)
    val docs2 = Seq((1L, "a b"), (2L, "x y z"),
      (3L, "p q r s t u v w x")).toDF("doc_id", "text")
    val m2 = Eval.corpusBleuMulti(docs2, "doc_id", "text",
      Seq((1L, 2L), (1L, 3L)).toDF("cid", "rid"), "cid", "rid").head()
    assert(m2.getLong(2) == 3L)
    // exactly one ref per candidate: multi == single (same program)
    val s1 = Eval.corpusBleu(docs, "doc_id", "text",
      Seq((1L, 2L)).toDF("cid", "rid"), "cid", "rid").head()
    val m1 = Eval.corpusBleuMulti(docs, "doc_id", "text",
      Seq((1L, 2L)).toDF("cid", "rid"), "cid", "rid").head()
    assert(s1.toSeq == m1.toSeq)
    // a repeated (cand, ref) pair dedups instead of double-counting
    val mdup = Eval.corpusBleuMulti(docs, "doc_id", "text",
      Seq((1L, 2L), (1L, 2L)).toDF("cid", "rid"), "cid", "rid").head()
    assert(mdup.toSeq == m1.toSeq)
  }

  test("simpsonDirection: textbook reversal flagged, zero-sign group " +
    "counted separately") {
    val ss = spark
    import ss.implicits._
    // A and B each trend DOWN; stacked they trend UP; C is flat
    val df = Seq(("A", 0L, 10L), ("A", 1L, 9L), ("B", 10L, 20L),
      ("B", 11L, 19L), ("C", 5L, 1L), ("C", 6L, 1L)).toDF("g", "x", "y")
    val out = Eval.simpsonDirection(df, "g", "x", "y").head()
    assert((out.getLong(0), out.getInt(1), out.getLong(2),
      out.getLong(3), out.getLong(4), out.getBoolean(5)) ==
      ((3L, 1, 0L, 2L, 1L, true)))
    // no paradox when a group agrees with the pooled direction
    val ok = Eval.simpsonDirection(
      df.unionAll(Seq(("D", 0L, 0L), ("D", 100L, 100L)).toDF("g", "x", "y")),
      "g", "x", "y").head()
    assert(!ok.getBoolean(5) && ok.getLong(2) == 1L)
  }

  test("multiclassMetrics: hand confusion incl. gold-only and " +
    "pred-only classes") {
    val ss = spark
    import ss.implicits._
    val pairs = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "d"), ("c", "b")).toDF("g", "p")
    val out = Eval.multiclassMetrics(pairs, "g", "p")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        Option(r.get(6)).map(_.asInstanceOf[Long]),
        Option(r.get(7)).map(_.asInstanceOf[Long]),
        Option(r.get(8)).map(_.asInstanceOf[Long])))).toMap
    // a: tp3 fp0 fn1 -> f1 = 6e6 div 7
    assert(out("a") == ((4L, 3L, 3L, 0L, 1L, Some(1000000L),
      Some(750000L), Some(857142L))))
    assert(out("b") == ((3L, 4L, 2L, 2L, 1L, Some(500000L),
      Some(666666L), Some(571428L))))
    // gold-only class: never predicted -> precision NULL, recall 0
    assert(out("c") == ((1L, 0L, 0L, 0L, 1L, None, Some(0L), Some(0L))))
    // pred-only class: hallucinated -> recall NULL
    assert(out("d") == ((0L, 1L, 0L, 1L, 0L, Some(0L), None, Some(0L))))
  }

  test("diffInDiff: hand four-cell lift, empty cell NULL") {
    val ss = spark
    import ss.implicits._
    // m00=1.5, m01=3, m10=2, m11=5: DiD = (5-2)-(3-1.5) = 1.5
    val df = Seq((0, 0, 1.0), (0, 0, 2.0), (0, 1, 2.0), (0, 1, 4.0),
      (1, 0, 2.0), (1, 1, 5.0)).toDF("g", "p", "v")
    val out = Eval.diffInDiff(df, "g", "p", "v").head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((2L, 2L, 1L, 1L)))
    assert((out.getDouble(4), out.getDouble(5), out.getDouble(6),
      out.getDouble(7)) == ((1.5, 3.0, 2.0, 5.0)))
    assert(out.getDouble(8) == 1.5)
    val missing = Eval.diffInDiff(
      df.where(col("g") === 0 || col("p") === 0), "g", "p", "v").head()
    assert(missing.isNullAt(8))
  }

  test("krippendorffAlpha: hand coincidences, variable raters, " +
    "degenerate margins NULL, single-rating units drop") {
    val ss = spark
    import ss.implicits._
    // units (p, n): (2,2) o01=0; (0,2) o01=0; (1,2) o01=2e6
    // n1=3, n0=3, nc=6: alpha = 1 - 2e6*5/(2*3*3*1e6) = 1 - 10/18
    val v = Seq(("g", 2L, 2L), ("g", 0L, 2L), ("g", 1L, 2L),
      ("g", 1L, 1L), // unpairable: drops entirely
      ("p", 2L, 2L), ("p", 3L, 3L), // perfect + all-positive: NULL
      ("q", 2L, 2L), ("q", 0L, 3L)) // perfect split agreement
      .toDF("grp", "n_pos", "n_raters")
    val out = Eval.krippendorffAlpha(v, "n_pos", "n_raters", Seq("grp"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(out("g") == ((3L, 6L, 3L, 2000000L,
      Some(BigDecimal(1.0 - 10.0 / 18.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(out("p")._5.isEmpty) // n0 = 0: chance disagreement undefined
    // zero observed disagreement across mixed units: alpha = 1
    assert(out("q") == ((2L, 5L, 2L, 0L, Some(1.0))))
  }
}
