package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BehaviorSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict-after ordering, not set membership") {
    val ss = spark
    import ss.implicits._
    // u1 completes A->B->C in order; u2 has B BEFORE its A (B must not
    // count) and no later B; u3 reaches A only; u4 never does A (its
    // B/C are unreachable by definition).
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"), (1L, ts("2024-01-01 10:00:10"), "B"),
      (1L, ts("2024-01-01 10:00:40"), "C"),
      (2L, ts("2024-01-01 09:59:00"), "B"), (2L, ts("2024-01-01 10:00:00"), "A"),
      (3L, ts("2024-01-01 11:00:00"), "A"),
      (4L, ts("2024-01-01 12:00:00"), "B"), (4L, ts("2024-01-01 12:00:01"), "C")
    ).toDF("u", "t", "typ")
    val out = Behavior.funnel(ev, "u", "t", "typ", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), Option(r.getAs[java.lang.Double]("conv_from_prev")),
          Option(r.getAs[java.lang.Double]("avg_gap_s")))).toMap
    assert(out(0) == ((3L, None, None)))               // u1, u2, u3 did A
    assert(out(1) == ((1L, Some(0.333333), Some(10.0)))) // only u1's B is after A
    assert(out(2) == ((1L, Some(1.0), Some(30.0))))
  }

  test("funnel: earliest qualifying occurrence decides the gap") {
    val ss = spark
    import ss.implicits._
    // Two Bs after A: the gap must use the EARLIEST (5 s), and the C
    // at +8 s is after min(B) so it counts even though it precedes
    // the later B.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-01 00:00:05"), "B"),
      (1L, ts("2024-01-01 00:00:08"), "C"),
      (1L, ts("2024-01-01 00:00:20"), "B")
    ).toDF("u", "t", "typ")
    val out = Behavior.funnel(ev, "u", "t", "typ", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("avg_gap_s")).toMap
    assert(out(1) == 5.0)
    assert(out(2) == 3.0)
  }

  test("cohortRetention: hand matrix over two weekly cohorts") {
    val ss = spark
    import ss.implicits._
    // 2024-01-01 and 2024-01-08 are Mondays. Cohort W1 = {u1, u2}:
    // u1 active W1+W2, u2 only W1. Cohort W2 = {u3}: active W2 only.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")), // same week twice: counted once
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-08 10:00:00"))
    ).toDF("u", "t")
    val out = Behavior.cohortRetention(ev, "u", "t")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getAs[Double]("retention"))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 1.0)))
    assert(out(("2024-01-01", 1)) == ((1L, 0.5)))
    assert(out(("2024-01-08", 0)) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("sessionize: a gap of exactly gapSeconds opens a session " +
    "(session_window's half-open semantics); ties never do") {
    val ss = spark
    import ss.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:29:59")), // 29:59 < 30 min: same session
      (1L, ts("2024-01-01 00:59:59")), // exactly 30 min later: NEW
      (1L, ts("2024-01-01 00:59:59")), // tie: same session as its twin
      (2L, ts("2024-01-01 05:00:00"))
    ).toDF("u", "t")
    val out = Behavior.sessionize(ev, "u", "t", gapSeconds = 1800L)
      .groupBy("u", "session_idx").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 1L) -> 2L, (1L, 2L) -> 2L, (2L, 1L) -> 1L))
  }

  test("rollingZ: strictly-prior baseline, hand moments, null below minN") {
    val ss = spark
    import ss.implicits._
    // Series 10, 10, 10, 40: the 4th row's baseline is {10,10,10}
    // (mean 10, var 0 -> z NULL even for the spike); make the
    // baseline {8,10,12} instead to get a defined z.
    val df = Seq(("a", 1, 8L), ("a", 2, 10L), ("a", 3, 12L), ("a", 4, 20L))
      .toDF("g", "t", "v")
    val out = Behavior.rollingZ(df, Seq("g"), "t", "v", lookback = 7, minN = 3)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(3), Option(r.getAs[java.lang.Double]("z")))).toMap
    assert(out(1) == ((0L, None)))   // no baseline
    assert(out(2) == ((1L, None)))   // below minN
    assert(out(3) == ((2L, None)))
    // baseline {8,10,12}: mean 10, pop var 8/3, z = 10/sqrt(8/3)
    val z = BigDecimal(10.0 / math.sqrt(8.0 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(4) == ((3L, Some(z))))
  }

  test("growthCurve: first-seen days only, running total") {
    val ss = spark
    import ss.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-05 10:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-03 09:00:00"))
    ).toDF("u", "t")
    val out = Behavior.growthCurve(ev, "u", "t")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // u1's Jan 5 return must NOT create a new-user day
    assert(out.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)))
  }

  test("trendFit: exact line recovered, R2 = 1; flat series slope 0; " +
    "single point NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("up", 0.0, 3.0), ("up", 1.0, 5.0), ("up", 2.0, 7.0),   // y = 2x+3
      ("flat", 0.0, 4.0), ("flat", 1.0, 4.0), ("flat", 2.0, 4.0),
      ("one", 5.0, 9.0)
    ).toDF("g", "x", "y")
    val out = Behavior.trendFit(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getAs[java.lang.Double]("slope")),
          Option(r.getAs[java.lang.Double]("intercept")),
          Option(r.getAs[java.lang.Double]("r2")))).toMap
    assert(out("up") == ((3L, Some(2.0), Some(3.0), Some(1.0))))
    assert(out("flat") == ((3L, Some(0.0), Some(4.0), None))) // vy = 0
    assert(out("one") == ((1L, None, None, None)))            // vx = 0
  }

  test("transitionMatrix: per-key chains, tie-broken order, row-normalized") {
    val ss = spark
    import ss.implicits._
    // u1: A->B->A->B ; u2: A->C. Ties: u1's 2nd/3rd events share a ts,
    // the id tie-break fixes B before A.
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "A"),
      (1L, 11L, ts("2024-01-01 00:01:00"), "B"),
      (1L, 12L, ts("2024-01-01 00:01:00"), "A"), // same ts, higher id
      (1L, 13L, ts("2024-01-01 00:02:00"), "B"),
      (2L, 20L, ts("2024-01-01 00:00:00"), "A"),
      (2L, 21L, ts("2024-01-01 00:05:00"), "C")
    ).toDF("u", "id", "t", "typ")
    val out = Behavior.transitionMatrix(ev, "u", "t", "typ", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("p"))).toMap
    assert(out(("A", "B")) == ((2L, 0.666667))) // A->B twice, A->C once
    assert(out(("A", "C")) == ((1L, 0.333333)))
    assert(out(("B", "A")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("theilSen: outlier-day rejection, tie slope, interpolated median, " +
    "single-point group dropped") {
    val ss = spark
    import ss.implicits._
    // g1: perfect unit line for 4 days + one wild outlier day. 10
    // pairwise slopes = six 1.0s + {250, 333, 499, 997}; the median
    // (h = 4.5 lands between two 1.0s) is exactly 1.0 — the outlier
    // is fully rejected where OLS would report slope ≈ 172.
    // g2: y plateaus (0, 5, 5): slopes {5, 2.5, 0} -> median 2.5,
    // covering a tied y (slope 0) and odd-count exact selection.
    // g3: a single day -> no pairs -> no output row.
    val pts = Seq(
      ("g1", 0, 0L), ("g1", 1, 1L), ("g1", 2, 2L), ("g1", 3, 3L),
      ("g1", 4, 1000L),
      ("g2", 0, 0L), ("g2", 1, 5L), ("g2", 2, 5L),
      ("g3", 7, 42L)
    ).toDF("g", "x", "y")
    val out = Behavior.theilSen(pts, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ts_slope"))
      .toMap
    assert(out("g1") == 1.0)
    assert(out("g2") == 2.5)
    assert(out.size == 2)
  }

  test("theilSen: even pair count interpolates between straddling slopes") {
    val ss = spark
    import ss.implicits._
    // (0,0),(1,1),(2,2),(3,100): slopes {1, 1, 1, 33.333333, 49.5, 98};
    // h = 0.5 * 5 = 2.5 -> 1 + 0.5 * (33.333333 - 1) = 17.1666665,
    // rounds (HALF_UP) to 17.166667.
    val pts = Seq(("g", 0, 0L), ("g", 1, 1L), ("g", 2, 2L), ("g", 3, 100L))
      .toDF("g", "x", "y")
    val out = Behavior.theilSen(pts, Seq("g"), "x", "y").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("ts_slope") == 17.166667)
  }

  test("mannKendall: hand S/var18/z — monotone rise, all-tied NULL z, " +
    "tie-corrected decline, single-point group dropped") {
    val ss = spark
    import ss.implicits._
    // g1 strictly rising (1,2,3,4): S=6, var18 = 4*3*13 = 156,
    //   z = (6-1)/sqrt(156/18) = 1.698416.
    // g2 all tied (5,5,5): S=0, var18 = 66 - 66 = 0 -> z NULL.
    // g3 declining with one tie (3,3,1): S=-2, var18 = 66 - 18 = 48,
    //   z = (-2+1)/sqrt(48/18) = -0.612372.
    // g4 one point: no pairs -> dropped.
    val pts = Seq(
      ("g1", 0, 1L), ("g1", 1, 2L), ("g1", 2, 3L), ("g1", 3, 4L),
      ("g2", 0, 5L), ("g2", 1, 5L), ("g2", 2, 5L),
      ("g3", 0, 3L), ("g3", 1, 3L), ("g3", 2, 1L),
      ("g4", 9, 7L)
    ).toDF("g", "x", "y")
    val out = Behavior.mannKendall(pts, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getAs[java.lang.Double]("z"))))).toMap
    assert(out("g1") == ((4L, 6L, 156L, Some(1.698416))))
    assert(out("g2") == ((3L, 0L, 0L, None)))
    assert(out("g3") == ((3L, -2L, 48L, Some(-0.612372))))
    assert(out.size == 3)
  }

  test("seasonalIndex: hand pattern recovered under a linear trend, " +
    "gapped series contributes no partial windows") {
    val ss = spark
    import ss.implicits._
    // g1: y = 10x + pattern(x%3) with pattern (1, 4, 7) over x = 0..8,
    // period 3. Full windows are x = 1..7; every window's 3y - sum3
    // isolates the pattern exactly: phase means (-3, 0, +3) after the
    // linear trend cancels (centered MA of a line is the line).
    //   x%3=0 rows in x=1..7: x=3,6 -> num = 3*(10x+1) - (30x+12) = -9
    //   x%3=1: x=1,4,7 -> num = 0 ; x%3=2: x=2,5 -> num = +9
    //   sraw = (-3, 0, 3), center 0 -> idx (-3, 0, 3).
    // g2: x = 0..2 then a gap then 10..12 — no 3-contiguous full
    // window exists (x=1 spans 0..2: OK actually) — use x = 0,1,3,4:
    // no window of 3 CONSECUTIVE x -> group absent.
    val g1 = (0 to 8).map(x => ("g1", x, 10L * x + Seq(1L, 4L, 7L)(x % 3)))
    val g2 = Seq(0, 1, 3, 4).map(x => ("g2", x, 100L))
    val pts = (g1 ++ g2).toDF("g", "x", "y")
    val out = Behavior.seasonalIndex(pts, Seq("g"), "x", "y", period = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getAs[Double]("seasonal_idx")))).toMap
    assert(out(("g1", 0)) == ((2L, -3.0)))
    assert(out(("g1", 1)) == ((3L, 0.0)))
    assert(out(("g1", 2)) == ((2L, 3.0)))
    assert(out.size == 3) // g2 has no full window anywhere
  }

  test("touchAttribution: first vs last models disagree on long " +
    "journeys; no-touch conversions land in (none); consecutive " +
    "purchases share the same touches") {
    val ss = spark
    import ss.implicits._
    // u1: view -> click -> purchase: first=view, last=click.
    // u2: purchase with no prior touch -> (none)/(none); then a later
    //     view -> purchase: first=view, last=view.
    // u3: click -> purchase -> purchase (consecutive): both purchases
    //     attribute first=click, last=click.
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, 21L, ts("2024-01-01 09:30:00"), "view"),
      (2L, 22L, ts("2024-01-01 09:45:00"), "purchase"),
      (3L, 30L, ts("2024-01-01 08:00:00"), "click"),
      (3L, 31L, ts("2024-01-01 08:10:00"), "purchase"),
      (3L, 32L, ts("2024-01-01 08:20:00"), "purchase")
    ).toDF("u", "id", "t", "typ")
    val out = Behavior.touchAttribution(ev, "u", "t", "typ", "id", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("view") == ((2L, 1L)))   // first: u1+u2p2; last: u2p2 only
    assert(out("click") == ((2L, 3L)))  // u3's two convs first+last; u1 last
    assert(out("(none)") == ((1L, 1L))) // u2's touchless first purchase
    assert(out.size == 3)
  }

  test("kaplanMeier: textbook curve with censoring; exhausted risk set " +
    "drives survival to exactly 0 with NULL ln") {
    val ss = spark
    import ss.implicits._
    // g1: durations (1,ev) (2,ev) (2,cens) (3,ev) (4,cens):
    //   t=1: n=5 d=1 -> S=0.8; t=2: n=4 d=1 (+1 censored) -> S=0.6;
    //   t=3: n=2 d=1 -> S=0.3; t=4 censored-only: no curve row.
    // g2: (1,ev) (2,ev): at t=2 the whole risk set events out ->
    //   surv 0.0, ln_surv NULL.
    val rows = Seq(
      ("g1", 1L, 1), ("g1", 2L, 1), ("g1", 2L, 0), ("g1", 3L, 1),
      ("g1", 4L, 0),
      ("g2", 1L, 1), ("g2", 2L, 1)
    ).toDF("g", "dur", "ev")
    val out = Behavior.kaplanMeier(rows, Seq("g"), "dur", "ev")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("surv")))).toMap
    assert(out(("g1", 1L)) == ((5L, 1L, 0L, 0.8)))
    assert(out(("g1", 2L)) == ((4L, 1L, 1L, 0.6)))
    assert(out(("g1", 3L)) == ((2L, 1L, 0L, 0.3)))
    assert(out(("g2", 1L)) == ((2L, 1L, 0L, 0.5)))
    assert(out(("g2", 2L)) == ((1L, 1L, 0L, 0.0)))
    assert(out.size == 5) // no row for the censored-only t=4
  }

  test("autocorrelation: alternating series gives exact rational ACF; " +
    "x gaps break pairs; constant series NULL") {
    val ss = spark
    import ss.implicits._
    // g1: y = 2,0,2,0,2,0 at x = 0..5: z = 6y-6 = ±6, den = 216.
    //   lag1: 5 pairs of -36 -> -180/216 = -0.833333
    //   lag2: 4 pairs of +36 -> 144/216 = 0.666667
    //   lag3: 3 pairs of -36 -> -108/216 = -0.5
    // g2: x = 0,1,5 (gap): lag1 has only the (0,1) pair.
    // g3: constant y -> z = 0 -> den = 0 -> acf NULL.
    val g1 = (0 to 5).map(x => ("g1", x.toLong, if (x % 2 == 0) 2L else 0L))
    val g2 = Seq(("g2", 0L, 1L), ("g2", 1L, 3L), ("g2", 5L, 1L))
    val g3 = Seq(("g3", 0L, 4L), ("g3", 1L, 4L), ("g3", 2L, 4L))
    val out = Behavior.autocorrelation((g1 ++ g2 ++ g3).toDF("g", "x", "y"),
        Seq("g"), "x", "y", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), Option(r.getAs[java.lang.Double]("acf"))))).toMap
    assert(out(("g1", 1)) == ((5L, Some(-0.833333))))
    assert(out(("g1", 2)) == ((4L, Some(0.666667))))
    assert(out(("g1", 3)) == ((3L, Some(-0.5))))
    // g2: z = 3y-5 = (-2, 4, -2), den = 24; lag1 = the (0,1) pair only:
    // -8/24 = -0.333333
    assert(out(("g2", 1)) == ((1L, Some(-0.333333))))
    assert(!out.contains(("g2", 2))) // no x,x+2 pair exists
    assert(out(("g3", 1)) == ((2L, None)))
  }

  test("commonPaths: consecutive windows only, counts across users, " +
    "deterministic (n desc, path) top-k") {
    val ss = spark
    import ss.implicits._
    // u1: A,B,C,D -> A>B>C and B>C>D; u2: A,B,C -> A>B>C.
    // Counts: A>B>C = 2, B>C>D = 1.
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "A"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "B"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "C"),
      (1L, 13L, ts("2024-01-01 10:03:00"), "D"),
      (2L, 20L, ts("2024-01-01 11:00:00"), "A"),
      (2L, 21L, ts("2024-01-01 11:01:00"), "B"),
      (2L, 22L, ts("2024-01-01 11:02:00"), "C")
    ).toDF("u", "id", "t", "typ")
    val out = Behavior.commonPaths(ev, "u", "t", "typ", "id", len = 3, k = 5)
      .collect().map(r => (r.getInt(2), r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq((1, "A>B>C", 2L), (2, "B>C>D", 1L)))
    // k = 1 keeps only the top path
    assert(Behavior.commonPaths(ev, "u", "t", "typ", "id", 3, 1).count() == 1)
  }

  test("rfmSegments: five cleanly separated users land in five distinct " +
    "cells with recency inverted") {
    val ss = spark
    import ss.implicits._
    // user i (1..5): last activity day 2024-01-(10-(i-1)) -> r = i-1;
    // i events -> f = i; each event value 10*i -> m = 10*i*i.
    // Quintile cuts over 5 distinct values split one user per bucket:
    // user i -> (r_bucket 6-i, f_bucket i, m_bucket i).
    val ev = (1 to 5).flatMap { i =>
      (1 to i).map { j =>
        (i.toLong, ts(f"2024-01-${10 - (i - 1)}%02d 12:00:00"), 10.0 * i)
      }
    }.toDF("u", "t", "v")
    val out = Behavior.rfmSegments(ev, "u", "t", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    for (i <- 1 to 5) assert(out((6 - i, i, i)) == 1L, s"user $i cell")
    assert(out.size == 5)
  }

  test("theilSenAnomalies: the outlier day is flagged without poisoning " +
    "slope, intercept, or MAD; a perfect line flags nothing") {
    val ss = spark
    import ss.implicits._
    // g1: unit line with one wild day (the theilSen spec corpus):
    //   slope 1.0 (outlier-rejected), residuals (0,0,0,0,996) ->
    //   intercept 0, MAD 0, exactly the wild day beyond 3*MAD.
    // g2: y = 2x + 5 exactly: slope 2, intercept 5, MAD 0, none.
    val pts = Seq(
      ("g1", 0, 0L), ("g1", 1, 1L), ("g1", 2, 2L), ("g1", 3, 3L),
      ("g1", 4, 1000L),
      ("g2", 0, 5L), ("g2", 1, 7L), ("g2", 2, 9L), ("g2", 3, 11L)
    ).toDF("g", "x", "y")
    val out = Behavior.theilSenAnomalies(pts, Seq("g"), "x", "y", k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("ts_slope"),
          r.getAs[Double]("intercept"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_anomalies")))).toMap
    assert(out("g1") == ((5L, 1.0, 0.0, 0.0, 1L)))
    assert(out("g2") == ((4L, 2.0, 5.0, 0.0, 0L)))
  }

  test("engagement: hand DAU/WAU over a 9-day toy calendar") {
    val ss = spark
    import ss.implicits._
    // u1 active day1 and day8; u2 active day1 only.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-08 09:00:00"))
    ).toDF("u", "t")
    val out = Behavior.engagement(ev, "u", "t")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("stickiness"))).toMap
    // day1: DAU 2, WAU(d1-6..d1 -> only d1 activity) 2
    assert(out("2024-01-01") == ((2L, 2L, 1.0)))
    // day8: DAU 1 (u1); trailing week d2..d8 contains only d8 -> WAU 1
    assert(out("2024-01-08") == ((1L, 1L, 1.0)))
    assert(out.size == 2) // inactive days don't appear
  }

  test("cusum: level shift accumulates; flags breach h; flat is zero") {
    val ss = spark
    import ss.implicits._
    // g1 steps 10 -> 20 at day 4 (mean 15): prefix extrema include
    // C_0 = 0 (Page's S starts at zero), so S+ = 0,0,0,5,10,15 and
    // S- = 5,10,15,10,5,0; with h = 8 the up-shift flags days 5-6 and
    // the down-leg flags days 2-4. g2 constant -> all zeros, no flags.
    val rows = (1 to 6).map(d => ("g1", d, if (d <= 3) 10L else 20L)) ++
      (1 to 4).map(d => ("g2", d, 7L))
    val out = Behavior.cusum(rows.toDF("g", "d", "v"), Seq("g"), "d", "v",
        h = 8.0)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getAs[Double]("s_plus"), r.getAs[Double]("s_minus"),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(("g1", 1)) == ((0.0, 5.0, false, false)))
    assert(out(("g1", 2)) == ((0.0, 10.0, false, true)))
    assert(out(("g1", 3)) == ((0.0, 15.0, false, true)))
    assert(out(("g1", 4)) == ((5.0, 10.0, false, true)))
    assert(out(("g1", 5)) == ((10.0, 5.0, true, false)))
    assert(out(("g1", 6)) == ((15.0, 0.0, true, false)))
    (1 to 4).foreach { d =>
      assert(out(("g2", d)) == ((0.0, 0.0, false, false)))
    }
    assert(out.size == 10)
  }

  test("olsFit2: recovers an exact plane; collinear group is NULL") {
    val ss = spark
    import ss.implicits._
    // g1: y = 2 + 3*x1 - x2 exactly -> coefficients recovered, r2 = 1.
    // g2: x2 = 2*x1 (collinear) -> det = 0 -> NULL coefficients.
    val g1 = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 1L),
      (1L, 2L)).map { case (a, b) => ("g1", a, b, 2L + 3L * a - b) }
    val g2 = Seq(("g2", 1L, 2L, 5L), ("g2", 2L, 4L, 7L), ("g2", 3L, 6L, 9L))
    val out = Behavior.olsFit2((g1 ++ g2).toDF("g", "x1", "x2", "y"),
        Seq("g"), "x1", "x2", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("b0")),
          Option(r.getAs[java.lang.Double]("b1")),
          Option(r.getAs[java.lang.Double]("b2")),
          Option(r.getAs[java.lang.Double]("r2"))))).toMap
    assert(out("g1") == ((6L, Some(2.0), Some(3.0), Some(-1.0), Some(1.0))))
    assert(out("g2") == ((3L, None, None, None, None)))
  }

  test("leadLagCorr: shifted series peaks at its lag; tiny lags NULL") {
    val ss = spark
    import ss.implicits._
    // y is x delayed by one step (y_t = x_{t-1}): r = 1 exactly at
    // lag +1. Hand moments: lag -1 -> 0.5, lag 0 -> -0.821224,
    // lag +/-2 -> -1 (two points), lag +/-3 -> one point -> NULL.
    val f = Seq(("g", 1L, 1L, 9L), ("g", 2L, 5L, 1L),
      ("g", 3L, 2L, 5L), ("g", 4L, 8L, 2L)).toDF("g", "t", "x", "y")
    val out = Behavior.leadLagCorr(f, Seq("g"), "t", "x", "y", maxLag = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), Option(r.getAs[java.lang.Double]("r"))))).toMap
    assert(out(1L) == ((3L, Some(1.0))))
    assert(out(-1L) == ((3L, Some(0.5))))
    assert(out(0L) == ((4L, Some(-0.821224))))
    assert(out(2L) == ((2L, Some(-1.0))))
    assert(out(-2L) == ((2L, Some(-1.0))))
    assert(out(3L) == ((1L, None)))
    assert(out(-3L) == ((1L, None)))
    assert(out.size == 7)
  }

  test("ewmaChart: exact dyadic weights, strictly-prior window, spike") {
    val ss = spark
    import ss.implicits._
    // W = 2: forecast_t = (x_{t-1} + 3*x_{t-2})/4. g1 = (4,8,4,16):
    // t3 -> (8+12)/4 = 5 (|4-5| = 1 <= 2, quiet); t4 -> (4+24)/4 = 7
    // (|16-7| = 9 > 2, spike). g2 constant -> forecast = value, quiet.
    val rows = Seq(("g1", 1, 4L), ("g1", 2, 8L), ("g1", 3, 4L),
      ("g1", 4, 16L)) ++ (1 to 4).map(d => ("g2", d, 5L))
    val out = Behavior.ewmaChart(rows.toDF("g", "d", "v"), Seq("g"),
        "d", "v", window = 2, h = 2.0)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(("g1", 3)) == ((4.0, 5.0, false)))
    assert(out(("g1", 4)) == ((16.0, 7.0, true)))
    assert(out(("g2", 3)) == ((5.0, 5.0, false)))
    assert(out(("g2", 4)) == ((5.0, 5.0, false)))
    assert(out.size == 4) // rows without a full prior window drop
  }

  test("fanoFactor: gap days count as zeros, constant series = 0, zero-total NULL") {
    val ss = spark
    import ss.implicits._
    val daily = Seq(
      ("bursty", 0L, 3L), ("bursty", 2L, 1L), // span 3, day 1 is a zero
      ("flat", 0L, 2L), ("flat", 1L, 2L), ("flat", 2L, 2L),
      ("dead", 5L, 0L)
    ).toDF("g", "x", "n")
    val out = Behavior.fanoFactor(daily, Seq("g"), "x", "n")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        Option(r.getAs[java.lang.Double]("fano"))))).toMap
    // N=3, S=4, S2=10: F = (30-16)/12 = 7/6
    assert(out("bursty") == ((3L, 2L, 4L, 1333333L, Some(1.166667))))
    assert(out("flat") == ((3L, 3L, 6L, 2000000L, Some(0.0))))
    assert(out("dead") == ((1L, 1L, 0L, 0L, None)))
  }

  test("intervalCoverage: overlap merge, half-open chaining, nesting, " +
    "degenerate drop") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      // u: [0,10)+[5,15) overlap; [15,20) chains (half-open); [30,40) gap
      ("u", 0L, 10L), ("u", 5L, 15L), ("u", 15L, 20L), ("u", 30L, 40L),
      // v: nested interval adds nothing
      ("v", 0L, 100L), ("v", 10L, 20L),
      // w: a degenerate row drops entirely
      ("w", 5L, 5L), ("w", 0L, 2L))
      .toDF("k", "s", "e")
    val out = Behavior.intervalCoverage(df, Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("u") == ((4L, 2L, 30L, 40L, 750000L)))
    assert(out("v") == ((2L, 1L, 100L, 100L, 1000000L)))
    assert(out("w") == ((1L, 1L, 2L, 2L, 1000000L)))
  }

  test("nelsonAalen: hand risk sets, integer micro increments, " +
    "Breslow survival") {
    val ss = spark
    import ss.implicits._
    val dur = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (3L, 0), (5L, 1))
      .toDF("dur", "ev")
    val out = Behavior.nelsonAalen(dur, Seq.empty, "dur", "ev")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(6)))).toMap
    def breslow(naMicro: Long): Double =
      math.floor(math.exp(naMicro / -1000000.0) * 1e6 + 0.5) / 1e6
    // t=1: risk 6, 2 events -> 2e6 div 6 = 333333
    assert(out(1L) == ((6L, 2L, 0L, 333333L, breslow(333333L))))
    // t=2 is censoring-only: no curve row, but it shrank the risk set
    assert(!out.contains(2L))
    // t=3: risk 3 (6-2-1), 1 event -> +333333
    assert(out(3L) == ((3L, 1L, 1L, 666666L, breslow(666666L))))
    // t=5: last subject events out; hazard finite, no masking needed
    assert(out(5L) == ((1L, 1L, 0L, 1666666L, breslow(1666666L))))
  }

  test("rmst: pure-integer areas under the quantized KM steps, " +
    "tau caps the last segment") {
    val ss = spark
    import ss.implicits._
    val dur = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (3L, 0), (5L, 1))
      .toDF("dur", "ev")
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln1 = q6(math.log(4.0 / 6.0)) // t=1: (6-2)/6
    val ln2 = q6(math.log(2.0 / 3.0)) // t=3: (3-1)/3
    val s1 = math.floor(math.exp(ln1) * 1e6 + 0.5).toLong
    val s2 = math.floor(math.exp(
      (BigDecimal(ln1) + BigDecimal(ln2)).toDouble) * 1e6 + 0.5).toLong
    // S=1 on [0,1); s1 on [1,3); s2 on [3,5); 0 after t=5 (mask row)
    val want = (1L * 1000000L + s1 * 2L + s2 * 2L).toDouble / 1e6
    val out = Behavior.rmst(dur, Seq.empty, "dur", "ev", tau = 10L).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getDouble(3)) == ((10L, 1L, 3L, want)))
    // tau inside the first surv segment: 1 + s1*(2-1)
    val cap = Behavior.rmst(dur, Seq.empty, "dur", "ev", tau = 2L).head()
    assert(cap.getDouble(3) == (1000000L + s1).toDouble / 1e6)
  }

  test("logRank: identical curves give chi2 0; hand hypergeometric " +
    "terms on a shifted pair") {
    val ss = spark
    import ss.implicits._
    val same = Seq((0, 1L, 1), (0, 2L, 1), (1, 1L, 1), (1, 2L, 1))
      .toDF("grp", "dur", "ev")
    val s0 = Behavior.logRank(same, "grp", "dur", "ev").head()
    assert(s0.getLong(4) == 0L && s0.getDouble(6) == 0.0)
    // g0 events at t=1,2; g1 at t=2,3:
    // t=1: E1 = (1*2*1e6)div4 = 500000, OM = 500000; V: 12/48 -> 250000
    // t=2: n1=1,n2=2,d=2: E1 = 666666, OM = 333334; V: 4/18 -> 222222
    // t=3: n1=0: OM = 0, V = 0 (n=1)
    val shifted = Seq((0, 1L, 1), (0, 2L, 1), (1, 2L, 1), (1, 3L, 1))
      .toDF("grp", "dur", "ev")
    val s1 = Behavior.logRank(shifted, "grp", "dur", "ev").head()
    assert((s1.getLong(0), s1.getLong(1), s1.getLong(2), s1.getLong(3),
      s1.getLong(4), s1.getLong(5)) ==
      ((2L, 2L, 2L, 2L, 833334L, 472222L)))
    val chi2 = BigDecimal(
      (BigDecimal(833334L) * BigDecimal(833334L)).toDouble /
        (BigDecimal(472222L) * BigDecimal(1000000L)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s1.getDouble(6) == chi2)
  }

  test("changepointSse: exact micro gains, earliest-index tie-break") {
    val ss = spark
    import ss.implicits._
    // series {1,1,1,5,5}: S=13, gains (micro) at i=1..4:
    //   3200000, 8533333, 19200000, 7200000 -> split after index 3
    val df = Seq(("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 5),
      ("a", 5, 5)).toDF("g", "t", "v")
    val r = Behavior.changepointSse(df, Seq("g"), "t", "v").head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Int]("cp_index") == 3)
    // cp_order = the LAST point of the left segment (t = 3)
    assert(r.getAs[Int]("cp_order") == 3)
    assert(r.getAs[Long]("gain_micro") == 19200000L)
    assert(r.getAs[Double]("mean_left") == 1.0)
    assert(r.getAs[Double]("mean_right") == 5.0)
    // constant series: every gain 0, tie breaks to the EARLIEST split
    val const = Behavior.changepointSse(
      Seq(("c", 1, 2), ("c", 2, 2), ("c", 3, 2), ("c", 4, 2))
        .toDF("g", "t", "v"), Seq("g"), "t", "v").head()
    assert(const.getAs[Long]("gain_micro") == 0L)
    assert(const.getAs[Int]("cp_index") == 1)
    // single-point series has no interior split and drops
    assert(Behavior.changepointSse(Seq(("s", 1, 9)).toDF("g", "t", "v"),
      Seq("g"), "t", "v").count() == 0L)
  }
}
