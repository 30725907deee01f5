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
}
