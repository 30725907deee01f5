package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** As-of join semantics (§2.3) on a hand-checked fixture. */
class AsOfJoinSpec extends SparkTestBase with Matchers {

  test("asOfJoin picks the newest build row at-or-before each probe, left semantics") {
    val ss = spark
    import ss.implicits._
    val probe = Seq(
      (1L, 100L, 5L), // before any dim → null
      (1L, 200L, 6L), // matches dim v1 (ts 150)
      (1L, 300L, 7L), // matches dim v2 exactly at its ts (inclusive)
      (2L, 500L, 8L)  // key with no dims at all → null
    ).toDF("k", "t", "probe_id")
    val build = Seq(
      (1L, 150L, "v1"),
      (1L, 300L, "v2"),
      (1L, 400L, "v3") // after every probe: never picked
    ).toDF("k", "t", "ver")

    val out = Relational.asOfJoin(probe, build,
        keys = Seq("k"), tsCol = "t", payload = Seq("ver"))
      .orderBy("probe_id")
      .collect().map(r => (r.getAs[Long]("probe_id"), Option(r.getAs[String]("ver"))))
    out shouldBe Array(
      (5L, None), (6L, Some("v1")), (7L, Some("v2")), (8L, None))
  }

  test("asOfJoin equals the per-probe argmax on random keyed timelines (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ss = spark
    import ss.implicits._
    def sample[A](gen: Gen[List[A]], seed: Long): List[A] =
      gen.pureApply(Gen.Parameters.default, Seed(seed))
    val rowGen = for {
      k <- Gen.chooseNum(0L, 6L)
      t <- Gen.chooseNum(0L, 50L)
    } yield (k, t)
    for (seed <- 1L to 3L) {
      val probes = sample(Gen.listOfN(80, rowGen), seed).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val builds0 = sample(Gen.listOfN(40, rowGen), seed + 100).zipWithIndex
        .map { case ((k, t), i) => (k, t, s"v$i") }
      // operator contract: build unique per (key, ts) — keep max version
      val builds = builds0.groupBy(b => (b._1, b._2))
        .map { case (_, g) => g.maxBy(_._3) }.toList
      val out = Relational.asOfJoin(
          probes.toDF("k", "t", "pid"), builds.toDF("k", "t", "ver"),
          keys = Seq("k"), tsCol = "t", payload = Seq("ver"))
        .collect().map(r => r.getAs[Long]("pid") -> Option(r.getAs[String]("ver"))).toMap
      val expect = probes.map { case (k, t, pid) =>
        val cands = builds.filter(b => b._1 == k && b._2 <= t)
        pid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(_._2)._3))
      }.toMap
      withClue(s"seed=$seed: ") { out shouldBe expect }
    }
  }

  test("asOfJoin carries legitimately-NULL payload values and never mixes build rows") {
    val ss = spark
    import ss.implicits._
    val probe = Seq((1L, 250L, 1L), (1L, 350L, 2L)).toDF("k", "t", "pid")
    // newest build at ts<=250 is (200, null, "b200"): the null `a` must
    // come through as null, NOT fall back to row 100's "a100"; and (a, b)
    // must both come from the SAME build row
    val build = Seq(
      (1L, 100L, Some("a100"), "b100"),
      (1L, 200L, None: Option[String], "b200"),
      (1L, 300L, Some("a300"), "b300")
    ).toDF("k", "t", "a", "b")
    val out = Relational.asOfJoin(probe, build,
        keys = Seq("k"), tsCol = "t", payload = Seq("a", "b"))
      .orderBy("pid")
      .collect().map(r => (Option(r.getAs[String]("a")), r.getAs[String]("b")))
    out shouldBe Array((None, "b200"), (Some("a300"), "b300"))
  }

  test("asOfJoin rejects payload collisions and missing payload columns") {
    val ss = spark
    import ss.implicits._
    val probe = Seq((1L, 1L, "x")).toDF("k", "t", "ver")
    val build = Seq((1L, 1L, "y")).toDF("k", "t", "ver")
    an[IllegalArgumentException] should be thrownBy
      Relational.asOfJoin(probe, build, Seq("k"), "t", Seq("ver"))
    an[IllegalArgumentException] should be thrownBy
      Relational.asOfJoin(probe.drop("ver"), build, Seq("k"), "t", Seq("nope"))
  }
}
