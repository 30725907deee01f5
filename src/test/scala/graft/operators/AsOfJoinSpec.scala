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
