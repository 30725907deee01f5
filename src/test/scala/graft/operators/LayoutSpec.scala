package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Exactness of the Morton interleave and the layout audit's
  * file-skipping readout on a closed-form grid. */
class LayoutSpec extends SparkTestBase with Matchers {

  test("interleaveBits: hand Morton values") {
    val ss = spark
    import ss.implicits._
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L), (65535L, 0L))
      .toDF("x", "y")
    val out = df.select(col("x"), col("y"),
        Layout.interleaveBits(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // x=101b, y=011b: x bits at even positions (1+0+16), y at odd (2+8)
    assert(out((5L, 3L)) == 27L)
    assert(out((0L, 0L)) == 0L)
    assert(out((7L, 0L)) == 21L)   // 1 + 4 + 16
    assert(out((0L, 7L)) == 42L)   // 2 + 8 + 32
    assert(out((65535L, 0L)) == (BigInt(4).pow(16) - 1).toLong / 3)
  }

  test("layoutAudit: full 16x16 grid — z-order files are 4x4 quadrants, lex files are columns") {
    val ss = spark
    import ss.implicits._
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = Layout.layoutAudit(grid, "x", "y", bits = 4, files = 16)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 32)
    (1 to 16).foreach { f =>
      // each z-order file is one 4x4 quadrant: both spans 3/15 of global
      assert(out(("zorder", f)) == ((16L, 200000L, 200000L)))
      // each lex file is one x column: x fully pruned, y never pruned
      assert(out(("lex", f)) == ((16L, 0L, 1000000L)))
    }
  }

  test("hilbertAppend: exact 4x4 walk matches the reference table") {
    val ss = spark
    import ss.implicits._
    // xy2d with s-descending reflect/transpose rotation, bits = 2:
    val expected = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (1, 1) -> 2L, (0, 1) -> 3L,
      (0, 2) -> 4L, (0, 3) -> 5L, (1, 3) -> 6L, (1, 2) -> 7L,
      (2, 2) -> 8L, (2, 3) -> 9L, (3, 3) -> 10L, (3, 2) -> 11L,
      (3, 1) -> 12L, (2, 1) -> 13L, (2, 0) -> 14L, (3, 0) -> 15L)
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val out = Layout.hilbertAppend(grid, "x", "y", bits = 2, "hkey")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getAs[Long]("hkey")).toMap
    out shouldBe expected
  }

  test("hilbertAppend: bijective and never jumps (8x8 adjacency)") {
    val ss = spark
    import ss.implicits._
    val grid = (for (x <- 0 to 7; y <- 0 to 7) yield (x, y)).toDF("x", "y")
    val keyed = Layout.hilbertAppend(grid, "x", "y", bits = 3, "hkey")
      .collect().map(r => r.getAs[Long]("hkey") -> (r.getInt(0), r.getInt(1)))
    keyed.map(_._1).toSet shouldBe (0L until 64L).toSet
    val byD = keyed.toMap
    // the Hilbert property: consecutive keys are always GRID NEIGHBORS
    // (Morton violates this at every quadrant seam)
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1
    }
  }
}
