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
}
