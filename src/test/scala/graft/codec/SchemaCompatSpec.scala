package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry compatibility-gate semantics: the classic evolution matrix
  * (defaults, removals, promotions), mode directionality, transitive
  * catch-up, and the registration gate. No Spark session needed. */
class SchemaCompatSpec extends AnyFunSuite with Matchers {
  import SchemaCompat._

  private def rec(fields: String*): String =
    s"""{"type":"record","name":"r","fields":[${fields.mkString(",")}]}"""
  private val v1 = rec("""{"name":"a","type":"int"}""")
  private val addOptional = rec("""{"name":"a","type":"int"}""",
    """{"name":"b","type":"string","default":"x"}""")
  private val addRequired = rec("""{"name":"a","type":"int"}""",
    """{"name":"b","type":"string"}""")
  private val dropA = rec("""{"name":"c","type":"long","default":0}""")
  private val widenA = rec("""{"name":"a","type":"long"}""")

  test("evolution matrix: defaults, removals, numeric promotion") {
    // add optional field: compatible both ways
    check(addOptional, Seq(v1), Full) shouldBe empty
    // add required field: forward-only (old reader ignores it; new
    // reader cannot fill it from old data)
    check(addRequired, Seq(v1), Forward) shouldBe empty
    check(addRequired, Seq(v1), Backward).map(_.direction) shouldBe Seq("backward")
    // remove a field the old reader requires: backward-only
    check(dropA, Seq(v1), Backward) shouldBe empty
    check(dropA, Seq(v1), Forward).map(_.direction) shouldBe Seq("forward")
    // int -> long widening: new reader reads old ints (backward), but
    // an int reader cannot read long data (forward)
    check(widenA, Seq(v1), Backward) shouldBe empty
    check(widenA, Seq(v1), Forward).map(_.direction) shouldBe Seq("forward")
    // NONE gates nothing
    check(addRequired, Seq(v1), None) shouldBe empty
  }

  test("transitive mode checks every version, not just the latest") {
    // v2 drops the field; v3 re-adds it as a defaulted string — fine
    // vs v2 (field absent), incompatible vs v1 (int data, string reader)
    val v3 = rec("""{"name":"a","type":"string","default":"d"}""")
    check(v3, Seq(v1, dropA), Backward) shouldBe empty
    val bad = check(v3, Seq(v1, dropA), BackwardTransitive)
    bad.map(v => (v.direction, v.againstVersion)) shouldBe Seq(("backward", 1))
    bad.head.details.head should include("TYPE_MISMATCH")
  }

  test("SubjectStore gates registration, is idempotent, honors overrides") {
    val store = new SubjectStore(Backward)
    store.register("s", v1) shouldBe 1
    // backward-incompatible: rejected with the violation detail
    val e = intercept[IncompatibleSchemaException](store.register("s", addRequired))
    e.violations.head.direction shouldBe "backward"
    store.history("s").size shouldBe 1
    // compatible evolution lands as v2; byte-different but
    // semantically-identical re-register returns the existing version
    store.register("s", dropA) shouldBe 2
    store.register("s", " " + v1.replace(",", " ,")) shouldBe 1
    store.history("s").size shouldBe 2
    // per-subject override to NONE admits anything
    store.setMode("s", None)
    store.register("s", addRequired) shouldBe 3
    // unknown mode string fails loudly; known ones parse
    mode("FULL_TRANSITIVE") shouldBe FullTransitive
    an[IllegalArgumentException] should be thrownBy mode("SIDEWAYS")
  }
}
