package graft.sinks

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Property tests for the upsert dialect SQL generators — the
 * injection-hygiene twin of JdbcSource's hwm escaping. Only Derby
 * executes end-to-end offline (JdbcUpsertSpec); for the other dialects
 * the achievable hardening is structural: over adversarial identifiers
 * (embedded quotes/backticks/dollar signs/spaces, key-only tables),
 * every generated statement must keep its `?` placeholders aligned
 * with `upsertParams` (the executor binds one value per placeholder in
 * that order — a skew silently writes columns into each other), and
 * identifier quoting must round-trip so a hostile column name can
 * never escape its quoted context.
 *
 * Plain scalacheck (no scalatestplus bridge offline): properties draw
 * fixed-seed sample batches instead of forAll, like RelationalSpec.
 */
class JdbcDialectPropSpec extends AnyFunSuite with Matchers {

  private val dialects: Seq[UpsertDialect] =
    Seq(PostgresUpsert, SqliteUpsert, MySqlUpsert, AnsiMergeUpsert, DerbyUpsert)

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  // identifiers weighted toward the hostile cases: embedded quote chars,
  // backticks, spaces, dots, dollar signs, SQL-looking fragments
  private val identGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    parts <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumStr.map(s => if (s.isEmpty) "c" else s.take(8)),
      1 -> Gen.const("\""),
      1 -> Gen.const("`"),
      1 -> Gen.const("it's"),
      1 -> Gen.const("a b"),
      1 -> Gen.const("x.y"),
      1 -> Gen.const("$1"),
      1 -> Gen.const("?"),
      1 -> Gen.const("; DROP TABLE t --")))
  } yield parts.mkString

  /** cols (distinct, non-empty) plus a non-empty key subset; sometimes
    * every column is a key (the DO NOTHING / INSERT IGNORE branch). */
  private val tableShapeGen: Gen[(Seq[String], Seq[String])] = for {
    raw <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, identGen))
    cols = raw.distinct
    nKeys <- Gen.chooseNum(1, cols.length)
    keyOnly <- Gen.frequency(4 -> false, 1 -> true)
    keys = if (keyOnly) cols else cols.take(nKeys)
  } yield (cols, keys)

  /** Remove every `q`-quoted region (doubled `q` inside = escaped),
    * leaving only the statement's structural text — any `?` that
    * survives is a real placeholder, not an identifier character. */
  private def stripQuoted(sql: String, q: Char): String = {
    val out = new StringBuilder
    var i = 0
    var inQ = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inQ) {
        if (c == q) inQ = true else out.append(c)
        i += 1
      } else if (c == q) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == q) i += 2 // escaped
        else { inQ = false; i += 1 }
      } else i += 1
    }
    out.toString
  }

  private def placeholders(d: UpsertDialect, sql: String): Int = {
    val structural = d match {
      case MySqlUpsert => stripQuoted(sql, '`')
      case _ => stripQuoted(sql, '"')
    }
    structural.count(_ == '?')
  }

  test("upsert placeholders align with upsertParams for every dialect and shape") {
    for {
      (cols, keys) <- samples(tableShapeGen, n = 60, seed = 1L)
      d <- dialects
    } {
      // CAST dialects get a type per column; one CAST(? AS T) is one ?
      val types = cols.map(_ -> "VARCHAR(128)").toMap
      val sql = d.upsertSql("s.t", keys, cols, types)
      val params = d.upsertParams(keys, cols)
      withClue(s"${d.name}: $sql\nparams=$params\n") {
        placeholders(d, sql) shouldBe params.length
        // every bound name must be a real column, keys must all bind
        params.toSet.subsetOf(cols.toSet) shouldBe true
        keys.toSet.subsetOf(params.toSet) shouldBe true
      }
      val del = d.deleteSql("s.t", keys)
      withClue(s"${d.name} delete: $del\n") {
        placeholders(d, del) shouldBe keys.length
      }
    }
  }

  test("identifier quoting round-trips and cannot escape its quoted context") {
    def unquote(quoted: String, q: Char): String = {
      quoted.head shouldBe q
      quoted.last shouldBe q
      val inner = quoted.substring(1, quoted.length - 1)
      // no lone quote char may remain inside — that would end the
      // identifier early and leak the rest into statement position
      inner.replace(s"$q$q", "").count(_ == q) shouldBe 0
      inner.replace(s"$q$q", q.toString)
    }
    for (id <- samples(identGen, n = 120, seed = 2L); d <- dialects) {
      val q = d match {
        case MySqlUpsert => '`'
        case _ => '"'
      }
      withClue(s"${d.name} quoting of <$id>: ") {
        unquote(d.quote(id), q) shouldBe id
      }
    }
  }

  test("quoteTable quotes each dotted part separately") {
    for (d <- dialects) {
      val qt = d.quoteTable("warehouse.orders")
      val q = d match {
        case MySqlUpsert => "`"
        case _ => "\""
      }
      qt shouldBe s"${q}warehouse$q.${q}orders$q"
    }
  }

  test("key-only tables produce the dialect's no-update form with aligned params") {
    val cols = Seq("k1", "k2")
    val types = cols.map(_ -> "BIGINT").toMap
    for (d <- dialects) {
      val sql = d.upsertSql("t", cols, cols, types)
      withClue(s"${d.name}: $sql\n") {
        placeholders(d, sql) shouldBe d.upsertParams(cols, cols).length
        sql should not include "UPDATE SET"
      }
    }
    PostgresUpsert.upsertSql("t", cols, cols, types) should include("DO NOTHING")
    MySqlUpsert.upsertSql("t", cols, cols, types) should include("INSERT IGNORE")
  }
}
