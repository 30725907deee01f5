package graft

/** t1 smoke (SURVEY §5): every registered query runs at sf0.001 and
  * returns rows; the oracle map covers every query; the flagship entry
  * is non-empty. */
class QueriesSmokeSpec extends SparkTestBase {

  /** Queries deliberately registered without an oracle (driver records a
    * rows-only check). Empty since round 5: q36 moved to the portable
    * simhash basis and gained a real oracle. Every future entry here
    * must justify itself in Queries.scala. */
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle (minus declared rows-only exceptions)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Corpus invariant behind the byte-vs-character oracles (q36/q51/q52):
  // Spark slices BINARY by bytes while DuckDB substr is character-based, so
  // those oracles are only valid while documents.text is pure ASCII. A future
  // corpus change must fail HERE, loudly, not as an opaque red hash.
  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
       if new java.io.File(dir).isDirectory) {
    test(s"documents.text is pure ASCII at $dir") {
      import org.apache.spark.sql.functions._
      val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) =!= expr("octet_length(text)"))
        .count()
      assert(nonAscii == 0L,
        s"$nonAscii documents with multi-byte characters; byte-sliced oracles (q36/q51/q52) assume ASCII")
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned no rows")
    }
  }
}
