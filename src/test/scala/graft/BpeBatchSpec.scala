package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Semantics of the batched BPE trainer (q107): the dominance filter
  * must exclude exactly the interacting candidates, and a batch width
  * of 1 must degenerate to the single-merge trainer round for round. */
class BpeBatchSpec extends SparkTestBase with Matchers {

  test("batchK=1 degenerates to the single-merge trainer round for round") {
    val docs = core.Tables.documents(spark, sf0001).limit(200)
    val single = Queries.bpeTrain(docs, 4)._1
      .select("merge_round", "pair", "cnt").orderBy("merge_round").collect()
    val batched = Queries.bpeTrainBatched(docs, 4, batchK = 1)._1
      .select("merge_round", "pair", "cnt").orderBy("merge_round").collect()
    batched should contain theSameElementsInOrderAs single
  }

  test("compatible candidates merge together; chaining candidates defer a round") {
    val ss = spark
    import ss.implicits._
    // "ab cd": pairs (a b) and (c d) share no symbol — one round, both
    val disjoint = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val dj = Queries.bpeTrainBatched(disjoint, 1, batchK = 4)._1
      .select("merge_round", "pair").collect().map(r => (r.getLong(0), r.getString(1)))
    dj.toSet shouldBe Set((1L, "a b"), (1L, "c d"))

    // "abc": candidates (a b) and (b c) chain — rank 1 wins the round,
    // the chained pair re-ranks next round against the merged symbol
    val chain = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val ch = Queries.bpeTrainBatched(chain, 2, batchK = 4)._1
      .select("merge_round", "pair").collect().map(r => (r.getLong(0), r.getString(1)))
    ch.toSet shouldBe Set((1L, "a b"), (2L, "ab c"))
  }

  test("the fold applies every selected merge to the round-start strings") {
    val ss = spark
    import ss.implicits._
    // one round selects (a b) and (c d) from two disjoint word types;
    // both merged strings must reflect their merge after the one fold
    val docs = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val fin = Queries.bpeTrainBatched(docs, 1, batchK = 4)._2
      .select("word", "s").collect().map(r => (r.getString(0), r.getString(1))).toMap
    fin("ab") shouldBe " ab "
    fin("cd") shouldBe " cd "

    // the dominance rule is intentionally conservative: within "abcd",
    // (c d) is rejected because it chains with the higher-ranked —
    // itself rejected — (b c), so round 1 applies ONLY (a b); the rule
    // stays order-free (no sequential scan) and the oracle replays it
    val conservative = Seq((1L, "abcd abcd")).toDF("doc_id", "text")
    val fin2 = Queries.bpeTrainBatched(conservative, 1, batchK = 4)._2
      .select("word", "s").collect().map(r => (r.getString(0), r.getString(1))).toMap
    fin2("abcd") shouldBe " ab c d "
  }
}
