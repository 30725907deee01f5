package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Corpus-distribution operators: bigram LM scoring, DSIR importance
  * weights, per-slice KL divergence — hand-computed expectations plus
  * partition-order independence (the decimal-sum contract). */
class CorpusLMSpec extends SparkTestBase with Matchers {

  test("bigramNll matches the hand-computed add-one model") {
    val ss = spark
    import ss.implicits._
    // corpus: doc1 [a b a] -> bigrams "a b","b a"; doc2 [b a] -> "b a";
    // doc3 [solo] -> none, but its token still counts toward V
    // c2("a b")=1, c2("b a")=2; c1(a)=1, c1(b)=2; V=3 (a, b, solo)
    // term("a b") = ln((1+3)/(1+1)) = ln(2)   = 0.693147 (6 dp)
    // term("b a") = ln((2+3)/(2+1)) = ln(5/3) = 0.510826 (6 dp)
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    val got = CorpusLM.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    got.length shouldBe 2 // the 1-token doc has no bigrams and drops
    got(0)._1 shouldBe 1L
    got(0)._2 shouldBe 2L
    got(0)._3 shouldBe (0.693147 + 0.510826) +- 1e-9
    got(1)._3 shouldBe 0.510826 +- 1e-9
  }

  test("dsirWeights separates target-like from raw-like documents") {
    val ss = spark
    import ss.implicits._
    // target slice speaks "alpha", the rest speaks "omega": a doc made
    // of target-heavy tokens must score positive, the opposite negative
    val docs = Seq(
      (1L, true, "alpha alpha alpha alpha"),
      (2L, true, "alpha alpha alpha omega"),
      (3L, false, "omega omega omega omega"),
      (4L, false, "omega omega alpha omega")
    ).toDF("doc_id", "tgt", "text")
    val w = CorpusLM.dsirWeights(docs, "doc_id", "text", isTarget = col("tgt"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    w.map(_._2) shouldBe Array(4L, 4L, 4L, 4L)
    // With add-one smoothing over 64 buckets on an 8-token corpus the
    // smoothing mass shifts every weight slightly negative; the
    // guaranteed property is the ORDERING by target-vocabulary share:
    // doc1 (4 alpha) > doc2 (3) > doc4 (1) > doc3 (0).
    w(0)._3 should be > w(1)._3
    w(1)._3 should be > w(3)._3
    w(3)._3 should be > w(2)._3
  }

  test("sliceDivergence is zero for identical slices, positive for skewed ones") {
    val ss = spark
    import ss.implicits._
    val same = Seq(("s1", "a b c"), ("s2", "a b c")).toDF("source", "text")
    CorpusLM.sliceDivergence(same, "source", "text")
      .collect().map(_.getDouble(3)) shouldBe Array(0.0, 0.0)

    val skew = Seq(("s1", "a a a b"), ("s2", "b b b a")).toDF("source", "text")
    val kl = CorpusLM.sliceDivergence(skew, "source", "text")
      .orderBy("source").collect().map(_.getDouble(3))
    all(kl) should be > 0.0
  }

  test("bigramNllAgainst on a stream equals batch bigramNll on the training corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, "a b a"), (2L, "b a"), (3L, "a c b a"), (4L, "solo"))
    val corpus = rows.toDF("doc_id", "text")
    val batch = CorpusLM.bigramNll(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))

    val counts = CorpusLM.bigramCounts(corpus, "text")
    val vocab = CorpusLM.vocabTokens(corpus, "text")
    val input = MemoryStream[(Long, String)]
    val q = CorpusLM.bigramNllAgainst(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", counts, vocab)
      .writeStream.format("memory").queryName("t_lm").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_lm").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    streamed shouldBe batch

    // out-of-corpus text still scores: unseen context degrades to ln(V)
    val novel = CorpusLM.bigramNllAgainst(
        Seq((9L, "zz qq")).toDF("doc_id", "text"), "doc_id", "text", counts, vocab)
      .collect()
    novel.length shouldBe 1
    novel(0).getDecimal(2).doubleValue shouldBe math.log(4.0) +- 1e-6
  }

  test("dsirScoreAgainst on a stream equals batch dsirWeights on the training corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, true, "alpha alpha beta"), (2L, true, "alpha gamma"),
      (3L, false, "omega omega beta"), (4L, false, "omega gamma alpha"))
    val corpus = rows.toDF("doc_id", "tgt", "text")
    val batch = CorpusLM.dsirWeights(corpus, "doc_id", "text", isTarget = col("tgt"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))

    val lambda = CorpusLM.dsirLambda(corpus, "text", isTarget = col("tgt"))
    val input = MemoryStream[(Long, String)]
    val q = CorpusLM.dsirScoreAgainst(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", lambda)
      .writeStream.format("memory").queryName("t_dsir").outputMode("append").start()
    try {
      input.addData(rows.map(r => (r._1, r._3)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_dsir").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    streamed shouldBe batch
  }

  test("dsirWeights with target == corpus is exactly zero for every doc") {
    // ct = cr and nt = nr make every bucket term ln(1) = 0 exactly —
    // the algebraic identity that pins the histogram pairing
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val w = CorpusLM.dsirWeights(docs, "doc_id", "text", isTarget = lit(true))
    w.filter(col("logw") =!= lit(BigDecimal(0))).count() shouldBe 0L
    w.count() should be > 0L
  }

  test("bigramNll is partition-order independent (exact decimal sums)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusLM.bigramNll(docs, "doc_id", "text").orderBy("doc_id").collect()
    val b = CorpusLM.bigramNll(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect()
    a shouldBe b
  }

  test("vocabGrowth: new types land in their first-occurrence slice, " +
    "cumulative totals are exact") {
    val ss = spark
    import ss.implicits._
    // 4 docs, 2 buckets: docs {1,2} then {3,4}. Types: a,b appear
    // first in bucket 1; c first in doc 3; nothing new in doc 4.
    val docs = Seq(
      (1L, "a b a"), (2L, "b a"), (3L, "c a"), (4L, "a b c")
    ).toDF("doc_id", "text")
    val out = CorpusLM.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out(1) == ((2L, 5L, 2L, 5L, 2L)))  // docs 1-2: 5 toks, types {a,b}
    assert(out(2) == ((2L, 5L, 1L, 10L, 3L))) // docs 3-4: +c only
  }

  test("jsSourceMatrix: identical sources 0, disjoint ln2, half-overlap hand value") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      ("a", "x x"), ("b", "x x"), // identical distributions
      ("c", "y y"),               // disjoint from a/b
      ("d", "x z")                // half-overlaps a/b
    ).toDF("source", "text")
    val out = CorpusLM.jsSourceMatrix(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 6) // all pairs, including zero-overlap ones
    assert(out(("a", "b")) == ((1L, 0.0)))
    assert(out(("a", "c")) == ((0L, 0.693147)))   // ln 2
    assert(out(("c", "d")) == ((0L, 0.693147)))
    // JS({x:1}, {x:.5,z:.5}) = (1*ln(4/3) + .5*ln(2/3) + .5*ln2)/2
    assert(out(("a", "d")) == ((1L, 0.215762)))
    assert(out(("b", "d")) == ((1L, 0.215762)))
    assert(out(("b", "c")) == ((0L, 0.693147)))
  }

  test("unigramTrain: hand-derived seed scores, Viterbi piece wins, " +
    "add-one rescore at the fixed point") {
    val ss = spark
    import ss.implicits._
    // one word type "ab" x3: seeds a/b/ab each cnt 3, total 9, all
    // scored ln(1/3); Viterbi picks [ab] (one piece beats two equal
    // ones); M-step: ab cnt 3, singles 0; smoothing over tot 3 + V 3
    val v = CorpusLM.unigramTrain(Seq("ab ab ab").toDF("text"),
        "text", rounds = 2, seedTopK = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(v == Map(
      "a" -> ((0L, -1791759L)),   // ln(1/6) micro
      "b" -> ((0L, -1791759L)),
      "ab" -> ((3L, -405465L))))  // ln(4/6) micro
  }

  test("unigramTrain prunes multi-char pieces that fall off every " +
    "Viterbi path (disuse pruning)") {
    val ss = spark
    import ss.implicits._
    // corpus "aa aa b": seed a cnt 4, aa cnt 2, b cnt 1 (total 7) ->
    // s(a) = ln(4/7), s(aa) = ln(2/7); [a,a] = 2 ln(4/7) beats [aa],
    // so aa is never used and PRUNES; kept = {a: 4, b: 1}
    val v = CorpusLM.unigramTrain(Seq("aa aa b").toDF("text"),
        "text", rounds = 1, seedTopK = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(!v.contains("aa"))
    assert(v == Map(
      "a" -> ((4L, -336472L)),    // ln(5/7) micro
      "b" -> ((1L, -1252763L))))  // ln(2/7) micro
  }

  test("unigramTokenize on the training corpus: per-doc Viterbi " +
    "counts under the trained vocabulary") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "ab ab ab"), (2L, "ab a")).toDF("doc_id", "text")
    val vocab = CorpusLM.unigramTrain(docs, "text", rounds = 2,
      seedTopK = 4)
    val out = CorpusLM.unigramTokenize(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // "ab" segments as one piece under any vocab containing it with
    // the dominant score; "a" is one piece trivially
    assert(out == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
  }
}
