package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Pretraining quality operators: repetition counts (both computation
  * paths agree) and eval-set n-gram decontamination. */
class TextMetricsSpec extends SparkTestBase with Matchers {

  test("repetition counts on hand-checked texts; in-array path agrees") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a b a b a"),    // bigrams: ab ba ab ba -> B=4 M=2 D=2
      (2L, "x x x x"),      // xx xx xx -> B=3 M=3 D=1
      (3L, "p q r s"),      // pq qr rs -> B=3 M=1 D=3
      (4L, "solo")          // no bigrams -> no row
    ).toDF("doc_id", "text")

    val stats = TextMetrics.repetitionStats(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats shouldBe Array((1L, 4L, 2L, 2L), (2L, 3L, 3L, 1L), (3L, 3L, 1L, 3L))

    // the scan-local Column variants must agree where both apply
    val cols = docs.select(col("doc_id"),
        TextMetrics.gramTotal(col("text"), 2).as("b"),
        TextMetrics.topGramCount(col("text"), 2).as("m"),
        TextMetrics.gramDistinct(col("text"), 2).as("d"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    cols shouldBe Array((1L, 4L, 2L, 2L), (2L, 3L, 3L, 1L),
      (3L, 3L, 1L, 3L), (4L, 0L, 0L, 0L))
  }

  test("repetitionStatsInRow equals repetitionStats, batch and on a streamed replay") {
    val ss = spark
    import ss.implicits._

    // hand-checked set plus the edge cases the in-row scan must honor:
    // doubled spaces (empty-string grams) and an all-same-gram doc
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "x x x x"),
      (3L, "p q r s"),
      (4L, "solo"),
      (5L, "a  b  a"),   // doubled spaces -> "" tokens are real tokens
      (6L, "z z z z z z")
    ).toDF("doc_id", "text")

    def canon(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.select("doc_id", "gram_total", "top_gram_count", "gram_distinct")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)

    val viaAgg = canon(TextMetrics.repetitionStats(docs, "doc_id", "text", n = 2))
    val inRow = canon(TextMetrics.repetitionStatsInRow(docs, "doc_id", "text", n = 2))
    inRow shouldBe viaAgg

    // realistic corpus: the sf0.001 documents table, keep column carried
    val corpus = graft.core.Tables.documents(spark, sf0001)
    def canonK(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "gram_total", "top_gram_count", "gram_distinct")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
    canonK(TextMetrics.repetitionStatsInRow(corpus, "doc_id", "text", n = 2,
      keep = Seq("lang"))) shouldBe
      canonK(TextMetrics.repetitionStats(corpus, "doc_id", "text", n = 2,
        keep = Seq("lang")))

    // streaming twin: the same operator runs UNCHANGED on an unbounded
    // source (stateless projection — no watermark, no state store),
    // and a replayed MemoryStream over 2 micro-batches equals batch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stats = TextMetrics.repetitionStatsInRow(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", n = 2)
    stats.isStreaming shouldBe true
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rep-ckpt").toString
    val query = stats.writeStream.format("memory").queryName("t_repstats")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, "a b a b a"), (2L, "x x x x"), (4L, "solo"))
      query.processAllAvailable()
      input.addData((3L, "p q r s"), (6L, "z z z z z z"))
      query.processAllAvailable()
    } finally query.stop()
    spark.table("t_repstats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1) shouldBe viaAgg.filter(t => Set(1L, 2L, 3L, 6L)(t._1))
  }

  test("contaminatedDocs flags exactly the train docs sharing an n-gram with the eval set") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (100L, "the quick brown fox jumps"),      // eval
      (1L, "a lazy dog sat here"),              // clean train
      (2L, "see the quick brown fox run"),      // shares 4-gram with eval
      (3L, "quick brown fox jumps high today"), // shares 4-gram with eval
      (4L, "the quick brown cat sleeps")        // 4-grams differ (cat)
    ).toDF("doc_id", "text")

    val flagged = TextMetrics.contaminatedDocs(
        docs, "doc_id", "text", isEval = col("doc_id") >= 100L, n = 4)
      .collect().map(_.getLong(0)).sorted
    flagged shouldBe Array(2L, 3L)

    // the eval gram dictionary must broadcast: nothing corpus-sized
    // shuffles for the membership test
    val plan = TextMetrics.contaminatedDocs(
        docs, "doc_id", "text", isEval = col("doc_id") >= 100L, n = 4)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("streaming decontamination (stream-static) flags incrementally and survives replay") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evalDocs = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val flagged = TextMetrics.contaminatedAgainst(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      evalDocs, "text", n = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-decon-ckpt").toString
    val query = flagged.writeStream.format("memory").queryName("t_decon")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, "a lazy dog sat here"),
        (2L, "see the quick brown fox run"))
      query.processAllAvailable()
      // replay doc 2 (at-least-once delivery) + a new contaminated doc:
      // the Deduplicate state must emit each flagged id exactly once
      input.addData((2L, "see the quick brown fox run"),
        (3L, "quick brown fox jumps high today"))
      query.processAllAvailable()
    } finally query.stop()

    spark.table("t_decon").collect().map(_.getLong(0)).sorted shouldBe
      Array(2L, 3L)
  }

  test("corpusFreqStatsAgainst on a stream equals the batch join form on the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "a b a b a"), (2L, "a b c d"), (3L, "x y"), (4L, "solo"))
    val corpus = rows.toDF("doc_id", "text")
    val batch = TextMetrics.corpusFreqStats(corpus, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // the static frequency table is the batch corpus's own counts
    val counts = corpus
      .select(explode(TextMetrics.allWordShingles(col("text"), 2)).as("__gram"))
      .groupBy("__gram").agg(count(lit(1)).as("__cf"))
    // same docs arriving as a stream, scored statelessly per row
    val input = MemoryStream[(Long, String)]
    val scored = TextMetrics.corpusFreqStatsAgainst(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", counts, n = 2)
    val q = scored.writeStream.format("memory").queryName("t_cfreq")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table("t_cfreq").orderBy("doc_id").collect() shouldBe batch
    // out-of-corpus grams count 0 and drive freq_min to 0
    val novel = TextMetrics.corpusFreqStatsAgainst(
      Seq((9L, "zz qq")).toDF("doc_id", "text"), "doc_id", "text", counts, n = 2)
      .collect().head
    (novel.getLong(1), novel.getLong(2), novel.getLong(3)) shouldBe ((1L, 0L, 0L))
  }

  test("splitLongDocs: overlapping windows cover the doc exactly; short docs are one piece") {
    val ss = spark
    import ss.implicits._
    val thirteen = (1 to 13).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, thirteen), (2L, "a b c"), (3L, " ")).toDF("doc_id", "text")
    val out = TextMetrics.splitLongDocs(docs, "doc_id", "text",
        maxWords = 8, strideWords = 4)
      .select("doc_id", "piece_idx", "piece", "piece_words")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // 13 words, window 8, stride 4 → starts 0/4/8, lengths 8/8/5
    out.filter(_._1 == 1L).map(t => (t._2, t._4)) shouldBe
      Seq((0L, 8L), (1L, 8L), (2L, 5L))
    out.filter(_._1 == 1L).map(_._3).head shouldBe
      (1 to 8).map(i => s"w$i").mkString(" ")
    out.filter(_._1 == 1L).map(_._3).last shouldBe
      (9 to 13).map(i => s"w$i").mkString(" ")
    // consecutive pieces overlap by maxWords − stride = 4 words
    out.filter(_._1 == 1L).map(_._3).apply(1) shouldBe
      (5 to 12).map(i => s"w$i").mkString(" ")
    // short doc: one whole piece; wordless doc drops
    out.filter(_._1 == 2L) shouldBe Seq((2L, 0L, "a b c", 3L))
    out.map(_._1).toSet shouldBe Set(1L, 2L)
    // narrow: no shuffle anywhere in the split
    TextMetrics.splitLongDocs(docs, "doc_id", "text", 8, 4)
      .queryExecution.sparkPlan.toString should not include "Exchange"
  }

  test("hashedLinearScore: weight arithmetic checks out; in-row twin agrees on a stream") {
    val ss = spark
    import ss.implicits._
    // hand-check one token: "a" → poly hash 97, bucket 97 % 64 = 33,
    // weight ((33·2654435761) mod 1e9+7) mod 2001 − 1000
    val wantA = 33L * 2654435761L % 1000000007L % 2001L - 1000L
    val one = TextMetrics.hashedLinearScore(
      Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text").collect().head
    (one.getLong(1), one.getLong(2)) shouldBe ((1L, wantA))
    // additivity + empty-doc drop, both paths, row for row
    val docs = Seq((1L, "a a b"), (2L, "  "), (3L, "c d e f"), (4L, "a"))
      .toDF("doc_id", "text")
    val viaAgg = TextMetrics.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    viaAgg.map(_._1) shouldBe Array(1L, 3L, 4L) // doc 2 has no tokens
    viaAgg(0)._3 shouldBe 2 * wantA + (TextMetrics.hashedLinearScoreInRow(
      Seq((9L, "b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getLong(2))
    val inRow = TextMetrics.hashedLinearScoreInRow(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    inRow shouldBe viaAgg
    // the in-row path scores an unbounded append stream unchanged
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val scored = TextMetrics.hashedLinearScoreInRow(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    scored.isStreaming shouldBe true
    val q = scored.writeStream.format("memory").queryName("t_hls")
      .outputMode("append").start()
    try {
      input.addData((1L, "a a b"), (3L, "c d e f"), (4L, "a"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("t_hls").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe viaAgg
  }

  test("piiScan counts non-overlapping class matches; clean text is all-zero") {
    val ss = spark
    import ss.implicits._
    val d = Seq(
      (1L, "reach me at bob@example.com or alice@test.org"),
      (2L, "server 192.168.0.1 fell over; peer 10.0.0.2 took over"),
      (3L, "call +1 (555) 123-4567 today"),
      (4L, "a perfectly clean sentence with number 42"),
      (5L, "mixed: c@d.io via 8.8.8.8 phone 555-123-9876")
    ).toDF("id", "text")
    val got = TextMetrics.piiScan(d, "text", keep = Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got(0) shouldBe ((1L, 2L, 0L, 0L))
    // the 11-char dotted quad also hits the greedy phone rule; the
    // 8-char one is below its 9-char floor
    got(1) shouldBe ((2L, 0L, 2L, 1L))
    got(2) shouldBe ((3L, 0L, 0L, 1L))
    got(3) shouldBe ((4L, 0L, 0L, 0L))
    got(4) shouldBe ((5L, 1L, 1L, 1L))
    // the scan's classes are the redact SMT's classes — one vocabulary
    TextMetrics.PiiPatterns.map(_._1) shouldBe Seq("email", "ipv4", "phone")
  }

  test("ngramNovelty: first occurrence is by min doc_id; repeats count once per doc") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a b c d"),       // grams {a b c, b c d} — all first here
      (2L, "a b c d"),       // exact repeat: both grams old -> novelty 0
      (3L, "x y a b c"),     // {x y a, y a b, a b c}: one old -> 666666 ppm
      (4L, "a b")            // < 3 words: no grams, no row
    ).toDF("doc_id", "text")
    val out = TextMetrics.ngramNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_repeated"),
          r.getAs[Long]("novelty_micro")))).toMap
    out(1L) shouldBe ((2L, 0L, 1000000L))
    out(2L) shouldBe ((2L, 2L, 0L))
    out(3L) shouldBe ((3L, 1L, 666666L))
    out.contains(4L) shouldBe false
    // a within-doc duplicated gram is one DISTINCT gram, counted once
    val rep = TextMetrics.ngramNovelty(
      Seq((1L, "k l m k l m k l m")).toDF("doc_id", "text"),
      "doc_id", "text", n = 3).head()
    rep.getAs[Long]("n_grams") shouldBe 3L // k l m, l m k, m k l
    rep.getAs[Long]("n_repeated") shouldBe 0L
  }

  test("tfidfKeywords: hand-computed idf ranking; rare term beats frequent common one") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry durian cherry")
    ).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    // idf: ln(3)=1.098612, ln(1.5)=0.405465
    val out = TextMetrics.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("rank"))) ->
        ((r.getAs[String]("term"), r.getAs[Long]("tf"),
          r.getAs[Double]("score")))).toMap
    out((1L, 1)) shouldBe (("apple", 2L, 2.197224))
    out((1L, 2)) shouldBe (("banana", 1L, 0.405465))
    // doc 3: durian (tf 1, idf ln3) outranks cherry (tf 2, idf ln1.5)
    out((3L, 1)) shouldBe (("durian", 1L, 1.098612))
    out((3L, 2)) shouldBe (("cherry", 2L, 0.81093))
  }

  test("charEntropy: hand-computed micro-nats; degenerate text scores zero") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "aabb"), // ln 2 per char -> 693147 micro-nats
      (2L, "aaaa"), // single symbol -> exactly 0
      (3L, "abcd")  // uniform over 4 -> ln 4 = 1386294
    ).toDF("doc_id", "text")
    val out = TextMetrics.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("entropy_micro")))).toMap
    out(1L) shouldBe ((4L, 2L, 693147L))
    out(2L) shouldBe ((4L, 1L, 0L))
    out(3L) shouldBe ((4L, 4L, 1386294L))
  }

  test("encodingQa: each corruption signature counts; tab/newline stay clean") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "plain ascii with\ttab and\nnewline"), // clean: \t \n excluded
      (2L, "lost � bytes � here"), // 2 replacement chars
      (3L, "bell and esc"), // 2 control chars
      (4L, "caf\u00C3\u00A9 and \u00C2\u00A0nbsp"), // 2 mojibake pairs
      (5L, "élève") // real accents: NOT mojibake (no Â/Ã lead)
    ).toDF("doc_id", "text")
    val out = TextMetrics.encodingQa(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_repl"), r.getAs[Long]("n_ctrl"),
          r.getAs[Long]("n_moji"), r.getAs[Boolean]("is_clean")))).toMap
    out(1L) shouldBe ((0L, 0L, 0L, true))
    out(2L) shouldBe ((2L, 0L, 0L, false))
    out(3L) shouldBe ((0L, 2L, 0L, false))
    out(4L) shouldBe ((0L, 0L, 2L, false))
    out(5L) shouldBe ((0L, 0L, 0L, true))
    // badness ppm: doc 2 has 2 bad chars over its length
    val d2 = TextMetrics.encodingQa(docs, "doc_id", "text")
      .filter(col("doc_id") === 2L).head()
    d2.getAs[Long]("badness_micro") shouldBe
      2L * 1000000L / d2.getAs[Long]("n_chars")
  }

  test("pmiCollocations: hand counts, exact tie broken by bigram, " +
    "minCount drops rare pairs") {
    val ss = spark
    import ss.implicits._
    // d1 'a b a b', d2 'a b c': unigrams a:3 b:3 c:1 (Nt=7);
    // bigrams 'a b':3 'b a':1 'b c':1 (Nb=5).
    // PMI('a b') = ln(3*49/45) = ln(147/45); PMI('b c') = ln(49/15) —
    // the SAME ratio: a genuine tie, broken by bigram asc.
    // PMI('b a') = ln(49/45), lowest.
    val docs = Seq("a b a b", "a b c").map(Tuple1(_)).toDF("text")
    val out = TextMetrics.pmiCollocations(docs, "text", k = 5, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val hi = r6(math.log(147.0 / 45.0))
    assert(out.toSeq == Seq(
      ("a b", 3L, hi), ("b c", 1L, hi),
      ("b a", 1L, r6(math.log(49.0 / 45.0)))))
    // minCount = 2 keeps only the triple pair
    val only = TextMetrics.pmiCollocations(docs, "text", 5, 2L).collect()
    assert(only.length == 1 && only.head.getString(0) == "a b")
  }

  test("zipfFit: an exact power law f = 840/r fits slope -1, r2 = 1; " +
    "constant frequencies give NULL (zero x-variance never hits, " +
    "zero y-variance r2 only)") {
    val ss = spark
    import ss.implicits._
    // g1: f_r = 840/r for r = 1..8 (exact integers) -> slope -1, r2 1
    // after the portable 6-dp rounding (raw -1.0000001346/0.99999999).
    // g2: all terms tied at f = 5 -> ln f constant -> vy = 0 -> r2
    // NULL but slope 0 (cov = 0, vx > 0).
    val g1 = (1 to 8).map(r => ("g1", s"t$r", 840L / r))
    val g2 = (1 to 6).map(i => ("g2", s"t$i", 5L))
    val out = TextMetrics.zipfFit((g1 ++ g2).toDF("g", "term", "f"),
        Seq("g"), "term", "f")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("slope")),
          Option(r.getAs[java.lang.Double]("r2"))))).toMap
    out("g1") shouldBe ((8L, Some(-1.0), Some(1.0)))
    out("g2") shouldBe ((6L, Some(0.0), None))
  }

  test("readability: integer counts and the portable Flesch program") {
    val ss = spark
    import ss.implicits._
    // 6 words, 2 sentences, vowel groups 2+1+1+1+1+1 = 7:
    // 206.835 - 1.015*(6/2) - 84.6*(7/6) = 105.09. The vowel-less
    // word and the empty doc exercise the floors.
    val docs = Seq(
      (1L, "Hello world. This is a test."),
      (2L, "zzz"),          // no vowels -> syllable floor 1; one sentence floor
      (3L, "")               // no words -> dropped
    ).toDF("doc_id", "text")
    val out = TextMetrics.readability(docs, "text", Seq("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("flesch")))).toMap
    out(1L) shouldBe ((6L, 2L, 7L, 105.09))
    // 1 word, 1 sentence, 1 syllable: 206.835 - 1.015 - 84.6 = 121.22
    out(2L) shouldBe ((1L, 1L, 1L, 121.22))
    out.size shouldBe 2
  }

  test("sparseCosinePairs: df cap prunes stop-terms, tf scales weights") {
    val ss = spark
    import ss.implicits._
    // At maxDf=3 apple and banana survive (df=3), cherry is rare.
    // d1/d2 identical -> cosine 1; d4 is banana with tf=2 -> cosine
    // 1/sqrt(2) against d1/d2's mixed vectors; d3's cherry mass pulls
    // its cosine to d1/d2 down to 0.143677; (3,4) share nothing.
    // At maxDf=2 EVERY shared term is pruned -> no pairs at all.
    val docs = Seq(
      (1L, "apple banana"), (2L, "apple banana"),
      (3L, "apple cherry"), (4L, "banana banana")
    ).toDF("doc_id", "text")
    // N = 4: ppm 750000 -> cap max(2, 3) = 3; ppm 500000 -> cap 2.
    val out = TextMetrics.sparseCosinePairs(docs, "doc_id", "text",
        maxDfPpm = 750000L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0), (1L, 4L, 0.707107),
      (2L, 4L, 0.707107), (1L, 3L, 0.143677), (2L, 3L, 0.143677)))
    assert(TextMetrics.sparseCosinePairs(docs, "doc_id", "text",
      maxDfPpm = 500000L, k = 10).count() == 0L)
  }

  test("hillTailIndex: hand excesses, boundary ties, short group NULL") {
    val ss = spark
    import ss.implicits._
    // g (k=2): top-2 = 1000, 100 over the 3rd value 10 -> excess
    // micro-nats (ln1000 - ln10) + (ln100 - ln10) = 6907755 ->
    // alpha = 2/6.907755 = 0.28953. h: duplicates straddle the k+1
    // boundary — the ln multiset is tie-order-invariant: top-2 of
    // (8,8,8) over 8 -> excess 0 -> NULL (degenerate, not crash).
    // s: only 2 positive values < k+1 -> NULL.
    val rows = Seq(("g", 1000L), ("g", 100L), ("g", 10L), ("g", 1L),
      ("h", 8L), ("h", 8L), ("h", 8L), ("h", 8L),
      ("s", 5L), ("s", 9L)).toDF("grp", "v")
    val out = TextMetrics.hillTailIndex(rows, Seq("grp"), "v", k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("alpha"))))).toMap
    assert(out("g") == ((4L, Some(0.28953))))
    assert(out("h") == ((4L, None)))
    assert(out("s") == ((2L, None)))
  }

  test("logOddsWords: hand z-scores on a two-group corpus; exclusive frequent token ranks first") {
    val ss = spark
    import ss.implicits._
    // group a: {x:2, y:1}; group b: {y:2, z:1}; V=3, N=6
    val docs = Seq(("a", "x x y"), ("b", "y y z")).toDF("lang", "text")
    val out = TextMetrics.logOddsWords(docs, "text", "lang", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // (a, x): delta = ln(3/3) - ln(1/5) = 1.609438 (micro-quantized),
    // z = delta / sqrt(1/3 + 1/1)
    val zax = BigDecimal(1609438.0 / 1e6 / math.sqrt(1.0 / 3 + 1.0 / 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "x")) == ((2L, 0L, zax)))
    // exclusive tokens outrank shared ones; shared y scores negative
    // in the group where it is UNDER-represented
    assert(out(("a", "y"))._3 < 0.0)
    assert(out(("b", "z"))._3 > 0.0 && out(("b", "y"))._3 > 0.0)
    assert(out(("b", "z"))._3 > out(("b", "y"))._3 ||
      out(("b", "y"))._1 == 2L)
  }

  test("passageChunks: exact cover, overlap, short-doc and boundary cases") {
    val ss = spark
    import ss.implicits._
    def doc(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc(80)), (2L, doc(10)), (3L, doc(32)),
      (4L, doc(33)), (5L, "  ")).toDF("doc_id", "text")
    val out = TextMetrics.passageChunks(docs, "doc_id", "text", 32, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // 80 toks: chunks at 0/24/48, all full width, tail covered exactly
    assert(out.keySet.count(_._1 == 1L) == 3)
    assert(out((1L, 0L)) == ((0L, 32L, (0 until 32).map(i => s"t$i").mkString(" "))))
    assert(out((1L, 1L))._1 == 24L && out((1L, 1L))._2 == 32L)
    assert(out((1L, 2L))._1 == 48L && out((1L, 2L))._2 == 32L)
    assert(out((1L, 2L))._3.endsWith("t79"))
    // short doc: one chunk of its own length; exact window: one chunk
    assert(out.keySet.count(_._1 == 2L) == 1 && out((2L, 0L))._2 == 10L)
    assert(out.keySet.count(_._1 == 3L) == 1 && out((3L, 0L))._2 == 32L)
    // 33 toks: second chunk starts at 24 and carries the last token
    assert(out.keySet.count(_._1 == 4L) == 2)
    assert(out((4L, 1L)) == ((24L, 9L,
      (24 until 33).map(i => s"t$i").mkString(" "))))
    // whitespace-only doc emits nothing
    assert(!out.keySet.exists(_._1 == 5L))
  }

  test("lognormalFit: constant group degenerates exactly; hand two-point moments") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("c", 2L), ("c", 2L), ("c", 2L), ("m", 1L), ("m", 8L),
      ("z", 0L)) // non-positive drops; group z vanishes
      .toDF("g", "v")
    val out = TextMetrics.lognormalFit(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out.keySet == Set("c", "m"))
    // constant 2s: mu = ln 2 (6dp micro-nats), sigma 0, all preds = 2
    val c = out("c")
    assert(c == ((3L, 0.693147, 0.0, 2.0, 2.0, 2.0)))
    // {1, 8}: lnv = {0, 2079442}; mu = floor(2079442/2 + .5)/1e6;
    // n*s2 - s^2 = 2079442^2 so sigma = mu; p90 = 1 + 0.9*(8-1)
    val m = out("m")
    assert(m._1 == 2L && m._2 == 1.039721 && m._3 == 1.039721)
    assert(m._4 == BigDecimal(math.exp(1.039721))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m._6 == 7.3)
  }

  test("lexicalDiversity: hand entropy/TTR/Simpson on a 3-token group") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(("g", "a a b"), ("u", "x y z")).toDF("grp", "text")
    val out = TextMetrics.lexicalDiversity(docs, Seq("grp"), "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // N=3, V=2: H = (3*ln_u(3) - 2*ln_u(2))/3e6 = 1909542/3e6
    assert(out("g") == ((3L, 2L, 666666L, 0.636514, Some(0.333333))))
    // all-distinct: H = ln(3), Simpson 0
    assert(out("u") == ((3L, 3L, 1000000L, 1.098612, Some(0.0))))
  }

  test("bm25TopK: hand-computed Okapi scores, multi-term sum, k cutoff") {
    val ss = spark
    import ss.implicits._
    // N=3 docs, A=9 tokens, avgdl=3; df(cat)=df(bird)=2 so
    // idf = ln(8/5) -> 470004 micro-nats for both terms.
    // tfc(d1,cat): 44*9*2/(20*9*2+6*9+18*3*3) = 792/576 -> 1375000
    // tfc(d2,*):   396/342 -> 1157895; tfc(d3,bird): 1584/990 -> 1600000
    val docs = Seq((1L, "cat cat dog"), (2L, "cat bird"),
      (3L, "bird bird bird bird")).toDF("doc_id", "text")
    val q = Seq(("q1", "cat"), ("q1", "bird"), ("q1", "absentterm"))
      .toDF("query_id", "term")
    val out = TextMetrics.bm25TopK(docs, "doc_id", "text", q,
        "query_id", "term", k = 10)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.size == 3)
    // d2 hits both terms: 470004*(1157895+1157895) -> 1.088431
    assert(out(1L)._1 == 2L && out(1L)._2 == 2L)
    assert(math.abs(out(1L)._3 - 1.088431) < 2e-6)
    // d3: 470004*1600000 -> 0.752006; d1: 470004*1375000 -> 0.646256
    assert(out(2L)._1 == 3L && out(2L)._2 == 1L)
    assert(math.abs(out(2L)._3 - 0.752006) < 2e-6)
    assert(out(3L)._1 == 1L && out(3L)._2 == 1L)
    assert(math.abs(out(3L)._3 - 0.646256) < 2e-6)
    // k cutoff keeps the TOP of the exact-micro-sum order
    val top2 = TextMetrics.bm25TopK(docs, "doc_id", "text", q,
        "query_id", "term", k = 2)
      .collect().map(_.getLong(2)).toSet
    assert(top2 == Set(2L, 3L))
  }

  test("rakeKeywords: corpus stopwords, degree/freq scores, exact order") {
    val ss = spark
    import ss.implicits._
    // corpus-top-1 stopword = "the"; phrases: "quick fox jumps",
    // "lazy dog", "quick fox", "dog"
    // word micro-scores: quick/fox (deg 5, freq 2) = 2500000,
    // jumps 3000000, lazy 2000000, dog (deg 3, freq 2) = 1500000
    val docs = Seq(
      (1L, "the quick fox jumps the lazy dog"),
      (2L, "the quick fox the dog")).toDF("doc_id", "text")
    val out = TextMetrics.rakeKeywords(docs, "text", k = 10, stopK = 1)
      .collect()
    out.map(_.getAs[String]("phrase")).toSeq shouldBe
      Seq("quick fox jumps", "quick fox", "lazy dog", "dog")
    out.map(_.getAs[Long]("score_micro")).toSeq shouldBe
      Seq(8000000L, 5000000L, 3500000L, 1500000L)
    out.map(_.getAs[Long]("n")).toSeq shouldBe Seq(1L, 1L, 1L, 1L)
    out.head.getAs[Long]("n_words") shouldBe 3L
    // phrases longer than maxPhraseLen drop entirely
    val capped = TextMetrics.rakeKeywords(docs, "text", k = 10,
      stopK = 1, maxPhraseLen = 2).collect()
    capped.map(_.getAs[String]("phrase")).toSeq shouldBe
      Seq("quick fox", "lazy dog", "dog")
  }

  test("rakeScoreAgainst: a NULL text doc reports n_phrases=0 / sum 0, " +
    "not NULLs (the oracle's COALESCE(..,0) convention)") {
    val ss = spark
    import ss.implicits._
    val hist = Seq((1L, "the quick fox jumps the lazy dog"),
      (2L, "the quick fox the dog")).toDF("doc_id", "text")
    val stops = TextMetrics.rakeStopwords(hist, "text", stopK = 1)
    val wsTab = TextMetrics.rakeWordScores(hist, "text", stops)
    val incoming = Seq((10L, Some("the quick fox")), (11L, None))
      .toDF("doc_id", "text")
    val out = TextMetrics.rakeScoreAgainst(
        incoming, "doc_id", "text", stops, wsTab)
      .orderBy("doc_id").collect()
    out.length shouldBe 2
    out(0).getLong(1) shouldBe 1L          // "quick fox" survives the stoplist
    out(0).getString(2) shouldBe "quick fox"
    // NULL text = zero candidate phrases, zero sums, NULL top — never a
    // NULL count (size/aggregate over a NULL array would propagate it)
    out(1).getLong(1) shouldBe 0L
    out(1).isNullAt(2) shouldBe true
    out(1).isNullAt(3) shouldBe true
    out(1).getLong(4) shouldBe 0L
  }
}
