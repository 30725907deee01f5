package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => sqlSize}
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.Tables

/** Correctness of the LLM-pipeline north-star operators against their
  * brute-force formulations on the sf0.001 tables. */
class DedupSimilaritySpec extends SparkTestBase with Matchers {

  test("exactSurvivors equals group-on-text survivors") {
    val d = Tables.documents(spark, sf0001)
    val byHash = Dedup.exactSurvivors(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(0))
    val byText = d.groupBy(lower(trim(col("text"))))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    byHash should contain theSameElementsInOrderAs byText
  }

  test("chunkDedup: shared blocks survive only in the min-id doc; rebuild keeps order") {
    val ss = spark
    import ss.implicits._
    val boiler = "a b c d" // one 4-word block, shared verbatim
    val docs = Seq(
      (1L, s"$boiler one two three four"), // keeper of the boilerplate
      (2L, s"$boiler five six seven eight"), // loses block 0
      (3L, "nine ten eleven twelve five six seven eight"), // loses block 1 to doc 2
      (4L, "unique only words here")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 4)
      .select("doc_id", "clean_text", "n_chunks", "n_chunks_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (s"$boiler one two three four", 2L, 0L)
    out(2L) shouldBe ("five six seven eight", 2L, 1L)
    out(3L) shouldBe ("nine ten eleven twelve", 2L, 1L)
    out(4L) shouldBe ("unique only words here", 1L, 0L)
    // the short tail block participates too: a 6-word doc is 2 blocks
    val tail = Dedup.chunkDedup(
      Seq((1L, "a b c d e f"), (2L, "x y z w e f")).toDF("doc_id", "text"),
      "doc_id", "text", chunkWords = 4)
    tail.filter(col("doc_id") === 2L).select("n_chunks_removed")
      .head().getLong(0) shouldBe 1L // its "e f" tail lost to doc 1's
  }

  test("chunkDedupColocated equals plain chunkDedup; text never enters a hash exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val d = Tables.documents(spark, sf0001)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = Dedup.chunkDedupColocated(d, "doc_id", "text", chunkWords = 8,
        stagingTable = "graft_test_docs_staged", buckets = 4)
      // even with size-based broadcast OFF (the 100x-scale join shape),
      // the bucketed layout keeps the rebuild's text side out of every
      // exchange: only thin verdict rows move
      val shuffledTextCols = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
          e.child.output.filter(_.name == "text").map(_.name)
      }.flatten
      shuffledTextCols shouldBe empty
      val plain = Dedup.chunkDedup(d, "doc_id", "text", chunkWords = 8)
        .select("doc_id", "clean_text", "n_chunks", "n_chunks_removed")
        .orderBy("doc_id").collect()
      out.select("doc_id", "clean_text", "n_chunks", "n_chunks_removed")
        .orderBy("doc_id").collect() should contain theSameElementsInOrderAs plain
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("substringDedup: spans dedup at any alignment; within-doc repeats too; short docs untouched") {
    val ss = spark
    import ss.implicits._
    // doc 2 repeats doc 1's passage shifted by one word — a block
    // dedup (chunkDedup) at width 3 would miss it; the overlapping
    // window must not
    val docs = Seq(
      (1L, "p q r s t u"),        // keeper of every span it contains
      (2L, "z p q r s t"),        // spans "p q r"/"q r s"/"r s t" dup'd -> positions 1..5 removed
      (3L, "m n o m n o m n o"),  // within-doc repeat: "m n o m n o" at 0 keeps, span at 3 dup'd
      (4L, "a b")                 // shorter than the window: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "doc_id", "text", windowWords = 3)
      .select("doc_id", "clean_text", "n_words", "n_words_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (("p q r s t u", 6L, 0L))
    out(2L) shouldBe (("z", 6L, 5L))
    // spans of doc 3: starts 0..6; dup'd non-keeper occurrences are
    // starts 3 ("m n o" again) and 6, plus 4/5 repeating 1/2's spans —
    // covered positions 3..8, so only the first "m n o" survives
    out(3L) shouldBe (("m n o", 9L, 6L))
    out(4L) shouldBe (("a b", 2L, 0L))
  }

  test("substringDedupColocated equals plain; text never enters a hash exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val d = Tables.documents(spark, sf0001)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = Dedup.substringDedupColocated(d, "doc_id", "text",
        windowWords = 8, stagingTable = "graft_test_docs_staged_ss", buckets = 4)
      val shuffledTextCols = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
          e.child.output.filter(_.name == "text").map(_.name)
      }.flatten
      shuffledTextCols shouldBe empty
      val plain = Dedup.substringDedup(d, "doc_id", "text", windowWords = 8)
        .select("doc_id", "clean_text", "n_words", "n_words_removed")
        .orderBy("doc_id").collect()
      out.select("doc_id", "clean_text", "n_words", "n_words_removed")
        .orderBy("doc_id").collect() should contain theSameElementsInOrderAs plain
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("wordShingles: sliding distinct 3-grams; short texts empty") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b"),
      (3L, "x y z x y z")).toDF("id", "t")
    val out = df.select(col("id"), Dedup.wordShingles(col("t"), 3).as("sh"))
      .orderBy("id").collect()
    out(0).getSeq[String](1).sorted shouldBe Seq("a b c", "b c d")
    out(1).getSeq[String](1) shouldBe Seq.empty
    // duplicates collapse: "x y z ..." repeats the shingle "x y z"
    out(2).getSeq[String](1) should contain("x y z")
    out(2).getSeq[String](1).distinct.length shouldBe out(2).getSeq[String](1).length
  }

  test("nearDupPairs equals brute-force all-pairs Jaccard at sf0.001") {
    val d = Tables.documents(spark, sf0001)
    val lsh = runLsh(d)
    val sh = d.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 3).as("sh"))
      .filter(sqlSize(col("sh")) > 0)
    val inter = sqlSize(array_intersect(col("a.sh"), col("b.sh")))
    val uni = sqlSize(col("a.sh")) + sqlSize(col("b.sh")) - inter
    val brute = sh.alias("a").join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (inter.cast("double") / uni).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    lsh should contain theSameElementsInOrderAs brute
    lsh.length should be > 0
  }

  private def runLsh(d: org.apache.spark.sql.DataFrame) =
    Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.8)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("crossNearDupPairs equals nearDupPairs restricted to cross-split pairs") {
    val d = Tables.documents(spark, sf0001)
    val all = runLsh(d) // normalized d1 < d2, exact jaccard >= 0.8
    // pick an eval side guaranteed to produce cross hits: the first few
    // left ids of real pairs (their partners stay on the train side
    // unless they are themselves picked — then the pair is within-split
    // and must NOT be reported)
    val evalIds = all.map(_._1).distinct.take(3).toSet
    val expected = (all.collect { case (a, b, j) if evalIds(a) && !evalIds(b) => (a, b, j) } ++
      all.collect { case (a, b, j) if evalIds(b) && !evalIds(a) => (b, a, j) }).sorted
    val got = Dedup.crossNearDupPairs(d, "doc_id", "text",
        id => id.isInCollection(evalIds), threshold = 0.8)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got should contain theSameElementsInOrderAs expected
    got.length should be > 0
  }

  test("dupClusters: transitive chains collapse, disjoint groups stay apart") {
    val ss = spark
    import ss.implicits._
    // chain 1-2-3 (diameter 2), pair 10-11, long path 20-21-...-26
    // (diameter 6 — exercises multi-round convergence)
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L)) ++
      (20L until 26L).map(i => (i, i + 1))).toDF("d1", "d2")
    val got = Dedup.dupClusters(pairs, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = (Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)) ++
      (20L to 26L).map(i => (i, 20L))).sorted
    got should contain theSameElementsInOrderAs want
  }

  /** Jobs submitted (incl. AQE stage jobs) while `body` runs, via a job
    * group + statusTracker. The status store is fed by the async listener
    * bus, so poll until the count stabilizes. */
  private def countJobs(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(group).length
    while (cur != last) {
      Thread.sleep(300)
      last = cur
      cur = sc.statusTracker.getJobIdsForGroup(group).length
    }
    cur
  }

  test("dupClusters' fused convergence spends fewer jobs than the two-job-per-round form") {
    val ss = spark
    import ss.implicits._
    // path graph 0-1-...-6: diameter 6, so min-label propagation needs
    // several rounds — enough for the per-round job saving to dominate
    // the constant setup jobs
    val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("d1", "d2")

    val fusedJobs = countJobs("cc-fused") {
      val got = Dedup.dupClusters(pairs, "d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == (0L to 6L).map(i => (i, 0L)))
    }

    // the pre-fusion loop, replicated inline: same propagation job plus a
    // SECOND join+isEmpty job per round for the convergence check
    val unfusedJobs = countJobs("cc-unfused") {
      val edges = pairs.select(col("d1").as("__src"), col("d2").as("__dst"))
        .union(pairs.select(col("d2").as("__src"), col("d1").as("__dst")))
        .distinct().localCheckpoint()
      var labels = edges.select(col("__src").as("id")).distinct()
        .select(col("id"), col("id").as("cluster_id")).localCheckpoint()
      var converged = false
      while (!converged) {
        val prop = edges.join(labels, edges("__dst") === labels("id"))
          .select(edges("__src").as("id"), col("cluster_id"))
        val next = labels.union(prop)
          .groupBy("id").agg(min("cluster_id").as("cluster_id")).localCheckpoint()
        converged = next.join(labels.withColumnRenamed("cluster_id", "__old"), "id")
          .filter(col("cluster_id") =!= col("__old")).isEmpty
        labels = next
      }
      labels.collect()
      ()
    }

    assert(fusedJobs < unfusedJobs,
      s"fused=$fusedJobs should beat unfused=$unfusedJobs on a diameter-6 graph")
  }

  test("dupClusters on q30's sf0.001 pairs matches per-component minima") {
    val d = Tables.documents(spark, sf0001)
    val pairs = Dedup.nearDupPairs(d, "doc_id", "text",
      threshold = 0.8, shingleWidth = 3, bands = 16, rowsPerBand = 3)
    val edges = pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find on the collected (small) pair list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => (k, find(k))).toSeq.sorted
    val got = Dedup.dupClusters(pairs, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    got should contain theSameElementsInOrderAs want
    got.length should be > 0
  }

  test("knnJoin per-probe rows equal the per-probe brute-force raw-ranked top-k") {
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val got = Similarity.knnJoin(e, e.filter(col("vec_id") < 4), "vec_id", "e", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    got.keySet shouldBe Set(0L, 1L, 2L, 3L)
    for ((probe, rows) <- got) {
      // brute force with knnJoin's own ranking contract: RAW score desc,
      // id asc (cosineTopK ranks by the rounded score — not comparable
      // when two raw scores collide at 4 decimals)
      val t = e.filter(col("vec_id") === probe).agg(min(col("e")).as("__t"))
      val raw = Similarity.cosine(col("e"), col("__t"))
      val want = e.filter(col("vec_id") =!= probe).crossJoin(broadcast(t))
        .select(col("vec_id"), round(raw, 4).as("score"), raw.as("__raw"))
        .orderBy(col("__raw").desc, col("vec_id")).limit(5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      rows.sortBy(_._4).map(r => (r._2, r._3)) should contain theSameElementsInOrderAs want
    }
  }

  test("simhashNearDupPairs equals brute-force hamming pairs (pigeonhole is lossless)") {
    val d = Tables.documents(spark, sf0001)
    val banded = Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    val codes = Dedup.simhashCodes(d, "doc_id", "text")
      .select(col("doc_id"), col("__code").as("sh"))
    val brute = codes.alias("a").join(codes.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    banded should contain theSameElementsInOrderAs brute
    withClue("planted near-dups should collide at hamming<=3: ") {
      banded.length should be > 0
    }
  }

  test("portableSimhashNearDupPairs equals brute-force hamming pairs on portable codes") {
    val d = Tables.documents(spark, sf0001)
    val banded = Dedup.portableSimhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    val codes = Dedup.portableSimhashCodes(d, "doc_id", "text")
      .select(col("doc_id"), col("__code").as("sh"))
    val brute = codes.alias("a").join(codes.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    banded should contain theSameElementsInOrderAs brute
    withClue("planted near-dups should collide at hamming<=3: ") {
      banded.length should be > 0
    }
  }

  test("embeddingNearDupPairs equals brute force under the same code filter") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val banded = Dedup.embeddingNearDupPairs(emb, "vec_id", "e", planes, 2, 0.3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val codes = emb.select(col("vec_id"), col("e"),
      Similarity.signCode(col("e"), planes).as("c"))
    val brute = codes.alias("a").join(codes.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(bit_count(col("a.c").bitwiseXOR(col("b.c"))) <= 2)
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cs"))
      .filter(col("cs") >= 0.3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    banded should contain theSameElementsInOrderAs brute
    banded.length should be > 0
  }

  test("embeddingNearDupTopK: hierarchical per-bucket cap equals the " +
    "brute-force global per-doc top-k; output bounded by N*k") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val k = 3 // explicit small k forces real capping at sf0.001
    val capped = Dedup.embeddingNearDupTopK(emb, "vec_id", "e", planes,
        codeRadius = 2, threshold = 0.3, k = k)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // brute-force reference: directed qualifying pairs under the same
    // code filter, ranked globally per doc on the same 4-dp grid
    val codes = emb.select(col("vec_id"), col("e"),
      Similarity.signCode(col("e"), planes).as("c"))
    val directed = codes.alias("a")
      .join(codes.alias("b"), col("a.vec_id") =!= col("b.vec_id"))
      .filter(bit_count(col("a.c").bitwiseXOR(col("b.c"))) <= 2)
      .select(col("a.vec_id").as("doc_id"), col("b.vec_id").as("neighbor_id"),
        round(Similarity.cosine(col("a.e"), col("b.e")), 4).as("cosine"))
      .filter(col("cosine") >= 0.3)
    val brute = Relational.topKPerGroup(directed, Seq("doc_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k,
        rankCol = Some("rank"))
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    capped should contain theSameElementsInOrderAs brute
    capped.length should be > 0
    capped.groupBy(_._1).values.foreach(_.length should be <= k)
    // derived default: k = ceil(log2 N), so output stays <= N*k
    val derived = Dedup.embeddingNearDupTopK(emb, "vec_id", "e", planes,
      codeRadius = 2, threshold = 0.3)
    val n = emb.count()
    val kDer = 64 - java.lang.Long.numberOfLeadingZeros(math.max(2L, n) - 1L)
    derived.count() should be <= n * kDer
  }

  test("embeddingNearDupAgainstIndexTopK equals the threshold serving " +
    "gear re-ranked per arriving doc; output bounded by batch*k") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val hist = emb.filter(col("vec_id") % 10 =!= 0)
    val arriving = emb.filter(col("vec_id") % 10 === 0)
    val index = Dedup.embeddingCodeRows(hist, "vec_id", "e", planes)
      .localCheckpoint()
    val k = 3
    val bounded = Dedup.embeddingNearDupAgainstIndexTopK(arriving,
        "vec_id", "e", index, planes, codeRadius = 2, threshold = 0.3,
        k = k)
      .orderBy("d1", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val reference = Relational.topKPerGroup(
        Dedup.embeddingNearDupAgainstIndex(arriving, "vec_id", "e",
          index, planes, codeRadius = 2, threshold = 0.3),
        Seq("d1"), Seq(col("cosine").desc, col("d2").asc), k,
        rankCol = Some("rank"))
      .orderBy("d1", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    bounded should contain theSameElementsInOrderAs reference
    bounded.length should be > 0
    bounded.groupBy(_._1).values.foreach(_.length should be <= k)
  }

  test("lshTopK returns the exact top-k of its deterministic candidate set") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val got = Similarity.lshTopK(emb, "vec_id", "e", 2L, 5, planes, radius = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // brute force restricted to the same candidate set
    val codes = emb.withColumn("c", Similarity.signCode(col("e"), planes))
    val tgt = codes.filter(col("vec_id") === 2L)
      .select(col("e").as("te"), col("c").as("tc"))
    val want = codes.filter(col("vec_id") =!= 2L)
      .crossJoin(broadcast(tgt))
      .filter(bit_count(col("c").bitwiseXOR(col("tc"))) <= 2)
      .select(col("vec_id"), round(Similarity.cosine(col("e"), col("te")), 4).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got should contain theSameElementsInOrderAs want
    got.length shouldBe 5
  }

  test("ivfTopK with all cells probed equals brute force; fewer probes is a subset") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val nCells = emb.filter(col("vec_id") % 37 === 0).count().toInt
    nCells should be > 2
    // probing every cell makes the candidate set = everything ⇒ exact
    val all = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L, k = 10,
        centroidStride = 37L, nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Similarity.cosineTopK(emb, "vec_id", "e", 3L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    all should contain theSameElementsInOrderAs brute
    // a partial probe returns the exact top-k of a candidate subset:
    // every returned (id, score) must appear in the brute-force FULL
    // scoring with the same score, in consistent order
    val partial = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L, k = 10,
        centroidStride = 37L, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val fullScores = Similarity.cosineTopK(emb, "vec_id", "e", 3L, k = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    partial.foreach { case (id, s) => fullScores(id) shouldBe s }
    partial.map(_._2).toSeq shouldBe partial.map(_._2).toSeq.sorted.reverse
  }

  test("omitting centroidStride derives sqrtStride: the obvious call " +
    "inherits the scale-safe C ~ sqrt(N) gear, not a pin") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val derived = Similarity.sqrtStride(emb)
    derived should be > 1L
    val defaulted = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L,
        k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val explicit = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L,
        k = 10, centroidStride = derived, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    defaulted should contain theSameElementsInOrderAs explicit
    // the other three default-deriving entry points agree with their
    // explicit-sqrtStride calls too (kmeans seeds / PQ codebook rows)
    val kmDef = Similarity.kmeansCentroids(emb, "vec_id", "e",
        iters = 1, dim = 64).collect().map(_.getLong(0)).sorted
    val kmExp = Similarity.kmeansCentroids(emb, "vec_id", "e",
        centroidStride = derived, iters = 1, dim = 64)
      .collect().map(_.getLong(0)).sorted
    kmDef shouldBe kmExp
    val pqDef = Similarity.pqTrain(emb, "vec_id", "e", m = 4, dim = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val pqExp = Similarity.pqTrain(emb, "vec_id", "e", m = 4, dim = 64,
        centroidStride = derived, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    pqDef shouldBe pqExp
    // an explicit nonsense stride still fails loudly
    an[IllegalArgumentException] should be thrownBy
      Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L, k = 10,
        centroidStride = 0L, nprobe = 8)
  }

  test("knownN skips the derived-parameter corpus scan: fewer jobs, " +
    "identical results (sqrtStride and the near-dup top-k cap)") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val n = emb.count()
    var gotDerived: Seq[(Long, Double)] = Nil
    var gotKnown: Seq[(Long, Double)] = Nil
    val jobsDerived = countJobs("ivf-derived-n") {
      gotDerived = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L,
        k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val jobsKnown = countJobs("ivf-known-n") {
      gotKnown = Similarity.ivfTopK(emb, "vec_id", "e", targetId = 3L,
          k = 10, knownN = n)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    gotKnown should contain theSameElementsInOrderAs gotDerived
    jobsKnown should be < jobsDerived
    // the bounded near-dup top-k's ceil(log2 N) derivation too
    val planes = Similarity.hyperplanes(8, 64, 42L)
    var tkDerived = -1L
    var tkKnown = -1L
    val jD = countJobs("topk-derived-n") {
      tkDerived = Dedup.embeddingNearDupTopK(emb, "vec_id", "e", planes,
        codeRadius = 2, threshold = 0.3).count()
    }
    val jK = countJobs("topk-known-n") {
      tkKnown = Dedup.embeddingNearDupTopK(emb, "vec_id", "e", planes,
        codeRadius = 2, threshold = 0.3, knownN = n).count()
    }
    tkKnown shouldBe tkDerived
    jK should be < jD
  }

  test("width guards: a ragged corpus fails signCode entry points " +
    "(lshTopK, embedding near-dup) and knnJoin loudly") {
    val ss = spark
    import ss.implicits._
    def messageOf(t: Throwable): String = {
      var c = t
      while (c.getCause != null && !String.valueOf(c.getMessage)
        .matches("(?s).*(signCode|knnJoin).*")) c = c.getCause
      String.valueOf(c.getMessage)
    }
    val planes = Similarity.hyperplanes(8, 4, 42L)
    // one 3-wide row in a 4-wide corpus: the mixed-encoder case
    val ragged = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "e")
      .union(Seq((3L, Array(1.0, 0.0, 0.0))).toDF("vec_id", "e"))
    val lshEx = intercept[Exception] {
      Similarity.lshTopK(ragged, "vec_id", "e", targetId = 0L, k = 2,
        planes = planes, radius = 4).collect()
    }
    messageOf(lshEx) should include("signCode")
    val ndEx = intercept[Exception] {
      Dedup.embeddingNearDupPairs(ragged, "vec_id", "e", planes,
        codeRadius = 4, threshold = -1.0).collect()
    }
    messageOf(ndEx) should include("signCode")
    val knnEx = intercept[Exception] {
      Similarity.knnJoin(ragged, ragged.filter(col("vec_id") === 0L),
        "vec_id", "e", k = 2).collect()
    }
    messageOf(knnEx) should include("knnJoin")
    // clean corpora are untouched by the guards
    val clean = ragged.filter(col("vec_id") < 3L)
    Similarity.lshTopK(clean, "vec_id", "e", targetId = 0L, k = 2,
      planes = planes, radius = 8).count() shouldBe 2L
    Similarity.knnJoin(clean, clean.filter(col("vec_id") === 0L),
      "vec_id", "e", k = 2).count() shouldBe 2L
  }

  test("boundedExactKnn equals brute-force cosine top-k at sf0.001") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    for (target <- Seq(0L, 1L, 7L)) {
      val pruned = Similarity.boundedExactKnn(emb, "vec_id", "e", target, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val brute = Similarity.cosineTopK(emb, "vec_id", "e", target, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      withClue(s"target=$target: ") {
        pruned should contain theSameElementsInOrderAs brute
        pruned.length shouldBe 10
      }
    }
  }

  test("boundedExactKnn tolerates a missing target id deterministically") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    // id far outside the table: the MIN-reduced target is a null vector;
    // scores are null, output must still be well-defined (empty after
    // null-safe ordering drops nothing — rows with null scores remain,
    // matching the brute-force behavior).
    val pruned = Similarity.boundedExactKnn(emb, "vec_id", "e", 999999L, k = 5)
      .collect()
    val brute = Similarity.cosineTopK(emb, "vec_id", "e", 999999L, k = 5)
      .collect()
    pruned.length shouldBe brute.length
  }

  test("ivfKnnJoin with nprobe covering every cell equals the exact knnJoin") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val probes = emb.filter(col("vec_id") < 4)
    // probing ALL cells makes the candidate set the whole corpus, so
    // the pruned join must reproduce the exhaustive one bit-for-bit
    val pruned = Similarity.ivfKnnJoin(emb, probes, "vec_id", "e",
        centroidStride = 11L, k = 3, nprobe = 1000)
      .orderBy("probe_id", "rank").collect()
    val exact = Similarity.knnJoin(emb, probes, "vec_id", "e", k = 3)
      .orderBy("probe_id", "rank").collect()
    pruned shouldBe exact
  }

  test("kmeansCentroids: Lloyd rounds are deterministic, integer-grid, and improve the quantizer") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansCentroids(df, "vec_id", "e",
        centroidStride = 11L, iters = 2, dim = 64)
    val cents = run(emb).orderBy("__cid").collect()
    // partition-layout independence: same result from a reshuffled input
    // (the argmin fold is order-independent, sums are integer-exact)
    run(emb.repartition(7, col("vec_id"))).orderBy("__cid").collect() shouldBe cents
    // every refined component sits on the integer grid
    cents.foreach(_.getSeq[Double](1).foreach(x => x shouldBe math.rint(x)))
    // the member counts cover the corpus exactly once
    cents.map(_.getLong(2)).sum shouldBe emb.count()
    // refinement does not worsen the quantizer: total within-cell d2
    // after 2 rounds <= after the 0-round (stride-sample) assignment
    def cost(cent: Array[org.apache.spark.sql.Row]): Double = {
      val q = emb.select(col("vec_id"),
        Similarity.quantize(col("e")).as("q")).collect()
      q.map { r =>
        val v = r.getSeq[Double](1)
        cent.map { c =>
          val cv = c.getSeq[Double](1)
          v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }.sum
    }
    val init = emb.filter(pmod(col("vec_id"), lit(11L)) === 0)
      .select(col("vec_id"), Similarity.quantize(col("e")).as("cv"), lit(0L).as("n"))
      .orderBy("vec_id").collect()
    cost(cents) should be <= cost(init)
  }

  test("survivorsAgainstHistory = batch-canonical rows whose text is absent from history") {
    val ss = spark
    import ss.implicits._
    val d = Tables.documents(spark, sf0001)
    val hist = d.filter(col("doc_id") % 3 === 0)
    val batch = d.filter(col("doc_id") % 3 =!= 0)
    val got = Dedup.survivorsAgainstHistory(batch, "doc_id", "text",
        Dedup.fingerprints(hist, "text"))
      .as[Long].collect().sorted

    // reference on normalized text, plain Scala
    def norm(r: org.apache.spark.sql.Row) = r.getString(1).trim.toLowerCase
    val histKeys = hist.select("doc_id", "text").collect().map(norm).toSet
    val batchRows = batch.select("doc_id", "text").collect()
    val want = batchRows.groupBy(norm)
      .collect { case (k, g) if !histKeys(k) => g.map(_.getLong(0)).min }
      .toArray.sorted
    got should contain theSameElementsInOrderAs want
    got.length should be > 0
    // dup of a history doc must not survive, batch-only dups collapse to min id
    val histSet = histKeys
    batchRows.filter(r => histSet(norm(r))).map(_.getLong(0))
      .intersect(got) shouldBe empty
  }

  test("activityProfiles builds gap-filled decimal-exact bucket vectors") {
    val ss = spark
    import ss.implicits._
    val ev = Seq(
      (7L, java.sql.Timestamp.valueOf("2024-01-01 03:15:00"), 1.5),
      (7L, java.sql.Timestamp.valueOf("2024-01-02 03:45:00"), 2.25), // same hour, other day
      (7L, java.sql.Timestamp.valueOf("2024-01-01 23:00:00"), 4.0),
      (8L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.5)
    ).toDF("user_id", "ts", "value")
    val got = Similarity.activityProfiles(ev, "user_id", "ts", "value")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    got.length shouldBe 2
    val v7 = Array.fill(24)(0.0); v7(3) = 3.75; v7(23) = 4.0
    val v8 = Array.fill(24)(0.0); v8(0) = 0.5
    got(0) shouldBe ((7L, v7.toSeq))
    got(1) shouldBe ((8L, v8.toSeq))
  }

  test("semanticDedup: in-cell duplicates drop to the min id; cross-cell twins survive") {
    val ss = spark
    import ss.implicits._
    // two well-separated directions => two cells under centroids at
    // ids 0 and 10; ids 0,1 duplicate each other (cos = 1), id 2 is
    // orthogonal-ish in the same cell, ids 10,11 duplicate in cell 2
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(2.0, 0.0, 0.0, 0.0)),   // same direction as 0 => dropped
      (2L, Seq(1.0, 1.2, 0.0, 0.0)),   // same cell as 0/1, cos ~0.64 => kept
      (10L, Seq(0.0, 0.0, 1.0, 0.0)),
      (11L, Seq(0.0, 0.0, 3.0, 0.0))   // same direction as 10 => dropped
    ).toDF("vec_id", "e")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "e",
        centroidStride = 10L, iters = 1, dim = 4)
      .select(col("__cid"), col("__cv"))
    val out = Dedup.semanticDedup(emb, "vec_id", "e", cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    out shouldBe Map(0L -> true, 1L -> false, 2L -> true,
      10L -> true, 11L -> false)
  }

  test("embeddingQa: zero / NaN / wrong-dim vectors flag; clean ones pass") {
    val ss = spark
    import ss.implicits._
    val emb = Seq(
      (1L, Seq(0.6, 0.8)),          // clean, norm2 = 1.0
      (2L, Seq(0.0, 0.0)),          // zero vector
      (3L, Seq(Double.NaN, 1.0)),   // NaN component
      (4L, Seq(1.0, 2.0, 2.0))      // wrong dimensionality
    ).toDF("vec_id", "e")
    val out = Similarity.embeddingQa(emb, "vec_id", "e", expectDims = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_dims"), r.getAs[Long]("n_bad"),
          r.getAs[Boolean]("is_zero"), r.getAs[Boolean]("is_clean")))).toMap
    out(1L) shouldBe ((2L, 0L, false, true))
    out(2L) shouldBe ((2L, 0L, true, false))
    out(3L) shouldBe ((2L, 1L, false, false))
    out(4L) shouldBe ((3L, 0L, false, false))
  }

  test("corpusDiff: added/removed/changed/unchanged; compare is normalized") {
    val ss = spark
    import ss.implicits._
    val oldSnap = Seq((1L, "alpha", "s0"), (2L, "beta", "s0"), (3L, "gamma", "s1"))
      .toDF("doc_id", "text", "source")
    val newSnap = Seq((2L, "beta revised", "s0"), (3L, "  GAMMA ", "s1"),
      (4L, "delta", "s1")).toDF("doc_id", "text", "source")
    val out = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text",
        keep = Seq("source"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("source"), r.getAs[String]("status")))).toMap
    out(1L) shouldBe (("s0", "removed"))
    out(2L) shouldBe (("s0", "changed"))
    out(3L) shouldBe (("s1", "unchanged")) // case/whitespace normalize
    out(4L) shouldBe (("s1", "added"))
    out.size shouldBe 4
  }

  test("hardNegatives: cluster mates are excluded, nearest non-mates rank first") {
    val ss = spark
    import ss.implicits._
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),   // probe
      (1L, Seq(2.0, 0.0, 0.0, 0.0)),   // exact-direction dup of 0 (cos 1)
      (2L, Seq(1.0, 0.3, 0.0, 0.0)),   // near (cos ~0.96) but NOT clustered
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // orthogonal
      (4L, Seq(1.0, 0.1, 0.0, 0.0))    // clustered with 0 via the pair list
    ).toDF("vec_id", "e")
    val clusters = Seq((0L, 0L), (1L, 0L), (4L, 0L)).toDF("id", "cluster_id")
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "e", clusters, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
    // 1 and 4 are cluster mates of the probe: never negatives
    out.map(_._1) shouldBe Array(2L, 3L)
    out(0)._2 shouldBe 0.9578 // 1 / sqrt(1.09) rounded 4
    out(1)._2 shouldBe 0.0
    // sanity: without the exclusion, the dup would top the list (the
    // false negative the operator exists to prevent)
    val naive = Similarity.knnJoin(emb, emb.filter(col("vec_id") === 0L),
      "vec_id", "e", k = 1).head()
    naive.getAs[Long]("neighbor_id") shouldBe 1L
  }

  test("hardNegatives: IVF gear with nprobe = all cells equals the " +
    "exhaustive path; tight nprobe prunes candidates") {
    val ss = spark
    import ss.implicits._
    // 12 vectors in two well-separated directions; stride-3 centroids
    // (ids 0, 3, 6, 9) give 2+ populated cells on each axis.
    val emb = (0L to 11L).map { i =>
      val axis = if (i % 2 == 0) Seq(1.0, 0.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0, 0.0)
      (i, axis.map(_ * (1.0 + 0.05 * i)))
    }.toDF("vec_id", "e")
    val clusters = Seq((0L, 0L), (2L, 0L)).toDF("id", "cluster_id")
    val probes = emb.filter(col("vec_id") === 0L)
    val brute = Similarity.hardNegatives(emb, probes, "vec_id", "e",
      clusters, k = 4)
    // nprobe = 4 covers every stride-3 centroid -> recall 1: identical
    // rows to the exhaustive gear, pruning is invisible.
    val full = Similarity.hardNegatives(emb, probes, "vec_id", "e",
      clusters, k = 4, centroidStride = 3L, nprobe = 4)
    full.collect().toSeq shouldBe brute.collect().toSeq
    // nprobe = 1 keeps only the probe's own cell: candidates shrink to
    // cell mates, cluster mates still excluded, nothing cross-axis.
    val pruned = Similarity.hardNegatives(emb, probes, "vec_id", "e",
        clusters, k = 10, centroidStride = 3L, nprobe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(!pruned.contains(2L)) // cluster mate: excluded in any gear
    val all = Similarity.hardNegatives(emb, probes, "vec_id", "e",
        clusters, k = 10).collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(pruned.subsetOf(all) && pruned.size < all.size)
  }

  test("subsetDocPairs: finds true containment at tiny Jaccard, " +
    "orients exact-dup ties by id, ignores partial overlap") {
    val ss = spark
    import ss.implicits._
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),            // 2 shingles
      (2L, s"$filler alpha beta gamma delta"),   // contains doc 1; J tiny
      (3L, "alpha beta gamma epsilon"),          // shares 1 of doc 1's 2
      (4L, "alpha beta gamma delta"),            // exact dup of doc 1
      (5L, "zeta eta theta iota kappa")          // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.subsetDocPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // containment pairs: 1⊆2, 4⊆2, and the 1==4 tie oriented 1<4
    assert(out.keySet == Set((1L, 2L), (4L, 2L), (1L, 4L)))
    assert(out((1L, 2L)) == ((2L, 42L))) // 44 words -> 42 shingles
    assert(out((1L, 4L)) == ((2L, 2L)))
  }

  test("coresetSelect: farthest-point order, radii, min-id tie-break") {
    val ss = spark
    import ss.implicits._
    // 1-D grid points v/1024 quantize exactly to v: ids 1..4 at
    // v = 0, 10, 3, 7. Seed = min id (v=0); round 2 picks v=10
    // (d2=100); round 3 ties v=3 (min(9,49)=9) with v=7 (min(49,9)=9)
    // -> the smaller id (3) wins; round 4 takes v=7 at radius 9.
    val e = Seq((1L, 0L), (2L, 10L), (3L, 3L), (4L, 7L))
      .map { case (id, v) => (id, Array(v.toDouble / 1024.0)) }
      .toDF("vec_id", "embedding")
    val out = Similarity.coresetSelect(e, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("radius")))))
      .toMap
    assert(out(1) == ((1L, None)))
    assert(out(2) == ((2L, Some(100.0))))
    assert(out(3) == ((3L, Some(9.0))))
    assert(out(4) == ((4L, Some(9.0))))
  }

  test("prefixJaccardAgainstIndex: borderline pair under the frozen order; novel doc matches nothing; == full join cross-split") {
    val ss = spark
    import ss.implicits._
    val hist = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "a b c d e f"),  // exact duplicate of history
      (20L, "a b c d e g"),  // borderline J = 3/5 vs history
      (30L, "p q r s t u")   // all shingles unseen: df-0 prefixes
    ).toDF("doc_id", "text")
    val index = Dedup.shingleHashRows(hist, "doc_id", "text", 3)
    val out = Dedup.prefixJaccardAgainstIndex(incoming, "doc_id", "text",
        index, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map((10L, 1L) -> 1.0, (20L, 1L) -> 0.6))

    // equals the full pairwise join restricted to cross-split pairs
    val d = Tables.documents(spark, sf0001)
    val idx = Dedup.shingleHashRows(
      d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 3)
    val inc = Dedup.prefixJaccardAgainstIndex(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", idx, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val full = Dedup.prefixFilterJaccardJoin(d, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
      .map(p => if (p._1 % 10 == 0) p else (p._2, p._1, p._3)).toSet
    assert(inc == full)
  }

  test("qualityCanonical: highest score wins, score ties to the min id") {
    val ss = spark
    import ss.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val scored = Seq((1L, 10L), (2L, 50L), (3L, 50L), (4L, -5L),
      (5L, -9L)).toDF("doc_id", "score")
    val out = Dedup.qualityCanonical(clusters, "id", "cluster_id",
        scored, "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 2L, 50L))) // 2 and 3 tie at 50 -> min id
    assert(out(4L) == ((2L, 4L, -5L))) // negatives order correctly
  }

  test("qualityCanonical: fractional scores distinguish, string ids " +
    "work, non-numeric score rejected") {
    val ss = spark
    import ss.implicits._
    val clusters = Seq(("a", "a"), ("b", "a")).toDF("id", "cluster_id")
    // a long cast would truncate both to 1 and tie-break to "a"
    val scored = Seq(("a", 1.2), ("b", 1.7)).toDF("doc_id", "score")
    val out = Dedup.qualityCanonical(clusters, "id", "cluster_id",
        scored, "doc_id", "score").head()
    assert(out.getString(0) == "a" && out.getLong(1) == 2L &&
      out.getString(2) == "b" && out.getDouble(3) == 1.7)
    val bad = Seq(("a", "hi"), ("b", "lo")).toDF("doc_id", "score")
    intercept[IllegalArgumentException] {
      Dedup.qualityCanonical(clusters, "id", "cluster_id",
        bad, "doc_id", "score")
    }
  }

  test("qualityCanonical: NULL-score members never win the keeper " +
    "pick and do not count toward n_members") {
    val ss = spark
    import ss.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("id", "cluster_id")
    // struct ordering sorts nulls smallest: an unfiltered
    // min(struct(-score, id)) would crown id=3 (score NULL)
    val scored = Seq((1L, Some(10L)), (2L, Some(50L)), (3L, None))
      .toDF("doc_id", "score")
    val out = Dedup.qualityCanonical(clusters, "id", "cluster_id",
      scored, "doc_id", "score").head()
    assert(out.getLong(0) == 1L && out.getLong(1) == 2L &&
      out.getLong(2) == 2L && out.getLong(3) == 50L)
    // all-null cluster: no scored member -> cluster absent entirely
    val allNull = Seq((1L, Option.empty[Long])).toDF("doc_id", "score")
    assert(Dedup.qualityCanonical(
      Seq((1L, 1L)).toDF("id", "cluster_id"), "id", "cluster_id",
      allNull, "doc_id", "score").isEmpty)
  }

  test("containmentJoin: directed asymmetric gate, exact borderline, " +
    "unrelated excluded") {
    val ss = spark
    import ss.implicits._
    // A's 3 shingles all inside B (C(A,B)=1); C(B,A)=3/5
    val docs = Seq(
      (1L, "a b c d e"),            // shingles {abc, bcd, cde}, n=3
      (2L, "a b c d e f g"),        // n=5, superset of 1's
      (3L, "x y z w v u t"))        // disjoint
      .toDF("doc_id", "text")
    val at70 = Dedup.containmentJoin(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(at70.keySet == Set((1L, 2L)))
    assert(at70((1L, 2L)) == ((3L, 3L, 1.0)))
    // t = 3/5: the reverse direction sits EXACTLY on the boundary
    val at60 = Dedup.containmentJoin(docs, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    assert(at60.keySet == Set((1L, 2L), (2L, 1L)))
    assert(at60((2L, 1L)) == 0.6)
  }

  test("containmentAgainstIndex: both directions over the index, " +
    "novel doc matches nothing, == full join cross-split") {
    val ss = spark
    import ss.implicits._
    // history holds both a container and a containee of the batch
    val hist = Seq(
      (1L, "a b c d e f g"),        // superset side, n=5
      (2L, "a b c d e"))            // n=3, contained in batch doc 10
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "a b c d e f g h"),     // n=6: hist 1 (5/5) and 2 (3/3) ⊂ it
      (20L, "a b c d e"),           // n=3 ⊂ hist 1 and == hist 2
      (30L, "p q r s t u"))         // all shingles unseen
      .toDF("doc_id", "text")
    val index = Dedup.shingleHashRows(hist, "doc_id", "text", 3)
    val out = Dedup.containmentAgainstIndex(incoming, "doc_id", "text",
        index, 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // directed, cross-split only: batch⊂hist AND hist⊂batch pairs,
    // never hist–hist (1,2)/(2,1) or batch–batch (10,20)/(20,10)
    assert(out == Map(
      (1L, 10L) -> ((5L, 5L, 1.0)), (2L, 10L) -> ((3L, 3L, 1.0)),
      (2L, 20L) -> ((3L, 3L, 1.0)), (20L, 1L) -> ((3L, 3L, 1.0)),
      (20L, 2L) -> ((3L, 3L, 1.0)),
      (10L, 1L) -> ((6L, 5L, 0.833333))))

    // equals the full containment join restricted to cross-split pairs
    val d = Tables.documents(spark, sf0001)
    val idx = Dedup.shingleHashRows(
      d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 3)
    val inc = Dedup.containmentAgainstIndex(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", idx, 7, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val full = Dedup.containmentJoin(d, "doc_id", "text", 7, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0)).toSet
    assert(inc == full)
  }

  test("effectiveDim: collapsed axis PR=1, isotropic pair PR=2") {
    val ss = spark
    import ss.implicits._
    val collapsed = Seq(Array(1.0, 0.0), Array(-1.0, 0.0),
      Array(2.0, 0.0), Array(-2.0, 0.0)).toDF("embedding")
    val c = Similarity.effectiveDim(collapsed, "embedding", dims = 2).head()
    // dim1 var = 10*1024^2/4 = 2621440, dim2 = 0
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3),
      c.getLong(4), c.getDouble(5)) ==
      ((2L, 4L, 2621440L, 2621440L, 1000000L, 1.0)))
    val iso = Seq(Array(1.0, 0.0), Array(0.0, 1.0),
      Array(-1.0, 0.0), Array(0.0, -1.0)).toDF("embedding")
    val i = Similarity.effectiveDim(iso, "embedding", dims = 2).head()
    assert((i.getLong(2), i.getLong(4), i.getDouble(5)) ==
      ((2L * 524288L, 500000L, 2.0)))
  }

  test("centroidMatrix: orthogonal groups 0, diagonal 1/sqrt(2), " +
    "n counts") {
    val ss = spark
    import ss.implicits._
    val emb = Seq((1, Array(1.0, 0.0)), (1, Array(1.0, 0.0)),
      (2, Array(0.0, 1.0)), (3, Array(1.0, 1.0)))
      .toDF("label", "embedding")
    val out = Similarity.centroidMatrix(emb, "label", "embedding", dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out((1, 2)) == ((2L, 1L, Some(0.0))))
    val c13 = out((1, 3))
    assert(c13._1 == 2L && c13._2 == 1L &&
      math.abs(c13._3.get - 0.707107) < 1e-6)
    assert(math.abs(out((2, 3))._3.get - 0.707107) < 1e-6)
  }

  test("topComponent: exact 2-D eigenpair on a centered rank-1 cloud") {
    val ss = spark
    import ss.implicits._
    // raw (1,2) and (-1,-2) quantize to (±1024, ±2048): mean 0, all
    // variance along u = (1,2)/sqrt(5); eigval = (5120/sqrt(5))^2
    val emb = Seq(Array(1.0, 2.0), Array(-1.0, -2.0)).toDF("embedding")
    val out = Similarity.topComponent(emb, "embedding", dims = 2, iters = 5)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val d1 = out(1); val d2 = out(2)
    assert(d1._1 == 2L && d1._2 == 0.0 && d1._3 == 1048576.0)
    assert(d2._2 == 0.0 && d2._3 == 4194304.0)
    assert(math.abs(d1._4 - 1.0 / math.sqrt(5)) < 1e-9)
    assert(math.abs(d2._4 - 2.0 / math.sqrt(5)) < 1e-9)
    assert(math.abs(d1._5 - 5242880.0) < 0.01)
    assert(d1._5 == d2._5)
  }

  test("prefixFilterJaccardJoin: hand Jaccards incl. the borderline J = 3/5 boundary") {
    val ss = spark
    import ss.implicits._
    // 6-word docs -> 4 distinct 3-shingles each; docs 1/2 share 3 of 5
    // distinct shingles (J = 3/5, exactly AT the threshold — the
    // no-false-negative property the MinHash S-curve can't promise);
    // doc 3 duplicates doc 1 (J = 1); doc 4 is disjoint.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),
      (3L, "a b c d e f"),
      (4L, "p q r s t u")
    ).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJaccardJoin(docs, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 3L)) == 1.0)
    assert(out((1L, 2L)) == 0.6)
    assert(out((2L, 3L)) == 0.6)
  }

  test("prefixFilterJaccardJoin equals the brute-force exact Jaccard join on sf0.001") {
    val d = Tables.documents(spark, sf0001)
    val pp = Dedup.prefixFilterJaccardJoin(d, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: every pair sharing >= 1 shingle, exact Jaccard
    val sh = Dedup.shingleHashRows(d, "doc_id", "text", 3)
    val n = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    val brute = sh.alias("a")
      .join(sh.alias("b"),
        col("a.__sh") === col("b.__sh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("d1"), col("b.__id").as("d2"))
      .agg(count(lit(1)).as("__i"))
      .join(n.select(col("__id").as("d1"), col("__n").as("__n1")), "d1")
      .join(n.select(col("__id").as("d2"), col("__n").as("__n2")), "d2")
      .select(col("d1"), col("d2"),
        (col("__i").cast("double") /
          (col("__n1") + col("__n2") - col("__i"))).as("j"))
      .filter(col("j") >= 3.0 / 5)
      .select(col("d1"), col("d2"), round(col("j"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp == brute)
    assert(pp.nonEmpty)
  }

  test("randomProject + jlDistanceAudit: exact hand signs and the " +
    "single-coordinate exact-preservation pair") {
    val ss = spark
    import ss.implicits._
    // sign(i, j) from (j*2654435761 + i*40503) mod 1e9+7 parity:
    //   i=0: j=1 -> 654435747 odd -> -1; j=2 -> 308871487 odd -> -1
    //   i=1: j=1 -> 654476250 even -> +1; j=2 -> 308911990 even -> +1
    val emb = Seq((1L, Seq(0.5, 0.25)), (2L, Seq(0.0, 0.25)))
      .toDF("id", "v")
    val proj = Similarity.randomProject(emb, "id", "v", inDims = 2, outDims = 2)
      .collect().map(r => r.getAs[Long]("__id") ->
        r.getAs[Seq[Double]]("__p")).toMap
    proj(1L) shouldBe Seq(-768.0, 768.0)  // q = [512, 256]
    proj(2L) shouldBe Seq(-256.0, 256.0)  // q = [0, 256]
    // diff vector [512, 0]: d2_orig = 262144; projected diff
    // [-512, 512]: d2_proj = 524288 = k * d2_orig EXACTLY
    val audit = Similarity.jlDistanceAudit(emb, "id", "v", inDims = 2, outDims = 2,
      pairs = Seq((1L, 2L), (1L, 1L))).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("d2_orig"), r.getAs[Long]("d2_proj"),
          Option(r.getAs[java.lang.Long]("ratio_ppm"))))).toMap
    audit((1L, 2L)) shouldBe ((262144L, 524288L, Some(1000000L)))
    audit((1L, 1L)) shouldBe ((0L, 0L, None))
  }

  test("randomProject drops wrong-width vectors instead of emitting " +
    "silent NULL coordinates (mixed encoder versions)") {
    val ss = spark
    import ss.implicits._
    // id 3 is 3-dim in a declared-2-dim corpus: element_at(.., 2) past
    // its end would otherwise yield NULL projected coords (ADVICE r13)
    val emb = Seq((1L, Seq(0.5, 0.25)), (2L, Seq(0.0, 0.25)),
      (3L, Seq(0.5, 0.25, 0.125))).toDF("id", "v")
    val proj = Similarity.randomProject(emb, "id", "v", inDims = 2, outDims = 2)
      .collect().map(_.getAs[Long]("__id")).toSet
    proj shouldBe Set(1L, 2L)
    // and the audit over a pair touching the dropped vector emits no row
    Similarity.jlDistanceAudit(emb, "id", "v", inDims = 2, outDims = 2,
      pairs = Seq((1L, 3L))).count() shouldBe 0L
  }
}
