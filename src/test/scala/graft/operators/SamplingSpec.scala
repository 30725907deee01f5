package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.Tables

/** Deterministic sampling: reproducible selection, correct rates,
  * exact quotas, whole-strata survival below quota. */
class SamplingSpec extends SparkTestBase with Matchers {

  test("hashSample is reproducible and rate-accurate") {
    val d = Tables.documents(spark, sf0001)
    val a = Sampling.hashSample(d, "doc_id", 300).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(d, "doc_id", 300).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    a should contain theSameElementsInOrderAs b
    // multiplicative hashing: rate lands near the target on any id set
    val rate = a.length.toDouble / d.count()
    rate should be(0.3 +- 0.06)
    // edge permilles
    Sampling.hashSample(d, "doc_id", 0).count() shouldBe 0
    Sampling.hashSample(d, "doc_id", 1000).count() shouldBe d.count()
  }

  test("stratifiedQuota keeps exactly min(quota, |stratum|) rows per stratum") {
    val d = Tables.documents(spark, sf0001)
    val perLang = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quota = 30
    val kept = Sampling.stratifiedQuota(d, Seq("lang"), "doc_id", quota)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.keySet shouldBe perLang.keySet
    for ((lang, n) <- perLang)
      kept(lang) shouldBe math.min(quota.toLong, n)
    // determinism: same subset both times
    val a = Sampling.stratifiedQuota(d, Seq("lang"), "doc_id", quota)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedQuota(d, Seq("lang"), "doc_id", quota)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    a should contain theSameElementsInOrderAs b
  }

  test("mixtureSample applies per-stratum rates and nests within higher rates") {
    val d = Tables.documents(spark, sf0001)
    val mixed = Sampling.mixtureSample(d, "lang", "doc_id",
      Map("en" -> 500, "de" -> 100), defaultPermille = 0)
    val langs = mixed.select("lang").distinct().collect().map(_.getString(0)).toSet
    langs shouldBe Set("en", "de")
    // nesting: the 100‰ German sample is a subset of the 500‰ one
    val de100 = Sampling.mixtureSample(d, "lang", "doc_id", Map("de" -> 100))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val de500 = Sampling.mixtureSample(d, "lang", "doc_id", Map("de" -> 500))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    de100.subsetOf(de500) shouldBe true
    de500.size should be > de100.size
  }

  test("tokenBudget two-phase cumsum equals the naive global-window prefix") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sf0001)
    val got = Sampling.tokenBudget(d, "doc_id", "n_chars", budget = 5000L)
      .select("doc_id", "__cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // naive single-partition global running sum — fine at test scale
    val w = Window.orderBy(Sampling.selector(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.withColumn("__cum", sum(col("n_chars")).over(w))
      .filter(col("__cum") <= 5000L)
      .select("doc_id", "__cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    got should contain theSameElementsInOrderAs want
    got.length should be > 0
    // the selection genuinely stops short of the whole corpus
    got.length.toLong should be < d.count()
    // budget 0 selects nothing; huge budget selects everything
    Sampling.tokenBudget(d, "doc_id", "n_chars", 0L).count() shouldBe 0
    Sampling.tokenBudget(d, "doc_id", "n_chars", Long.MaxValue / 4).count() shouldBe d.count()
  }

  test("mixtureUpsample: whole epochs + the nested fractional copy; ≤1000‰ = mixtureSample") {
    val d = Tables.documents(spark, sf0001)
    val srcCount = d.filter(col("source") === "src0").count()
    val up = Sampling.mixtureUpsample(d, "source", "doc_id",
      Map("src0" -> 2500, "src1" -> 700), defaultPermille = 0)
    // src0: every doc twice, plus the deterministic ~50% third copy
    val bySrc = up.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.keySet shouldBe Set("src0", "src1")
    bySrc("src0") should be >= 2 * srcCount
    bySrc("src0") should be < 3 * srcCount
    // the fractional third copy of src0 is EXACTLY the 500‰ hashSample subset
    val third = up.filter(col("source") === "src0" && col("copy") === 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = Sampling.hashSample(d.filter(col("source") === "src0"), "doc_id", 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    third shouldBe want
    // a rate ≤ 1000 degenerates to mixtureSample's subset, copy always 0
    val sub = Sampling.mixtureUpsample(d, "source", "doc_id", Map("src1" -> 700))
    sub.select("copy").distinct().collect().map(_.getLong(0)) shouldBe Array(0L)
    sub.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Sampling.mixtureSample(d, "source", "doc_id", Map("src1" -> 700))
        .select("doc_id").collect().map(_.getLong(0)).sorted
    // narrow: the explode adds no shuffle
    up.queryExecution.sparkPlan.toString should not include "Exchange"
  }

  test("packSequences tiles the seeded token stream exactly, no gaps or overlap") {
    val d = Tables.documents(spark, sf0001)
    val seqLen = 512L
    val packed = Sampling.packSequences(d, "doc_id", "n_chars", seqLen, seed = 7L)
    packed.count() shouldBe d.count() // every doc placed exactly once
    val rows = packed.select("doc_id", "n_chars", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay the stream in seeded order: each doc must start exactly
    // where the previous one ended (start = seq_id * seqLen + seq_off)
    val bySeededOrder = rows.sortBy { case (id, _, sid, off) => (sid, off, id) }
    var expectStart = 0L
    for ((_, w, sid, off) <- bySeededOrder) {
      sid * seqLen + off shouldBe expectStart
      expectStart += w
    }
    // the last doc starts at total - w_last: the layout is exactly dense
    val total = rows.map(_._2).sum
    rows.map(_._3).max shouldBe (total - bySeededOrder.last._2) / seqLen
    // reproducible; a new seed is a different layout of the same multiset
    val again = Sampling.packSequences(d, "doc_id", "n_chars", seqLen, seed = 7L)
      .select("doc_id", "seq_id", "seq_off").collect()
    again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted shouldBe
      rows.map(t => (t._1, t._3, t._4)).sorted
    val reseeded = Sampling.packSequences(d, "doc_id", "n_chars", seqLen, seed = 8L)
      .select("doc_id", "seq_id", "seq_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    reseeded should not be rows.map(t => (t._1, t._3, t._4)).sorted
  }

  test("hashSample pushes the selector filter below the scan (no shuffle)") {
    val d = Tables.documents(spark, sf0001)
    val sp = Sampling.hashSample(d, "doc_id", 300).queryExecution.sparkPlan
    sp.toString should not include "Exchange"
  }

  test("seededShuffle is a reproducible permutation; a new seed reorders") {
    val d = Tables.documents(spark, sf0001)
    val ids = d.select("doc_id").collect().map(_.getLong(0)).sorted
    val run1 = Sampling.seededShuffle(d, "doc_id", 7L)
      .select("doc_id").collect().map(_.getLong(0))
    // permutation: same multiset, nothing dropped or duplicated
    run1.sorted shouldBe ids
    // reproducible: a second evaluation yields the identical order
    val run2 = Sampling.seededShuffle(d, "doc_id", 7L)
      .select("doc_id").collect().map(_.getLong(0))
    run2 shouldBe run1
    // genuinely shuffled, and a new seed is a different permutation
    run1 should not be ids
    val other = Sampling.seededShuffle(d, "doc_id", 8L)
      .select("doc_id").collect().map(_.getLong(0))
    other.sorted shouldBe ids
    other should not be run1
  }

  test("quantileThresholdFilter keeps exactly the rows at or above the per-group quantile") {
    val ss = spark
    import ss.implicits._
    val d = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.length(col("text"))
          .cast("long").as("score"))
    val kept = Sampling.quantileThresholdFilter(d, Seq("lang"), "score", 0.5)
      .select("doc_id").as[Long].collect().sorted

    // reference: independent per-group interpolated median, plain Scala
    val rows = d.select("doc_id", "lang", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      val vs = g.map(_._3.toDouble).sorted
      val pos = 0.5 * (vs.length - 1)
      val (lo, hi) = (vs(pos.toInt), vs(math.ceil(pos).toInt))
      val thr = lo + (pos - pos.toInt) * (hi - lo)
      g.filter(_._3.toDouble >= thr).map(_._1).toSeq
    }.toArray.sorted
    kept should contain theSameElementsInOrderAs want
    kept.length should be > 0
    kept.length should be < rows.length
    // reproducible to the bit
    val again = Sampling.quantileThresholdFilter(d, Seq("lang"), "score", 0.5)
      .select("doc_id").as[Long].collect().sorted
    again shouldBe kept
  }

  test("clusterAwareSplit: cluster members land together; singletons draw on their own id") {
    val ss = spark
    import ss.implicits._
    val docs = (1L to 200L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    // clusters: {1..10} labeled 1, {50,51} labeled 50; rest singletons
    val clusters = ((1L to 10L).map(i => (i, 1L)) ++ Seq((50L, 50L), (51L, 50L)))
      .toDF("__member", "__label")
    val out = Sampling.clusterAwareSplit(docs, "doc_id", clusters,
        "__member", "__label", trainPermille = 700)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out.size shouldBe 200
    // every member of a cluster shares its representative's split
    (1L to 10L).map(out).distinct.length shouldBe 1
    Seq(50L, 51L).map(out).distinct.length shouldBe 1
    // singleton draws replay the portable selector on the own id
    val p = Dedup.PortableHashP
    (100L to 110L).foreach { id =>
      val want = if (Math.floorMod(id * 2654435761L, p) * 1000 < 700L * p)
        "train" else "holdout"
      out(id) shouldBe want
    }
    // both splits are populated at this rate
    out.values.toSet shouldBe Set("train", "holdout")
  }

  test("temperatureMixture: alpha sweeps from natural to uniform; exact integer plan") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("doc_id", "src")
    def plan(alpha: Double) =
      Sampling.temperatureMixture(docs, "src", "doc_id", alpha, totalTarget = 10L)
        .groupBy("src")
        .agg(max(col("stratum_target")).as("t"), max(col("rate_micro")).as("r"))
        .collect().map(x => x.getString(0) ->
          ((x.getAs[Long]("t"), x.getAs[Long]("r")))).toMap
    // alpha = 1: natural proportions — targets 8/2, both rates exactly 2x
    plan(1.0) shouldBe Map("a" -> ((8L, 2000000L)), "b" -> ((2L, 2000000L)))
    // alpha = 0: uniform weights — equal targets, the 1-doc stratum 5x's
    plan(0.0) shouldBe Map("a" -> ((5L, 1250000L)), "b" -> ((5L, 5000000L)))
    // alpha = 0.5: sqrt weights 2e6 / 1e6 -> targets 6 / 3
    plan(0.5) shouldBe Map("a" -> ((6L, 1500000L)), "b" -> ((3L, 3000000L)))
    // emitted rows replay: stratum b at rate 3.0 => doc 5 appears 3x
    val rows = Sampling.temperatureMixture(docs, "src", "doc_id", 0.5, 10L)
      .filter(col("src") === "b").collect()
    rows.map(_.getAs[Long]("copy")).sorted shouldBe Array(0L, 1L, 2L)
  }

  test("lengthBucketBatches: hand-checked buckets, longest-first batching, waste") {
    val ss = spark
    import ss.implicits._
    val lens = Seq((1L, 5L), (2L, 6L), (3L, 8L), (4L, 3L),
      (5L, 9L), (6L, 16L), (7L, 1L), (8L, 2L)).toDF("doc_id", "n_toks")
    val out = Sampling.lengthBucketBatches(lens, "doc_id", "n_toks",
        batchSize = 2, shards = 1)
      .collect().map(r => (r.getAs[Long]("bucket_cap"), r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("batch_len"),
          r.getAs[Long]("sum_len"), r.getAs[Long]("waste")))).toMap
    // cap 8 holds lens {8, 6, 5}: longest-first -> batch 0 = {8, 6}, 1 = {5}
    out((8L, 0L)) shouldBe ((2L, 8L, 14L, 2L))
    out((8L, 1L)) shouldBe ((1L, 5L, 5L, 0L))
    // cap 16 holds {16, 9}: one batch, waste 7
    out((16L, 0L)) shouldBe ((2L, 16L, 25L, 7L))
    // exact power of two stays in its own cap (16 -> 16, not 32)
    out((4L, 0L)) shouldBe ((1L, 3L, 3L, 0L))
    out((1L, 0L)) shouldBe ((1L, 1L, 1L, 0L))
    out((2L, 0L)) shouldBe ((1L, 2L, 2L, 0L))
    out.size shouldBe 6
  }

  test("lengthBucketBatches: padding waste stays under 50% on a real corpus") {
    import org.apache.spark.sql.functions.{filter => sqlFilter, size => sqlSize}
    val lens = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        sqlSize(sqlFilter(split(lower(trim(col("text"))), " "),
          (t: org.apache.spark.sql.Column) => t =!= ""))
          .cast("long").as("n_toks"))
    val batches = Sampling.lengthBucketBatches(lens, "doc_id", "n_toks",
      batchSize = 8, shards = 4).collect()
    assert(batches.nonEmpty)
    // every doc lands in exactly one batch
    assert(batches.map(_.getAs[Long]("n_docs")).sum == lens.count())
    // the construction bound: co-batched lens are within 2x, so padded
    // volume is less than twice the real token volume
    batches.foreach { b =>
      val padded = b.getAs[Long]("n_docs") * b.getAs[Long]("batch_len")
      assert(b.getAs[Long]("sum_len") * 2 > padded)
    }
  }

  test("weightedSample: hand ES key, weight dominance, exclusions, determinism") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "g", 2L), (2L, "g", 1L), (3L, "g", 1000000L),
      (4L, "g", 1L), (5L, "g", 0L), (6L, "g", -3L)).toDF("id", "grp", "w")
    // hand key for id=1, w=2: selector = 2654435761 mod 1e9+7
    val sel = 2654435761L % 1000000007L
    val expected = BigDecimal(
        math.log((sel + 1).toDouble / 1000000008.0) / 2.0)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = Sampling.weightedSample(df, "id", "w", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(all.keySet == Set(1L, 2L, 3L, 4L)) // w <= 0 rows drop
    assert(all(1L) == expected)
    // ln(u)/w -> 0- as w grows: the heavy row ranks first
    val top1 = Sampling.weightedSample(df, "id", "w", k = 1,
      by = Seq("grp")).collect()
    assert(top1.length == 1 && top1(0).getLong(0) == 3L)
    // exactly reproducible
    val again = Sampling.weightedSample(df, "id", "w", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == all)
  }

  test("waterFill: hand water level, redistribution to the unit, " +
    "surplus budget, zero budget") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 5L), ("b", 10L), ("c", 100L)).toDF("src", "supply")
    // B=20: a fully served (5*3 <= 20); R=15 over {b,c}: 7 each, +1
    // to b (first in sort order) -> 5 + 8 + 7 = 20 exactly
    val out = Sampling.waterFill(df, "src", "supply", budget = 20L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") == ((5L, 5L, false)))
    assert(out("b") == ((10L, 8L, true)))
    assert(out("c") == ((100L, 7L, true)))
    assert(out.values.map(_._2).sum == 20L)
    // surplus budget: everyone gets their supply, nobody capped
    val full = Sampling.waterFill(df, "src", "supply", budget = 200L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(full == Map("a" -> ((5L, false)), "b" -> ((10L, false)),
      "c" -> ((100L, false))))
    // zero budget: all capped at zero
    val zero = Sampling.waterFill(df, "src", "supply", budget = 0L)
      .collect().map(_.getLong(2)).sum
    assert(zero == 0L)
  }

  test("coverageSelect: greedy gains, saturation stops early, " +
    "trigram units") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "c d e"), (3L, "e f"))
      .toDF("doc_id", "text")
    val out = Sampling.coverageSelect(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // d1 covers 4; then d3 adds {e,f}=2 (d2 would add only {e});
    // coverage saturates -> round 3 selects nothing
    assert(out == Map(1L -> ((1L, 4L, 4L)), 2L -> ((3L, 2L, 6L))))
    // trigram units: tie at 2 units breaks to min id
    val tri = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val t3 = Sampling.coverageSelect(tri, "doc_id", "text", k = 2,
        shingleWidth = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(t3 == Map(1L -> ((1L, 2L, 2L)), 2L -> ((2L, 1L, 3L))))
    // string doc ids survive in their native type (a silent cast to
    // long nulled them, collapsing every doc into one __id); ties
    // still break to the min id by string order
    val sdocs = Seq(("docB", "a b c d"), ("docA", "a b c e"))
      .toDF("doc_id", "text")
    val s = Sampling.coverageSelect(sdocs, "doc_id", "text", k = 2)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(0), r.getLong(2), r.getLong(3)))).toMap
    // both cover 4 units -> tie to "docA"; docB then adds only {d}
    assert(s == Map("docA" -> ((1L, 4L, 4L)), "docB" -> ((2L, 1L, 5L))))
  }

  test("neymanAllocation: hand sigma weights, zero-variance stratum " +
    "gets zero, largest remainder sums to exactly B") {
    val ss = spark
    import ss.implicits._
    // a: {0,10} sigma 5 -> weight 1e7; b: constant -> weight 0;
    // c: {0,20} sigma 10 -> weight 2e7. B=10: bases 3/0/6, leftover 1
    // goes to c (largest remainder 2e7 vs a's 1e7)
    val df = Seq(("a", 0L), ("a", 10L), ("b", 3L), ("b", 3L), ("b", 3L),
      ("c", 0L), ("c", 20L)).toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", budget = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((2L, 5000000L, 10000000L, 333333L, 3L)))
    assert(out("b") == ((3L, 0L, 0L, 0L, 0L)))
    assert(out("c") == ((2L, 10000000L, 20000000L, 666666L, 7L)))
    assert(out.values.map(_._5).sum == 10L)
    // all-constant strata: Neyman undefined -> NULL allocations
    val flat = Seq(("a", 1L), ("b", 2L)).toDF("src", "v")
    val nul = Sampling.neymanAllocation(flat, "src", "v", budget = 5L)
      .collect()
    assert(nul.forall(_.isNullAt(5)))
  }

  test("effectiveSampleSize: Kish hand values, equal-weight identity") {
    val ss = spark
    import ss.implicits._
    // a: weights {3,1}: ess = 16/10 = 1.6, ppm = 800000,
    //    cv = sqrt(2*10/16 - 1) = 0.5
    // b: equal weights {5,5,5}: ess = n, ppm = 1000000, cv = 0
    // zero/negative weights are excluded, not counted
    val df = Seq(("a", 3), ("a", 1), ("b", 5), ("b", 5), ("b", 5),
      ("b", 0), ("b", -2)).toDF("g", "w")
    val out = Sampling.effectiveSampleSize(df, Seq("g"), "w")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_w"), r.getAs[Double]("ess"),
          r.getAs[Long]("ess_ppm"), r.getAs[Double]("cv")))).toMap
    out("a") shouldBe ((2L, 4L, 1.6, 800000L, 0.5))
    out("b") shouldBe ((3L, 15L, 3.0, 1000000L, 0.0))
    // single row: cv undefined
    val one = Sampling.effectiveSampleSize(
      Seq(("c", 7)).toDF("g", "w"), Seq("g"), "w").head()
    one.isNullAt(one.fieldIndex("cv")) shouldBe true
    one.getAs[Long]("ess_ppm") shouldBe 1000000L
  }
}
