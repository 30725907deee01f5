package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Determinism / equivalence properties for the operator helpers
  * (SURVEY §5 item 3). Only plain scalacheck is resolvable offline (no
  * scalatestplus bridge), so properties draw a fixed-seed deterministic
  * sample batch from each Gen instead of using forAll. */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic sample batch: n draws from gen under a fixed seed. */
  private def samples[A](gen: Gen[A], n: Int = 8, seed: Long = 42L): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  private val changelogGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(60, for {
      key <- Gen.chooseNum(0L, 5L)
      ver <- Gen.chooseNum(0L, 20L)
      payload <- Gen.alphaStr.map(_.take(8))
    } yield (key, ver, payload))

  test("latestStatePerKey equals a groupBy max-struct fold on random changelogs") {
    for (rows <- samples(changelogGen)) {
      if (rows.nonEmpty) {
        // unique tie-breaker: the changelog sequence number
        val df = rows.zipWithIndex
          .map { case ((k, v, p), i) => (k, v, i.toLong, p) }
          .toDF("key", "ver", "seq", "payload")
        val viaWindow = Relational
          .latestStatePerKey(df, Seq("key"), Seq($"ver".desc, $"seq".desc))
          .select("key", "ver", "seq", "payload")
        // independent formulation: per-key max over a sortable struct
        val viaFold = df
          .groupBy("key")
          .agg(max(struct($"ver", $"seq", $"payload")).as("s"))
          .select($"key", $"s.ver", $"s.seq", $"s.payload")
        assert(viaWindow.except(viaFold).isEmpty && viaFold.except(viaWindow).isEmpty)
      }
    }
  }

  test("maskColumn is idempotent and constant") {
    val df = Seq((1, "secret"), (2, "other")).toDF("id", "private_info")
    val once = Relational.maskColumn(df, "private_info")
    val twice = Relational.maskColumn(once, "private_info")
    assert(once.collect().sameElements(twice.collect()))
    assert(once.select("private_info").distinct().as[String].collect().toSeq == Seq("CENSORED"))
  }

  test("scd2 intervals tile each key's timeline; exactly one current version per key") {
    val log = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 30L, 102L, "c"),
      (2L, 15L, 103L, "x"),
      (3L, 40L, 104L, "p"), (3L, 40L, 105L, "q") // simultaneous: seq breaks the tie
    ).toDF("k", "ts", "seq", "v")
    val out = Relational.scd2(log, keys = Seq("k"), tsCol = "ts",
        tieBreak = Seq("seq"))
      .select("k", "seq", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 100L, 10L, Some(20L), false),
      (1L, 101L, 20L, Some(30L), false),
      (1L, 102L, 30L, None, true),
      (2L, 103L, 15L, None, true),
      (3L, 104L, 40L, Some(40L), false), // tie: earlier seq closes at the same instant
      (3L, 105L, 40L, None, true)))
    // exactly one current version per key; every row keeps its payload
    assert(out.count(_._5) == 3)
    assert(out.length == log.count())
  }

  test("topKPerGroup returns at most k rows per group, rank 1..k") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("g", "v")
    val top = Relational.topKPerGroup(df, Seq("g"), Seq($"v".desc), 3, Some("rn"))
    val perGroup = top.groupBy("g").count().as[(Int, Long)].collect()
    assert(perGroup.forall(_._2 <= 3))
    assert(top.agg(max("rn")).as[Int].head() <= 3)
    // top-3 desc of 0..99 by residue class: ranks are the 3 largest values
    val g0 = top.filter($"g" === 0).orderBy("rn").select("v").as[Int].collect().toSeq
    assert(g0 == Seq(98, 91, 84))
  }

  test("lagDelta first row per series is null, deltas reconstruct the series") {
    val df = Seq((1, 1, 10.0), (1, 2, 15.0), (1, 3, 12.0), (2, 1, 5.0))
      .toDF("series", "t", "v")
    val out = Relational.lagDelta(df, Seq("series"), Seq($"t"), "v")
      .orderBy("series", "t")
      .select("series", "t", "delta")
      .as[(Int, Int, Option[Double])]
      .collect()
      .toSeq
    assert(out == Seq((1, 1, None), (1, 2, Some(5.0)), (1, 3, Some(-3.0)), (2, 1, None)))
  }

  private val pointsGen = Gen.listOfN(40, Gen.chooseNum(0.0, 100.0))
  private val intervalsGen = Gen.listOfN(25, for {
    lo <- Gen.chooseNum(-10.0, 100.0)
    w <- Gen.chooseNum(-5.0, 20.0) // negative → inverted interval
  } yield (lo, lo + w))

  test("intervalPointJoin matches the naive theta join on random data") {
    for ((ps, is) <- samples(pointsGen, n = 6).zip(samples(intervalsGen, n = 6, seed = 7L))) {
      if (ps.nonEmpty && is.nonEmpty) {
        val points = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("pid", "p")
        val ivals = is.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
          .toDF("iid", "lo", "hi")
        val residual = $"p" >= $"lo" && $"p" <= $"hi"
        val bucketed = Relational
          .intervalPointJoin(points, $"p", ivals, $"lo", $"hi", residual, bucketWidth = 7.0)
          .select("pid", "iid")
        val naive = points.crossJoin(ivals).where(residual).select("pid", "iid")
        assert(bucketed.except(naive).isEmpty && naive.except(bucketed).isEmpty)
      }
    }
  }

  test("intervalPointJoin fails loudly on an interval spanning too many buckets") {
    val points = Seq((1, 5.0)).toDF("pid", "p")
    val ivals = Seq((1, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      Relational.intervalPointJoin(points, $"p", ivals, $"lo", $"hi",
        $"p" >= $"lo" && $"p" <= $"hi", bucketWidth = 1.0, maxBucketsPerInterval = 1000)
        .count()
    }
    assert(ex.getMessage != null)
  }

  test("exactQuantiles equals the built-in percentile on random grouped doubles") {
    val dataGen: Gen[List[(String, Double)]] =
      Gen.listOfN(300, for {
        g <- Gen.oneOf("a", "b", "c")
        // mix of distinct doubles and deliberate repeats (count compression path)
        v <- Gen.oneOf(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0L, 20L).map(_.toDouble))
      } yield (g, v))
    for ((rows, i) <- samples(dataGen, n = 4).zipWithIndex) {
      val df = rows.toDF("g", "v")
      val qs = Seq("p10" -> 0.1, "p50" -> 0.5, "p95" -> 0.95, "p100" -> 1.0)
      // small bucket count forces multi-value buckets + offset composition
      val got = Relational.exactQuantiles(df, Seq("g"), "v", qs, buckets = 7)
        .orderBy("g").collect()
      val want = df.groupBy("g").agg(
        expr("percentile(v, array(0.1D, 0.5D, 0.95D, 1.0D))").as("p"))
        .orderBy("g").collect()
      assert(got.length == want.length, s"batch $i row count")
      got.zip(want).foreach { case (gr, wr) =>
        assert(gr.getString(0) == wr.getString(0))
        val w = wr.getSeq[Double](1)
        (1 to 4).foreach { j =>
          assert(math.abs(gr.getDouble(j) - w(j - 1)) < 1e-9,
            s"batch $i group ${gr.getString(0)} q#$j: ${gr.getDouble(j)} vs ${w(j - 1)}")
        }
      }
    }
    // single-value group (span == 0) and single-row group edge cases
    val edge = Seq(("s", 5.0), ("s", 5.0), ("one", 3.14)).toDF("g", "v")
    val r = Relational.exactQuantiles(edge, Seq("g"), "v",
      Seq("p50" -> 0.5), buckets = 4).orderBy("g").collect()
    assert(r.map(x => (x.getString(0), x.getDouble(1))).toSeq ==
      Seq(("one", 3.14), ("s", 5.0)))
  }

  test("exactQuantilesMulti equals per-measure exactQuantiles") {
    val dataGen: Gen[List[(String, Double, Double)]] =
      Gen.listOfN(200, for {
        g <- Gen.oneOf("a", "b")
        v1 <- Gen.chooseNum(-100.0, 100.0)
        v2 <- Gen.chooseNum(0L, 30L).map(_.toDouble)
      } yield (g, v1, v2))
    for (rows <- samples(dataGen, n = 3)) {
      val df = rows.toDF("g", "x", "y")
      val multi = Relational.exactQuantilesMulti(df, Seq("g"), Seq(
        "x" -> Seq("xp50" -> 0.5, "xp95" -> 0.95),
        "y" -> Seq("yp50" -> 0.5)), buckets = 7)
        .orderBy("g").collect()
      val wx = Relational.exactQuantiles(df, Seq("g"), "x",
        Seq("xp50" -> 0.5, "xp95" -> 0.95), buckets = 7).orderBy("g").collect()
      val wy = Relational.exactQuantiles(df, Seq("g"), "y",
        Seq("yp50" -> 0.5), buckets = 7).orderBy("g").collect()
      multi.zip(wx.zip(wy)).foreach { case (m, (x, y)) =>
        assert(m.getString(0) == x.getString(0))
        assert(math.abs(m.getDouble(1) - x.getDouble(1)) < 1e-9)
        assert(math.abs(m.getDouble(2) - x.getDouble(2)) < 1e-9)
        assert(math.abs(m.getDouble(3) - y.getDouble(1)) < 1e-9)
      }
    }
  }

  test("hot-key saltedJoin equals the plain join on random skewed data") {
    val factGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(400, for {
        // zipf-ish: key 0 is heavily hot, a few warm keys, a long cold tail
        key <- Gen.frequency(
          5 -> Gen.const(0L), 2 -> Gen.chooseNum(1L, 3L), 3 -> Gen.chooseNum(4L, 60L))
        payload <- Gen.chooseNum(0L, 1000L)
      } yield (key, payload))
    for ((rows, i) <- samples(factGen, n = 3).zipWithIndex) {
      val fact = rows.toDF("k", "payload")
      val dim = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")
        // drop some dim keys so unmatched fact rows exercise inner-join drops
        .filter($"k" % 7 =!= 3)
      val plain = fact.join(dim, Seq("k"))
      for (threshold <- Seq(1L, 5L, 1000000L)) { // all-hot, mixed, all-cold
        val salted = Relational.saltedJoin(fact, dim, Seq("k"),
          saltFactor = 4, hotKeyThreshold = Some(threshold))
        assert(salted.columns.toSeq == plain.columns.toSeq, s"batch $i t=$threshold cols")
        // multiset equality (duplicates matter under a hot key)
        val a = salted.groupBy("k", "payload", "name").count()
        val b = plain.groupBy("k", "payload", "name").count()
        assert(a.except(b).isEmpty && b.except(a).isEmpty,
          s"batch $i threshold=$threshold diverged from the plain join")
      }
    }
  }

  test("bloomSemiJoin equals the plain semi-join on random keys, any key type") {
    val bigGen: Gen[List[(Long, String)]] =
      Gen.listOfN(300, for {
        key <- Gen.chooseNum(0L, 120L)
        tag <- Gen.alphaStr.map(_.take(6))
      } yield (key, tag))
    for ((rows, i) <- samples(bigGen, n = 3).zipWithIndex) {
      val big = rows.toDF("k", "tag")
      // key side with duplicates, a null, and keys absent from big
      val keys = ((0L to 120L by 3).map(java.lang.Long.valueOf) ++
        Seq(java.lang.Long.valueOf(7L), null, java.lang.Long.valueOf(999L)))
        .toDF("dk")
      val plain = big.join(keys, $"k" === $"dk", "left_semi")
      // tiny sketch forces a high false-positive rate: the residual
      // exact join must hide every one of them
      for (expected <- Seq(4L, 1L << 16)) {
        val pruned = Relational.bloomSemiJoin(big, "k", keys, "dk",
          expectedKeys = expected, fpp = 0.5)
        assert(pruned.columns.toSeq == plain.columns.toSeq, s"batch $i cols")
        val a = pruned.groupBy("k", "tag").count()
        val b = plain.groupBy("k", "tag").count()
        assert(a.except(b).isEmpty && b.except(a).isEmpty,
          s"batch $i expected=$expected diverged from the plain semi-join")
      }
      // string keys go through the same hash-prune + exact-residual path
      val bigS = rows.toDF("k", "tag").withColumn("k", concat(lit("id-"), $"k"))
      val keysS = keys.na.drop.withColumn("dk", concat(lit("id-"), $"dk"))
      val plainS = bigS.join(keysS, $"k" === $"dk", "left_semi")
      val prunedS = Relational.bloomSemiJoin(bigS, "k", keysS, "dk",
        expectedKeys = 64L, fpp = 0.1)
      assert(prunedS.except(plainS).isEmpty && plainS.except(prunedS).isEmpty,
        s"batch $i string keys diverged")
    }
    // the probe is a real pre-join prune: the plan carries the codegen'd
    // might_contain filter below the semi-join (a parquet-backed scan —
    // over a LocalRelation the optimizer folds the filter at plan time)
    val dir = java.nio.file.Files.createTempDirectory("bloomsemi").toString
    (0L to 50L).map(k => (k, "x")).toDF("k", "tag")
      .write.mode("overwrite").parquet(dir)
    val keys = Seq(1L, 2L).toDF("dk")
    val plan = Relational.bloomSemiJoin(spark.read.parquet(dir), "k", keys, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("temp-column names never collide with input columns") {
    // inputs already carrying __bucket/__rn must come through unharmed
    val points = Seq((1, 5.0, "keep")).toDF("pid", "p", "__bucket")
    val ivals = Seq((1, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val out = Relational.intervalPointJoin(points, $"p", ivals, $"lo", $"hi",
      $"p" >= $"lo" && $"p" <= $"hi", bucketWidth = 1.0)
    assert(out.columns.contains("__bucket"))
    assert(out.select("__bucket").as[String].head() == "keep")

    val df = Seq((1L, 2L, "x")).toDF("key", "ver", "__rn")
    val latest = Relational.latestStatePerKey(df, Seq("key"), Seq($"ver".desc))
    assert(latest.columns.contains("__rn"))
    assert(latest.select("__rn").as[String].head() == "x")
  }

  test("winsorize: clamps into the exact quantile interval, keeps every row") {
    val ss = spark
    import ss.implicits._
    // values 1..10: p25 = 3.25, p75 = 7.75 (linear interpolation)
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("g", "v")
    val out = Relational.winsorize(df, Seq("g"), "v", qLow = 0.25, qHigh = 0.75)
      .collect().map(r => r.getAs[Double]("v") ->
        ((r.getAs[Double]("q_lo"), r.getAs[Double]("q_hi"),
          r.getAs[Double]("winsorized")))).toMap
    assert(out.size == 10) // every row survives
    assert(out(1.0) == ((3.25, 7.75, 3.25)))  // clipped up
    assert(out(3.0)._3 == 3.25)               // still below p25
    assert(out(5.0)._3 == 5.0)                // interior untouched
    assert(out(8.0)._3 == 7.75)               // clipped down
    assert(out(10.0)._3 == 7.75)
  }

  test("zscore: population moments, hand values; constant group is NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("c", 7.0), ("c", 7.0)).toDF("g", "v")
    val out = Relational.zscore(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(r.fieldIndex("z"))) None
         else Some(r.getAs[Double]("z")))).toMap
    // var = 2/3, std = 0.816497 -> z(1) = -1.2247
    assert(out(("a", 1.0)) == Some(-1.2247))
    assert(out(("a", 2.0)) == Some(0.0))
    assert(out(("a", 3.0)) == Some(1.2247))
    assert(out(("c", 7.0)) == None) // zero variance
  }

  test("intervalOverlapJoin matches the naive theta join on random " +
    "intervals, exactly once per pair") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(11)
    val li = (1 to 120).map { i =>
      val lo = rnd.nextInt(1000).toDouble; (i.toLong, lo, lo + rnd.nextInt(80))
    }
    val ri = (1 to 120).map { i =>
      val lo = rnd.nextInt(1000).toDouble; (i.toLong, lo, lo + rnd.nextInt(80))
    }
    val l = li.toDF("lid", "lo1", "hi1")
    val r = ri.toDF("rid", "lo2", "hi2")
    val got = Relational.intervalOverlapJoin(l, col("lo1"), col("hi1"),
        r, col("lo2"), col("hi2"), bucketWidth = 25.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val want = for {
      (a, l1, h1) <- li; (b, l2, h2) <- ri
      if l1 <= h2 && l2 <= h1
    } yield (a, b)
    assert(got.length == got.distinct.length) // exactly-once emission
    assert(got.toSet == want.toSet)
    assert(want.nonEmpty)
  }

  test("intervalOverlapPartnerTopK equals the naive per-key partner " +
    "ranking; per-key output capped at k") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(23)
    // few keys on a SHARED axis: the hot-axis case the cap is for
    val iv = (1 to 150).map { i =>
      val lo = rnd.nextInt(400).toDouble
      (("u" + rnd.nextInt(8)): String, lo, lo + rnd.nextInt(60))
    }
    val df = iv.toDF("k", "lo", "hi")
    val k = 3
    val got = Relational.intervalOverlapPartnerTopK(df, "k", "lo", "hi",
        bucketWidth = 25.0, k = k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // naive: count overlapping interval pairs per ordered key pair,
    // rank (count desc, partner asc), keep <= k
    val counts = (for {
      (k1, l1, h1) <- iv; (k2, l2, h2) <- iv
      if k1 != k2 && l1 <= h2 && l2 <= h1
    } yield (k1, k2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.groupBy(_._1._1).toSeq.flatMap { case (k1, m) =>
      m.toSeq.map { case ((_, k2), n) => (k2, n) }
        .sortBy { case (k2, n) => (-n, k2) }
        .take(k).zipWithIndex
        .map { case ((k2, n), i) => (k1, k2, n, i + 1) }
    }
    assert(got.sorted.toSeq == want.sorted)
    assert(got.groupBy(_._1).values.forall(_.length <= k))
    assert(got.nonEmpty)
  }

  test("intervalOverlapPartnerTopK hot-bucket guard: a bucket whose " +
    "population exceeds maxKeysPerBucket fails loudly; under the cap " +
    "the result is unchanged") {
    val ss = spark
    import ss.implicits._
    // 6 keys, every interval covering the SAME bucket: population 6
    val iv = (1 to 6).map(i => (s"u$i", 10.0, 20.0))
    val df = iv.toDF("k", "lo", "hi")
    val e = intercept[Exception] {
      Relational.intervalOverlapPartnerTopK(df, "k", "lo", "hi",
        bucketWidth = 100.0, k = 2, maxKeysPerBucket = 3).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("maxKeysPerBucket"),
      s"expected the hot-bucket guard message, got: ${messages(e)}")
    // graceful path: population == cap does not trip, result matches
    // the unguarded ranking (everyone overlaps everyone here)
    val ok = Relational.intervalOverlapPartnerTopK(df, "k", "lo", "hi",
        bucketWidth = 100.0, k = 2, maxKeysPerBucket = 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3)))
    assert(ok.length == 6 * 2) // every key reports exactly k partners
    assert(ok.forall { case (k1, k2, rank) => k1 != k2 && rank <= 2 })
  }

  test("editBlockedPairs: finds every same-length Hamming<=k pair, " +
    "reports exact levenshtein, dedups by string") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = "abcde"
    // Base words + substitution variants (the operator's guarantee
    // class) + a duplicate string under a different id.
    val bases = Vector.fill(12)(Vector.fill(9)(alpha(rnd.nextInt(5))).mkString)
    val variants = bases.flatMap { w =>
      Vector.fill(2) {
        val i = rnd.nextInt(w.length)
        w.updated(i, alpha(rnd.nextInt(5)))
      }
    }
    val words = (bases ++ variants).distinct
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .appended((999L, words.head)) // duplicate string, higher id
      .toDF("id", "s")
    val out = Relational.editBlockedPairs(df, "id", "s", maxDist = 2, chunks = 3)
      .collect().map(r => (r.getAs[String]("str_a"), r.getAs[String]("str_b"))
        -> r.getAs[Int]("dist")).toMap

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // Every reported pair: correct exact distance, within threshold.
    out.foreach { case ((a, b), dist) =>
      assert(dist == lev(a, b) && dist <= 2, s"($a,$b)")
    }
    // The guarantee class is fully recalled (hamming >= levenshtein,
    // so these pairs also pass the residual).
    val guaranteed = for {
      i <- words.indices; j <- words.indices if i < j
      if words(i).length == words(j).length
      h = words(i).zip(words(j)).count { case (x, y) => x != y }
      if h <= 2
    } yield (words(i), words(j))
    guaranteed.foreach { case (a, b) =>
      assert(out.contains((a, b)) || out.contains((b, a)), s"missed ($a,$b)")
    }
    assert(guaranteed.nonEmpty)
    // The duplicate string collapsed to one representative: no
    // dist-0 self pair.
    assert(!out.keys.exists { case (a, b) => a == b })
  }

  test("percentileRank: average-rank ties, hand values, per-group scale") {
    val ss = spark
    import ss.implicits._
    // group g: values 10, 20, 20, 30 -> pct(10) = 1/8... formula
    // (2*below + ties + 1) / (2n): 10 -> (0+1+1)/8 = 0.25;
    // 20 -> (2+2+1)/8 = 0.625 (both ties share it); 30 -> (6+1+1)/8 = 1.0
    // group h: single value -> (0+1+1)/2 = 1.0
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 30.0),
      ("h", 999.0)).toDF("grp", "v")
    val out = Relational.percentileRank(df, Seq("grp"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("pct")).toMap
    assert(out(("g", 10.0)) == 0.25)
    assert(out(("g", 20.0)) == 0.625)
    assert(out(("g", 30.0)) == 1.0)
    assert(out(("h", 999.0)) == 1.0)
    // every row survives the join-back
    assert(Relational.percentileRank(df, Seq("grp"), "v").count() == 5)
  }

  test("madOutliers: hand medians, robust to the outlier it flags") {
    val ss = spark
    import ss.implicits._
    // {1..9, 1000}: median 5.5, devs {0.5..4.5, 994.5} -> MAD 2.5;
    // threshold 3*2.5 = 7.5: only the 1000 row flags. A mean/std z
    // would put mean ~105 and flag nothing but the outlier too — the
    // point is the MEDIAN stays put (5.5, not dragged to 105).
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("g", "v")
    val out = Relational.madOutliers(df, Seq("g"), "v")
      .collect().map(r => r.getDouble(1) ->
        (r.getDouble(r.fieldIndex("med")), r.getDouble(r.fieldIndex("mad")),
          r.getBoolean(r.fieldIndex("is_outlier")))).toMap
    assert(out(1000.0) == ((5.5, 2.5, true)))
    assert(out(1.0) == ((5.5, 2.5, false)))  // dev 4.5 < 7.5
    assert(out.count(_._2._3) == 1)
  }

  test("zscore: null values are excluded from the moments, not counted") {
    val ss = spark
    import ss.implicits._
    // With the null counted, mean(a) would be 6/4 = 1.5 and every z shifts;
    // excluded, the moments match the 3-row group above exactly.
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None)).toDF("g", "v")
    val out = Relational.zscore(df, Seq("g"), "v")
      .where(col("v").isNotNull)
      .collect().map(r => r.getDouble(1) -> r.getAs[Double]("z")).toMap
    assert(out(1.0) == -1.2247)
    assert(out(2.0) == 0.0)
    assert(out(3.0) == 1.2247)
  }

  test("weightedQuantiles: weight mass moves the cut; zero weights drop") {
    val ss = spark
    import ss.implicits._
    // g1: (1,w1),(2,w3),(10,w6) -> W=10: p50 lands on 10 (the heavy
    // value) where the unweighted median is 2; p10 -> 1. g2 equal
    // weights reduce to the unweighted type-1 quantile. The w=0 row
    // must not shift g1's total.
    val rows = Seq(("g1", 1L, 1L), ("g1", 2L, 3L), ("g1", 10L, 6L),
      ("g1", 99L, 0L),
      ("g2", 5L, 2L), ("g2", 6L, 2L), ("g2", 7L, 2L))
      .toDF("g", "v", "w")
    val out = Relational.weightedQuantiles(rows, Seq("g"), "v", "w",
        Seq("p10" -> 10, "p50" -> 50))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out("g1") == ((1.0, 10.0)))
    assert(out("g2") == ((5.0, 6.0)))
  }
}
