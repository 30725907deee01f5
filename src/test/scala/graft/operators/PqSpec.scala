package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => sqlSize}
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.Tables

/** Product-quantization family: training/encoding invariants and the
  * recall-1 pin (stride-1 codebook ⇒ ADC equals the exact quantized
  * distance ranking — the `nprobe = all` analogue for PQ). */
class PqSpec extends SparkTestBase with Matchers {

  private val M = 4
  private val Dim = 64

  private def emb = Tables.embeddings(spark, sf0001)
    .withColumn("e", col("embedding").cast("array<double>"))

  test("pqTrain: m*C codebook rows, every centroid on the quantize grid") {
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 37L, iters = 1).cache()
    val nInit = emb.filter(col("vec_id") % 37 === 0).count()
    book.count() shouldBe M * nInit
    // each subspace has exactly nInit centroids, width dim/m, integer grid
    val bad = book.filter(sqlSize(col("__cv")) =!= Dim / M ||
      exists(col("__cv"), x => x =!= round(x))).count()
    bad shouldBe 0L
    book.select(countDistinct(col("__sub"))).head().getLong(0) shouldBe M.toLong
    book.unpersist()
  }

  test("pqEncode: codes have length m and reference only codebook centroids") {
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 37L, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "e", book, m = M, dim = Dim)
    codes.filter(sqlSize(col("__code")) =!= M).count() shouldBe 0L
    val known = book.select(col("__sub"), col("__cid"))
    val used = codes.select(posexplode(col("__code")).as(Seq("__sub", "__cid")))
      .distinct()
    used.join(known, Seq("__sub", "__cid"), "left_anti").count() shouldBe 0L
  }

  test("recall-1 pin: stride-1 codebook makes ADC exact") {
    // every vector is its own centroid after one round (own distance 0;
    // exact-duplicate ties collapse to the min id, whose centroid is the
    // identical vector), so ADC d2 == exact quantized d2 for every doc
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 1L, iters = 1)
    val adc = Similarity.pqAdcTopK(emb, "vec_id", "e", book,
        targetId = 3L, k = 10, m = M, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val q = emb.select(col("vec_id"), Similarity.quantize(col("e")).as("__q"))
    val tgt = q.filter(col("vec_id") === 3L)
      .agg(min(col("__q")).as("__t"))
    val exact = q.filter(col("vec_id") =!= 3L)
      .crossJoin(broadcast(tgt))
      .select(col("vec_id"),
        (Similarity.dot(col("__q"), col("__q")) -
          lit(2.0) * Similarity.dot(col("__q"), col("__t")) +
          Similarity.dot(col("__t"), col("__t"))).cast("long").as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    adc should contain theSameElementsInOrderAs exact
  }

  test("pqTrain: an empty cell keeps its init centroid with __n = 0") {
    val ss = spark
    import ss.implicits._
    // ids 0 and 2 are init centroids (stride 2) with IDENTICAL quantized
    // vectors, so the (d2, cid) tie-break sends every row to cell 0 and
    // cell 2 assigns nothing: it must keep its init centroid at __n = 0
    val tiny = Seq(
      (0L, Array(0.001, 0.001)),
      (1L, Array(0.0012, 0.001)),
      (2L, Array(0.001, 0.001)),
      (3L, Array(0.0009, 0.0011))
    ).toDF("vec_id", "e")
    val book = Similarity.pqTrain(tiny, "vec_id", "e",
      m = 1, dim = 2, centroidStride = 2L, iters = 1)
    val rows = book.orderBy("__cid").collect()
    rows.map(_.getLong(1)) shouldBe Array(0L, 2L)
    val byCid = rows.map(r => r.getLong(1) ->
      ((r.getSeq[Double](2).toArray, r.getLong(3)))).toMap
    byCid(0L)._2 shouldBe 4L
    byCid(2L)._2 shouldBe 0L
    byCid(2L)._1 shouldBe Array(1.0, 1.0) // init centroid survives
  }

  test("requireVecDims: mixed-width corpora fail LOUDLY at every " +
    "declared-dim entry point, never as silent NULL coordinates") {
    val ss = spark
    import ss.implicits._
    // one 64-wide + one truncated 32-wide vector: the mixed-encoder case
    val mixed = Seq(
      (1L, Vector.fill(64)(0.5)), (2L, Vector.fill(32)(0.5)))
      .toDF("vec_id", "e")
      .withColumn("e", col("e").cast("array<double>"))
    def messageOf(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && !String.valueOf(c.getMessage)
        .contains("requireVecDims")) c = c.getCause
      String.valueOf(c.getMessage)
    }
    // the guard itself: clean corpus passes through value-identical
    Similarity.requireVecDims(emb, "e", 64).collect() should
      contain theSameElementsAs emb.collect()
    // kmeansCentroids / pqTrain / pqEncode all route through the guard
    val kEx = intercept[Throwable] {
      Similarity.kmeansCentroids(mixed, "vec_id", "e",
        centroidStride = 1L, iters = 1, dim = 64).collect()
    }
    messageOf(kEx) should include("requireVecDims")
    val tEx = intercept[Throwable] {
      Similarity.pqTrain(mixed, "vec_id", "e", m = 4, dim = 64,
        centroidStride = 1L, iters = 1).collect()
    }
    messageOf(tEx) should include("requireVecDims")
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 37L, iters = 1)
    val eEx = intercept[Throwable] {
      Similarity.pqEncode(mixed, "vec_id", "e", book, m = M, dim = Dim)
        .collect()
    }
    messageOf(eEx) should include("requireVecDims")
  }

  test("pqCodeCells fused scan equals ivfCellIndex cell + pqEncode code") {
    val coarse = Similarity.strideCentroids(emb, "vec_id", "e",
      centroidStride = 37L)
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 37L, iters = 1)
    val fused = Similarity.pqCodeCells(emb, "vec_id", "e", coarse, book,
        m = M, dim = Dim)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
      .toMap
    val cells = Similarity.ivfCellIndex(emb, "vec_id", "e", coarse)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codes = Similarity.pqEncode(emb, "vec_id", "e", book, m = M, dim = Dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    fused.keySet shouldBe cells.keySet
    fused.foreach { case (id, (cell, code)) =>
      cell shouldBe cells(id)
      code shouldBe codes(id)
    }
  }

  test("ivfPqServe with one covering cell equals pqAdcTopK per probe " +
    "(cell pruning off => the IVFADC tail IS the flat ADC search)") {
    val ss = spark
    import ss.implicits._
    // one coarse centroid (only vec_id 0 on a stride past every id) =>
    // the whole corpus lands in one cell and nprobe = 1 covers it; the
    // serve ranking must then equal the flat ADC top-k for that probe
    val probeId = 0L
    val hist = emb.filter(col("vec_id") =!= probeId)
    val book = Similarity.pqTrain(emb, "vec_id", "e", m = M, dim = Dim,
      centroidStride = 37L, iters = 1)
    val coarse = emb.filter(col("vec_id") === probeId)
      .select(lit(0L).as("__cid"),
        Similarity.quantize(col("e")).as("__cv"))
    val cells = Similarity.pqCodeCells(hist, "vec_id", "e", coarse, book,
      m = M, dim = Dim)
    val probes = emb.filter(col("vec_id") === probeId)
    val served = Similarity.ivfPqServe(cells, coarse, book, probes,
        "vec_id", "e", k = 10, nprobe = 1, m = M, dim = Dim)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val flat = Similarity.pqAdcTopK(emb, "vec_id", "e", book,
        targetId = probeId, k = 10, m = M, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    served should contain theSameElementsInOrderAs flat
  }
}
