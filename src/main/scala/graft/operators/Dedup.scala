package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document deduplication operators (SURVEY.md §7 step 7, the LLM-pipeline
 * north star): exact dedup on a hashed key and MinHash/LSH near-duplicate
 * detection. Pure Catalyst column programs — no UDFs, fully codegen'd.
 *
 * 100 TB posture:
 *  - exact dedup shuffles a 128-bit hash pair, never the document body;
 *  - near-dup candidate generation shuffles (band_id, band_signature)
 *    keys — bytes per document ≈ bands × 16, independent of text size;
 *    only candidate pairs (a vanishing fraction of all pairs) ever see
 *    the shingle arrays again, via an equi-join on doc_id.
 */
object Dedup {

  /** Normalized text key used by exact dedup: `lower(trim(text))`. */
  def normText(text: Column): Column = lower(trim(text))

  /** 128-bit shuffle key for exact dedup: two independently-seeded
    * xxhash64 images of the normalized text. Collision probability for
    * n documents is ≈ n²/2^129 — at n = 10¹² (far beyond 100 TB of
    * documents) that is < 10⁻¹⁴, while the shuffle carries 16 bytes per
    * row instead of the full corpus body (the naive groupBy-on-text
    * shape shuffles the whole corpus twice). */
  def textHashKey(text: Column): Seq[Column] = {
    val n = normText(text)
    Seq(xxhash64(n), xxhash64(lit(0x9e3779b9L), n))
  }

  /**
   * Exact dedup survivors: per distinct normalized text, the row with the
   * minimum `idCol` survives. Returns a 1-column DataFrame of surviving
   * ids. One hash shuffle on the 128-bit key.
   */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(textHashKey(col(textCol)): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /**
   * Distinct n-word shingles of a text column: tokenize on single spaces
   * (after lower/trim, mirroring the exact-dedup normalization), then
   * slide an n-token window. Texts with fewer than n tokens yield an
   * empty array.
   */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1, "shingle width must be >= 1")
    val w = split(normText(text), " ")
    val windows = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))
    array_distinct(
      when(size(w) >= n, windows).otherwise(array().cast("array<string>")))
  }

  /**
   * MinHash band signatures for LSH banding: `bands × rowsPerBand`
   * seeded xxhash64 min-hashes, grouped into per-band keys. Two
   * documents land in the same bucket of band b iff all `rowsPerBand`
   * min-hashes of that band agree; for Jaccard similarity s the
   * candidate probability is 1 − (1 − s^r)^b (the standard S-curve).
   *
   * Returns an array<struct<band:int, sig:array<bigint>>> column — one
   * element per band, ready to `explode` into the bucket join.
   */
  def minhashBands(shingles: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1, "bands and rowsPerBand must be >= 1")
    val perBand = (0 until bands).map { b =>
      val sig = array((0 until rowsPerBand).map { r =>
        val seed = b * rowsPerBand + r
        array_min(transform(shingles, s => xxhash64(lit(seed.toLong), s)))
      }: _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    array(perBand: _*)
  }

  /**
   * 64-bit SimHash of the word tokens of `text`, packed into a long:
   * bit b is set iff the sum over tokens of (bit b of xxhash64(token) ?
   * +1 : −1) is positive. Near-identical documents differ in few bits;
   * Hamming distance on the codes approximates token-set divergence.
   *
   * 64 static per-bit aggregates over the token array — verbose codegen
   * but pure Catalyst (no UDF); a fused TypedImperativeAggregate is the
   * known optimization if profiles ever demand it.
   */
  def simhash64(text: Column): Column = {
    val tokens = split(normText(text), " ")
    (0 until 64).map { b =>
      val vote = aggregate(tokens, lit(0L),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /**
   * SimHash near-duplicate pairs with EXACT pigeonhole banding: split
   * the 64-bit code into `maxHamming + 1` chunks — two codes within
   * `maxHamming` Hamming bits must agree exactly on at least one chunk
   * (pigeonhole), so the chunk equi-join is a lossless candidate
   * generator, unlike MinHash's probabilistic S-curve. Residual:
   * exact `bit_count(xor)`.
   *
   * Output: (d1, d2, hamming) with d1 < d2, hamming <= maxHamming.
   * Scale shape mirrors `nearDupPairs`: the all-rows shuffle carries
   * (chunk index, chunk bits) — 16 bytes per doc per chunk.
   */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16, "maxHamming must be in [0, 16)")
    val nChunks = maxHamming + 1
    val width = 64 / nChunks // last chunk also takes the remainder bits
    val codes = docs.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__sh"))
    val chunkCols = (0 until nChunks).map { i =>
      val lo = i * width
      val bits =
        if (i == nChunks - 1) shiftrightunsigned(col("__sh"), lo)
        else shiftrightunsigned(col("__sh"), lo).bitwiseAND((1L << width) - 1)
      struct(lit(i).as("i"), bits.as("bits"))
    }
    val buckets = codes.select(col("__id"), col("__sh"),
      explode(array(chunkCols: _*)).as("__ck"))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.__ck") === col("b.__ck") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"),
        bit_count(col("a.__sh").bitwiseXOR(col("b.__sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Embedding-cosine near-duplicate pairs with deterministic sign-LSH
   * blocking: pairs whose quantized sign-LSH codes differ in at most
   * `codeRadius` bits (exact pigeonhole banding on the code chunks, as
   * in `simhashNearDupPairs`) and whose exact cosine ≥ `threshold`.
   * The code filter is part of the contract — with integer-quantized
   * projections it is engine-independent, so an external oracle can
   * replicate the result exactly.
   */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                            planes: Array[Array[Int]], codeRadius: Int,
                            threshold: Double): DataFrame = {
    val nChunks = codeRadius + 1
    val nBits = planes.length
    require(nBits >= nChunks, "need at least codeRadius+1 code bits")
    val width = nBits / nChunks
    val codes = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      Similarity.signCode(col(vecCol), planes).as("__c"))
    val chunkCols = (0 until nChunks).map { i =>
      val lo = i * width
      val bits =
        if (i == nChunks - 1) shiftrightunsigned(col("__c"), lo)
        else shiftrightunsigned(col("__c"), lo).bitwiseAND((1L << width) - 1)
      struct(lit(i).as("i"), bits.as("bits"))
    }
    val buckets = codes.select(col("__id"), col("__v"), col("__c"),
      explode(array(chunkCols: _*)).as("__ck"))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.__ck") === col("b.__ck") && col("a.__id") < col("b.__id"))
      .filter(bit_count(col("a.__c").bitwiseXOR(col("b.__c"))) <= codeRadius)
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"),
        Similarity.cosine(col("a.__v"), col("b.__v")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /**
   * Near-duplicate pairs by MinHash/LSH banding with an exact residual:
   *
   *   shingle → minhash signature → band buckets → bucket equi-join →
   *   exact Jaccard on the candidate pairs → threshold filter.
   *
   * The residual check makes false positives impossible; false negatives
   * are bounded by the banding S-curve (defaults 16×3: a pair at
   * Jaccard 0.8 is missed with probability (1−0.8³)^16 ≈ 3·10⁻⁵, at
   * 0.9 with 10⁻⁸). rowsPerBand tunes the knee: r=2 admits ~j² of
   * random pairs per band as candidates — measured 20× more residual
   * work than r=3 on vocabulary-overlapping corpora — while r=4 starts
   * missing borderline pairs. Output: (d1, d2, jaccard) with d1 < d2,
   * exact Jaccard ≥ threshold.
   *
   * Scale shape: the only all-rows shuffle carries band keys (16 bytes ×
   * bands per doc); shingle arrays travel only for candidate pairs.
   * Skewed buckets (boilerplate-heavy corpora) are AQE's skew-join case;
   * degenerate giant buckets should be length-capped upstream.
   */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleWidth: Int = 3,
                   bands: Int = 16, rowsPerBand: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("__id"), wordShingles(col(textCol), shingleWidth).as("__sh"))
      .filter(size(col("__sh")) > 0)

    val buckets = sh.select(
      col("__id"),
      explode(minhashBands(col("__sh"), bands, rowsPerBand)).as("__bk"))

    val candidates = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.__bk") === col("b.__bk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"))
      .distinct()

    val inter = size(array_intersect(col("s1.__sh"), col("s2.__sh")))
    val unionSize = size(col("s1.__sh")) + size(col("s2.__sh")) - inter
    candidates
      .join(sh.alias("s1"), col("d1") === col("s1.__id"))
      .join(sh.alias("s2"), col("d2") === col("s2.__id"))
      .select(col("d1"), col("d2"),
        (inter.cast("double") / unionSize).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
