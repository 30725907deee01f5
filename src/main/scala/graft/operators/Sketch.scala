package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable profiling sketches — the incremental path for corpus
 * statistics at 100 TB, where "rescan everything nightly" stops being
 * a plan. Each sketch is a small per-group TABLE (not an opaque
 * binary) persisted like `Dedup.fingerprints`' history: tomorrow's
 * batch sketches alone, a `*Merge` folds it into the stored state,
 * and the estimate reads the merged state — the full corpus is never
 * rescanned. Everything is integer-deterministic (portable modular
 * hashes, bit-length register extraction, exact BIGINT register
 * sums), so an external SQL oracle replays sketch, merge, AND
 * estimate bit-for-bit — merge(sketch(A), sketch(B)) EQUALS
 * sketch(A ∪ B) as data, not approximately (the mergeability
 * contract the specs pin).
 *
 * Two sketches:
 *  - [[hllSketch]]: HyperLogLog registers (Flajolet et al. 2007) at
 *    m = 512; ≤ 512 rows per group, ~20 B each.
 *  - [[logHistSketch]]: a DDSketch-shaped (Masson et al., VLDB 2019)
 *    log-scaled histogram for rank queries over non-negative integer
 *    measures — 8 sub-buckets per octave (≤ 12.5% relative bucket
 *    width), bucket keys by pure integer bit-length extraction, so
 *    no float log ever decides a boundary.
 *
 * Scale shape: sketching is one map-side-combined aggregation of the
 * scan (the only data-sized stage); merge and estimate run over
 * group × registers rows. State per group is bounded (512 registers /
 * ~64·8 buckets) regardless of data size.
 */
object Sketch {

  /** Register count (2^9). Fixed so persisted sketches stay mergeable
    * across rounds; 512 registers ⇒ ~4.6% HLL standard error. */
  val HllM = 512

  /** Portable mid-square mixes of a BIGINT key: an affine-mod-prime
    * pre-mix (the repo's 2654435761 / 1540483477 multipliers), then
    * the SQUARE's middle bits — squaring is the nonlinearity an
    * affine map alone lacks (an affine h2 measured −59% on sf1.0's
    * key-shifted ids; mid-square tracks a SHA reference within 2σ of
    * HLL's 4.6% standard error across n = 150..100k). h1's bits
    * [12..] pick the register; h2 is drawn from EXACTLY [0, 2³⁰) —
    * an h2 uniform mod a non-power-of-two prime skews P(ρ = 1) and
    * biased even a SHA-hashed estimate by +20%. BIGINT-exact in any
    * engine (a² < 10¹⁸; shifts are floor-divisions by binary powers). */
  private def h1(v: Column): Column = {
    val a = pmod((v + 1L) * 2654435761L, lit(1000000007L))
    pmod(shiftright(a * a, 12), lit(HllM.toLong))
  }
  private def h2(v: Column): Column = {
    val b = pmod((v + 13L) * 1540483477L, lit(1000000007L))
    pmod(shiftright(b * b, 6), lit(1073741824L))
  }

  /** ρ = leading zeros of h2 as a 30-bit string, + 1 — computed as
    * 31 − bitlength(h2) via `bin()` string length (both Spark and
    * DuckDB print minimal binary), h2 = 0 ⇒ 31. Pure integers. */
  private def rho(h: Column): Column =
    when(h === 0L, lit(31)).otherwise(lit(31) - length(bin(h)).cast("int"))

  /** The same register/rank programs as pure Long functions — shared
    * with the streaming twin (`StreamingOps.hllStream`), replicating
    * the column programs operation for operation so stream state and
    * batch registers are bit-identical. */
  private[graft] def regOf(u: Long): Int = {
    val a = math.floorMod((u + 1L) * 2654435761L, 1000000007L)
    (math.floorMod((a * a) >> 12, HllM.toLong)).toInt
  }
  private[graft] def rhoOf(u: Long): Int = {
    val b = math.floorMod((u + 13L) * 1540483477L, 1000000007L)
    val h = math.floorMod((b * b) >> 6, 1073741824L)
    if (h == 0L) 31 else 31 - (64 - java.lang.Long.numberOfLeadingZeros(h))
  }
  /** The estimator's exact double program on a register map —
    * Spark-round semantics (BigDecimal.valueOf, HALF_UP) so the
    * result equals [[hllEstimate]] to the last bit. */
  private[graft] def estimateFrom(regs: scala.collection.Map[Int, Int]): Double = {
    val nz = regs.size.toLong
    val spart = regs.valuesIterator.map(r => 1L << (32 - r)).sum
    val s = spart + (HllM.toLong - nz) * (1L << 32)
    val alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    val rawE = alpha * 1125899906842624.0 / s.toDouble
    val vz = HllM.toLong - nz
    def rnd(x: Double, sc: Int): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(sc, java.math.RoundingMode.HALF_UP).doubleValue()
    val est =
      if (vz > 0L && rawE <= 2.5 * HllM) HllM.toDouble * rnd(math.log(HllM.toDouble / vz.toDouble), 6)
      else rawE
    rnd(est, 1)
  }

  /**
   * HLL register table of `valueCol` (a BIGINT key) per group:
   * (`by`*, `reg` int, `rho` int) — rho = max rank seen in that
   * register; absent registers mean zero. ≤ m rows per group.
   */
  def hllSketch(df: DataFrame, by: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.where(v.isNotNull)
      .select((by.map(col) :+ h1(v).cast("int").as("reg")
        :+ rho(h2(v)).as("__rho")): _*)
      .groupBy((by.map(col) :+ col("reg")): _*)
      .agg(max(col("__rho")).as("rho"))
  }

  /** Fold any number of register tables into one: per (group, reg),
    * the max rho. merge(sketch(A), sketch(B)) == sketch(A ∪ B) as a
    * table — associative, commutative, idempotent. */
  def hllMerge(sketches: Seq[DataFrame], by: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((by.map(col) :+ col("reg")): _*)
      .agg(max(col("rho")).as("rho"))

  /**
   * Cardinality estimate from a register table: the standard HLL
   * estimator with linear-counting small-range correction. The
   * harmonic sum is held EXACT — Σ 2^(32−ρ_j) (+ 2^32 per empty
   * register) is a BIGINT ≤ m·2^32 — so the only doubles are the
   * final fixed-order programs: E = α·m²·2³² / S, and for the
   * small range m·round(ln(m/V), 6) (ln 6-dp-rounded once, the
   * repo's idf/entropy convention). Output: `by`* + (`est_distinct`
   * double, rounded 1).
   */
  def hllEstimate(sketch: DataFrame, by: Seq[String]): DataFrame = {
    val g = sketch.groupBy(by.map(col): _*)
      .agg(count(lit(1)).as("__nz"),
        sum(shiftleft(lit(1L), 32) / pow(lit(2.0), col("rho").cast("double"))
          .cast("long")).as("__spart"))
    // Σ over present registers of 2^(32-ρ) is exact: 2^32 / 2^ρ with
    // ρ ∈ [1, 31] divides evenly; empty registers add 2^32 each.
    val vzero = lit(HllM.toLong) - col("__nz")
    val s = col("__spart") + vzero * shiftleft(lit(1L), 32)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0))
    val rawE = alpha * lit(1125899906842624.0) / s.cast("double") // m²·2³² = 2⁵⁰
    val linear = lit(HllM.toDouble) *
      round(log(lit(HllM.toDouble) / vzero.cast("double")), 6)
    val est = when(vzero > 0L && rawE <= lit(2.5 * HllM), linear)
      .otherwise(rawE)
    g.select((by.map(col) :+ round(est, 1).as("est_distinct")): _*)
  }

  /**
   * Mergeable moments sketch — [[Profile.numeric]]'s report split
   * into its associative parts so the ANALYZE profile can run
   * INCREMENTALLY over a growing corpus: per (column): row/null
   * counts, min/max, and the UNROUNDED DECIMAL(38,6)-exact value sum
   * (rounding happens at report time, so merge order can't leak into
   * the report). One row per column per batch; merge is
   * sum/sum/min/max/sum. The one non-mergeable-exactly statistic —
   * distinct values — pairs with [[hllSketch]] over a quantized
   * value key (see q172). [[momentsReport]] over a merged sketch
   * equals `Profile.numeric` minus `n_distinct`, operand for operand
   * (MomentsSpec pins the equality).
   */
  def momentsSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "momentsSketch: need at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*))
        .as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
    melted.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("v").isNull, 1L)), lit(0L)).as("n_null"),
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        coalesce(sum(col("v").cast("decimal(38,6)")),
          lit(0L).cast("decimal(38,6)")).as("vsum_dec"))
  }

  /** Fold moments sketches: counts and sums add, min/max fold —
    * associative and commutative, so batch boundaries are invisible. */
  def momentsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("col_name")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_null")).as("n_null"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        sum(col("vsum_dec")).as("vsum_dec"))

  /** The [[Profile.numeric]] report from a (merged) moments sketch:
    * identical fixed-order programs (4-dp sum, 6-dp mean over the
    * non-null count), minus the exact `n_distinct`. */
  def momentsReport(sketch: DataFrame): DataFrame =
    sketch.select(col("col_name"), col("n_rows"), col("n_null"),
      col("vmin"), col("vmax"),
      round(col("vsum_dec").cast("double"), 4).as("vsum"),
      when(col("n_rows") > col("n_null"),
        round(col("vsum_dec").cast("double") /
          (col("n_rows") - col("n_null")), 6))
        .otherwise(lit(null).cast("double")).as("vmean"))

  /** The bucket program as a pure Long function — shared with the
    * streaming twin (`StreamingOps.logHistStream`) so stream state and
    * batch buckets are bit-identical. Returns (b, q). */
  private[graft] def logBucketOf(v: Long): (Int, Long) = {
    require(v >= 0L, s"logBucketOf: negative value $v")
    if (v == 0L) (0, 0L)
    else {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(v)
      val q = (v * 8L) / (1L << b)
      (b, q)
    }
  }

  /** The rank-query walk as a pure function over a bucket-count map —
    * the same integer decisions as [[logHistQuantiles]] (cumulative
    * counts in (b, q) order, first bucket reaching ⌈φ·N⌉, lower
    * bound q·2^b/8). */
  private[graft] def logQuantileOf(buckets: scala.collection.Map[(Int, Long), Long],
                                   phi: Double): Long = {
    val n = buckets.valuesIterator.sum
    val target = math.ceil(phi * n).toLong
    var cum = 0L
    for (((b, q), c) <- buckets.toSeq.sortBy { case ((b, q), _) => (b, q) }) {
      cum += c
      if (cum >= target)
        return if (b == 0) 0L else (q * (1L << b)) / 8L
    }
    0L
  }

  /**
   * Log-scaled histogram sketch of a non-negative BIGINT measure:
   * (`by`*, `b` int = bitlength, `q` long = 3-bit sub-bucket,
   * `n` long). Bucket of v ≥ 1 is (b, ⌊v·8 / 2^b⌋) with q ∈ [4, 8)
   * — ≤ 12.5% relative width, exact for v < 8; v = 0 gets (0, 0).
   * Bucket lower bound is q·2^b/8, always an exact integer. Keys are
   * pure integer programs (bit length + floor division by a binary
   * power, both exact in doubles far below 2^53).
   */
  def logHistSketch(df: DataFrame, by: Seq[String],
                    valueCol: String): DataFrame = {
    val v = col(valueCol)
    val b = length(bin(v)).cast("int")
    val p2 = pow(lit(2.0), b.cast("double"))
    val q = ((v * 8L).cast("double") / p2).cast("long")
    df.where(v.isNotNull && v >= 0L)
      .select((by.map(col) :+
        when(v === 0L, lit(0)).otherwise(b).as("b") :+
        when(v === 0L, lit(0L)).otherwise(q).as("q")): _*)
      .groupBy((by.map(col) :+ col("b") :+ col("q")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Fold histogram sketches: per (group, b, q) summed counts. Exact
    * mergeability: merge(sketch(A), sketch(B)) == sketch(A ∪ B). */
  def logHistMerge(sketches: Seq[DataFrame], by: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((by.map(col) :+ col("b") :+ col("q")): _*)
      .agg(sum(col("n")).as("n"))

  /** Count-min grid width (2^10 counters per row) and the four rows'
    * (offset, multiplier) mix parameters — the same affine-then-
    * mid-square family as the HLL hashes, public Knuth/Murmur/xxHash
    * odd constants. (k + off)·mult stays under 2⁶³ for any
    * k < 2³¹ (TokenHash's range) by two orders of magnitude. */
  private val CmsW = 1024
  private val CmsParams: Seq[(Long, Long)] = Seq(
    (1L, 2654435761L), (13L, 1540483477L),
    (29L, 2246822519L), (47L, 3266489917L))
  private def cmsPos(k: Column, off: Long, mult: Long): Column = {
    val a = pmod((k + off) * mult, lit(1000000007L))
    pmod(shiftright(a * a, 8), lit(CmsW.toLong)).cast("int")
  }

  /**
   * Count-min sketch (Cormode & Muthukrishnan 2005) of a BIGINT-keyed
   * frequency stream — the ORDER-INDEPENDENT mergeable heavy-hitter
   * sketch (Misra–Gries would depend on arrival order and could never
   * pass a replay gate): 4 rows × 1024 counters as a table, each key
   * incrementing one counter per row at its portable mid-square
   * position. Estimates are upper bounds: est ≥ true, with overshoot
   * ≤ N/1024 per row w.h.p. and the MIN over 4 rows taken. Merge is
   * cell-wise sum — merge(sketch(A), sketch(B)) == sketch(A ⊎ B)
   * exactly as a table (weights add; SketchSpec pins it).
   *
   * `weightCol` folds pre-aggregated (key, count) tables in one pass;
   * absent, each row counts 1.
   *
   * Scale shape: one map-side-combined aggregation to ≤ 4096 cells;
   * the sketch is a broadcast-sized table forever after.
   */
  def cmsSketch(df: DataFrame, keyCol: String,
                weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val rows = CmsParams.zipWithIndex.map { case ((off, mult), j) =>
      struct(lit(j).as("r"), cmsPos(col(keyCol), off, mult).as("pos"))
    }
    df.where(col(keyCol).isNotNull)
      .select(explode(array(rows: _*)).as("__rp"), w.as("__w"))
      .groupBy(col("__rp.r").as("r"), col("__rp.pos").as("pos"))
      .agg(sum(col("__w")).as("n"))
  }

  /** Fold count-min sketches: cell-wise sums. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "pos").agg(sum(col("n")).as("n"))

  /**
   * Point estimates from a (merged) count-min sketch: for each row of
   * `keys` (distinct keys expected), `cms_n` = min over the 4 cells
   * the key hashes to (a key never inserted reads the cells' ambient
   * collision mass — still an upper bound of its true count 0).
   * The ≤ 4096-cell sketch broadcasts; the probe is scan-local.
   */
  def cmsLookup(sketch: DataFrame, keys: DataFrame,
                keyCol: String): DataFrame = {
    val rows = CmsParams.zipWithIndex.map { case ((off, mult), j) =>
      struct(lit(j).as("r"), cmsPos(col(keyCol), off, mult).as("pos"))
    }
    val keyCols = keys.columns.map(col).toSeq
    keys.withColumn("__rp", explode(array(rows: _*)))
      .join(broadcast(sketch),
        col("__rp.r") === col("r") && col("__rp.pos") === col("pos"), "left")
      .groupBy(keyCols: _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
  }

  /**
   * Population-stability-index drift gate over log-histogram
   * sketches: for each group, PSI = Σ_buckets (p − p_ref)·ln(p/p_ref)
   * of its sketch against a reference marginal (the corpus overall, a
   * frozen training snapshot, last week's sketch) — the standard
   * "which feed drifted" score, computed ENTIRELY from the two small
   * sketch tables: the data is long gone. Add-one smoothing over the
   * per-group union bucket set keeps every term finite and EXACT as a
   * rational; each ln is 6-dp-rounded once (the idf/entropy
   * convention), terms quantize to 9 dp and sum in DECIMAL, so both
   * engines replay the same program. Conventional read: < 0.1 stable,
   * 0.1–0.25 drifting, > 0.25 action. Output: `by`* +
   * (`n_buckets`, `psi`).
   *
   * Scale shape: groups × ref-buckets rows (the ref is a 1-sketch
   * broadcast); no data-sized anything.
   */
  def logHistPsi(sketch: DataFrame, by: Seq[String],
                 ref: DataFrame): DataFrame = {
    val groups = sketch.select(by.map(col): _*).distinct()
    val grid = groups.crossJoin(
      broadcast(ref.select(col("b"), col("q"), col("n").as("__nr"))))
    val joined = grid.join(sketch.withColumnRenamed("n", "__na"),
      by ++ Seq("b", "q"), "full_outer")
      .select((by.map(col) :+ col("b") :+ col("q") :+
        coalesce(col("__na"), lit(0L)).as("__na") :+
        coalesce(col("__nr"), lit(0L)).as("__nr")): _*)
    val wg = Window.partitionBy(by.map(col): _*)
    val withTot = joined
      .withColumn("__ta", sum(col("__na")).over(wg))
      .withColumn("__tr", sum(col("__nr")).over(wg))
      .withColumn("__bk", count(lit(1)).over(wg))
    val pa = (col("__na") + 1L).cast("double") /
      (col("__ta") + col("__bk")).cast("double")
    val pr = (col("__nr") + 1L).cast("double") /
      (col("__tr") + col("__bk")).cast("double")
    val term = round((pa - pr) * round(log(pa / pr), 6), 9)
    withTot
      .withColumn("__term", term.cast("decimal(28,9)"))
      .groupBy(by.map(col): _*)
      .agg(max(col("__bk")).as("n_buckets"),
        round(sum(col("__term")).cast("double"), 6).as("psi"))
  }

  /**
   * Wasserstein-1 (earth-mover) drift between a group's log-histogram
   * sketch and a reference sketch, in BUCKET-INDEX space — the
   * magnitude-of-shift companion to [[logHistPsi]] (PSI says THAT the
   * distribution moved; W₁ says HOW FAR, in ±12.5%-wide log buckets,
   * i.e. relative-scale units — one unit ≈ one 12.5% multiplicative
   * step). Computed ENTIRELY from the two small sketch tables after
   * the data is gone, like every sketch consumer here.
   *
   * Exactness: over the (b, q)-ordered union bucket set, each row's
   * |CDF_a − CDF_r| is WEIGHTED by the linearized-bucket-index gap to
   * the next union bucket (idx = 4·b + q — q ∈ [4, 8) for nonzero
   * values, so idx is dense across octave boundaries), i.e.
   * W₁ = Σ gap·|cumA·N_r − cumR·N_a| / (N_a·N_r) — without the gap a
   * whole-mass shift of K buckets would read as 1, not K, whenever
   * neither sketch has mass in the interior. Numerator terms are
   * exact DECIMAL(38,0) products summed in DECIMAL; ONE double
   * division rounds to 6 dp. Identical sketches give exactly 0; a
   * whole-mass shift of K index units gives exactly K. (The last
   * union bucket takes weight 0 — both CDFs are 1 there, a zero term
   * regardless.) Low-end caveat: octaves b ≤ 2 have unreachable
   * sub-indices (b=1 only q=4; b=2 only q∈{4,6}), so shifts among
   * values < 8 weigh by index distance, not reachable-bucket count.
   *
   * Output: `by`* + (`n_buckets`, `emd`).
   *
   * Scale shape: groups × ref-buckets rows, ref is a broadcast; no
   * data-sized anything.
   */
  def logHistEmd(sketch: DataFrame, by: Seq[String],
                 ref: DataFrame): DataFrame = {
    val groups = sketch.select(by.map(col): _*).distinct()
    val grid = groups.crossJoin(
      broadcast(ref.select(col("b"), col("q"), col("n").as("__nr"))))
    val joined = grid.join(sketch.withColumnRenamed("n", "__na"),
      by ++ Seq("b", "q"), "full_outer")
      .select((by.map(col) :+ col("b") :+ col("q") :+
        coalesce(col("__na"), lit(0L)).as("__na") :+
        coalesce(col("__nr"), lit(0L)).as("__nr")): _*)
    val wg = Window.partitionBy(by.map(col): _*)
    val wOrd = Window.partitionBy(by.map(col): _*)
      .orderBy(col("b"), col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(by.map(col): _*)
      .orderBy(col("b"), col("q"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val idx = col("b") * 4L + col("q")
    val withCum = joined
      .withColumn("__ca", sum(col("__na")).over(wOrd))
      .withColumn("__cr", sum(col("__nr")).over(wOrd))
      .withColumn("__ta", sum(col("__na")).over(wg))
      .withColumn("__tr", sum(col("__nr")).over(wg))
      .withColumn("__bk", count(lit(1)).over(wg))
      .withColumn("__w",
        coalesce(lead(idx, 1).over(wLead) - idx, lit(0L)))
      .withColumn("__d",
        (abs(dec(col("__ca")) * dec(col("__tr")) -
          dec(col("__cr")) * dec(col("__ta"))) * dec(col("__w")))
          .cast("decimal(38,0)"))
    withCum.groupBy(by.map(col): _*)
      .agg(max(col("__bk")).as("n_buckets"),
        round(sum(col("__d")).cast("double") /
          (max(col("__ta")).cast("double") * max(col("__tr"))), 6)
          .as("emd"))
  }

  /**
   * Kolmogorov–Smirnov drift between a group's log-histogram sketch
   * and a reference — the SUP companion completing the drift trio:
   * [[logHistPsi]] (information distance), [[logHistEmd]] (how FAR
   * the mass moved), and this (the single WORST cumulative gap — the
   * two-sample gate that fires on a localized shelf PSI's sum can
   * dilute). Computed entirely from the sketch tables.
   *
   * Exactness: over the (b, q)-ordered union bucket set the sup of
   * |CDF_a − CDF_r| is an EXACT DECIMAL argmax of |cumA·N_r −
   * cumR·N_a| (no division decides the winner); ONE double division
   * rounds the reported statistic to 6 dp. `at_idx` reports the
   * linearized bucket index (4·b + q) where the sup occurs (ties →
   * smallest index) — the actionable "where did the distributions
   * diverge" readout.
   *
   * Output: `by`* + (`n_buckets`, `ks`, `at_idx`).
   *
   * Scale shape: groups × ref-buckets rows, ref broadcast — the
   * logHistPsi grid; nothing data-sized.
   */
  def logHistKs(sketch: DataFrame, by: Seq[String],
                ref: DataFrame): DataFrame = {
    val groups = sketch.select(by.map(col): _*).distinct()
    val grid = groups.crossJoin(
      broadcast(ref.select(col("b"), col("q"), col("n").as("__nr"))))
    val joined = grid.join(sketch.withColumnRenamed("n", "__na"),
      by ++ Seq("b", "q"), "full_outer")
      .select((by.map(col) :+ col("b") :+ col("q") :+
        coalesce(col("__na"), lit(0L)).as("__na") :+
        coalesce(col("__nr"), lit(0L)).as("__nr")): _*)
    val wg = Window.partitionBy(by.map(col): _*)
    val wOrd = Window.partitionBy(by.map(col): _*)
      .orderBy(col("b"), col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val withCum = joined
      .withColumn("__ca", sum(col("__na")).over(wOrd))
      .withColumn("__cr", sum(col("__nr")).over(wOrd))
      .withColumn("__ta", sum(col("__na")).over(wg))
      .withColumn("__tr", sum(col("__nr")).over(wg))
      .withColumn("__bk", count(lit(1)).over(wg))
      .withColumn("__d",
        abs(dec(col("__ca")) * dec(col("__tr")) -
          dec(col("__cr")) * dec(col("__ta"))).cast("decimal(38,0)"))
      .withColumn("__negidx", -(col("b") * 4L + col("q")))
    withCum.groupBy(by.map(col): _*)
      .agg(max(col("__bk")).as("n_buckets"),
        max(col("__ta")).as("__ta2"), max(col("__tr")).as("__tr2"),
        max(struct(col("__d"), col("__negidx"))).as("__pick"))
      .select((by.map(col) :+ col("n_buckets") :+
        round(col("__pick.__d").cast("double") /
          (col("__ta2").cast("double") * col("__tr2")), 6).as("ks") :+
        (-col("__pick.__negidx")).as("at_idx")): _*)
  }

  /**
   * Rank queries over a merged histogram: for each requested φ, the
   * LOWER BOUND of the first bucket whose cumulative count reaches
   * ⌈φ·N⌉ (ties and boundaries all integer decisions; the answer is
   * within one bucket width — ≤ 12.5% — of the exact quantile).
   * Output: `by`* + one BIGINT column per (name, φ).
   */
  def logHistQuantiles(sketch: DataFrame, by: Seq[String],
                       quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "logHistQuantiles: need quantiles")
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("b"), col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(by.map(col): _*)
    val lb = (col("q").cast("double") *
      pow(lit(2.0), col("b").cast("double")) / lit(8.0)).cast("long")
    val cum = sketch
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__lb", when(col("b") === 0, lit(0L)).otherwise(lb))
    val aggs = quantiles.map { case (name, phi) =>
      min(when(col("__cum") >= ceil(lit(phi) * col("__tot")), col("__lb")))
        .as(name)
    }
    cum.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Pairwise set-algebra overlap between groups, ENTIRELY from their
   * HLL register tables — |A∩B| ≈ est(A) + est(B) − est(A∪B) by
   * inclusion–exclusion, where est(A∪B) reads the per-pair MAX
   * registers (union-merge is exact on sketches, [[hllMerge]]'s
   * contract). The "how much vocabulary / user base do these two
   * feeds share" readout when the raw keys are long gone — the
   * q87/q170 incremental posture extended to PAIRWISE questions the
   * persisted per-group sketches can already answer.
   *
   * Determinism: the union registers and both estimates run the exact
   * [[hllEstimate]] integer-register program; the intersection and
   * Jaccard arithmetic runs on the ALREADY-1-dp-ROUNDED estimates
   * (clamped at 0 — inclusion–exclusion on sketches can go negative
   * for near-disjoint sets), so both engines fold identical operands.
   * Accuracy: standard error compounds across three ±4.6% estimates —
   * this ranks overlaps, it does not certify small ones (that is the
   * documented HLL-intersection caveat, not a defect).
   *
   * Output: (`g1`, `g2`, `est1`, `est2`, `est_union`, `est_inter`,
   * `jaccard_est`), g1 < g2.
   *
   * Scale shape: pair-register rows are groups × (≤512) per group —
   * group-cardinality-bounded, never data-sized; one max-merge + the
   * estimate folds.
   */
  /** Per-pair HLL union estimate: pair-register rows via the
    * group × group self-pairing, max-merged, estimated — shared by
    * [[hllOverlap]] (inclusion–exclusion) and [[bottomKIntersect]]
    * (the bounded-error composition). Output: (g1 < g2, est_union). */
  private def pairUnionEstimate(sketch: DataFrame, groupCol: String): DataFrame = {
    val groups = sketch.select(col(groupCol)).distinct()
    val pairRows = sketch
      .join(groups.select(col(groupCol).as("__og")),
        col(groupCol) =!= col("__og"))
      .select(least(col(groupCol), col("__og")).as("g1"),
        greatest(col(groupCol), col("__og")).as("g2"),
        col("reg"), col("rho"))
    val unionRegs = pairRows.groupBy("g1", "g2", "reg")
      .agg(max(col("rho")).as("rho"))
    hllEstimate(unionRegs, Seq("g1", "g2"))
      .withColumnRenamed("est_distinct", "est_union")
  }

  def hllOverlap(sketch: DataFrame, groupCol: String): DataFrame = {
    val estU = pairUnionEstimate(sketch, groupCol)
    val estG = hllEstimate(sketch, Seq(groupCol))
    val inter = greatest(
      round(col("est1") + col("est2") - col("est_union"), 1), lit(0.0d))
    estU
      .join(estG.select(col(groupCol).as("g1"),
        col("est_distinct").as("est1")), "g1")
      .join(estG.select(col(groupCol).as("g2"),
        col("est_distinct").as("est2")), "g2")
      .select(col("g1"), col("g2"), col("est1"), col("est2"),
        col("est_union"), inter.as("est_inter"),
        when(col("est_union") > 0d,
          round(inter / col("est_union"), 6)).as("jaccard_est"))
  }

  /** Fixed bottom-k signature width (2^8). Fixed like [[HllM]] so
    * persisted signatures stay mergeable across rounds; k = 256 ⇒
    * Jaccard standard error ≤ 1/(2·√k) ≈ 3.1 points. */
  val BkK = 256

  /** Portable mid-square mix into [0, 2⁴⁰) — the [[h1]]/[[h2]]
    * discipline with its own constants, BIGINT-exact in any engine
    * (a² < 10¹⁸). Collisions conflate two keys with probability
    * ~n²/2⁴¹ per group — the documented tokenHash-class contract. */
  private def bkHash(v: Column): Column = {
    val a = pmod((v + 7L) * 1803349453L, lit(1000000007L))
    pmod(shiftright(a * a, 12), lit(1099511627776L))
  }
  private[graft] def bkHashOf(u: Long): Long = {
    val a = math.floorMod((u + 7L) * 1803349453L, 1000000007L)
    math.floorMod((a * a) >> 12, 1099511627776L)
  }

  /** Keep each group's [[BkK]] smallest distinct hash values. */
  private def keepBottomK(rows: DataFrame, by: Seq[String]): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("hv"))
    rows.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= BkK).drop("__rn")
  }

  /**
   * Bottom-k signature of `valueCol` (a BIGINT key) per group: the
   * [[BkK]] smallest distinct portable hash values — (`by`*, `hv`),
   * ≤ k rows ≈ 8 B each per group. The fixed-width set signature
   * (Broder's sketches / Cohen's bottom-k) whose pairwise Jaccard
   * estimate has BOUNDED error — the certificate [[hllOverlap]]'s
   * inclusion–exclusion cannot give on small overlaps (its documented
   * caveat), composed with the HLL union in [[bottomKIntersect]].
   *
   * Mergeability is EXACT set algebra: the k smallest of A ∪ B are
   * among the k smallest of A plus the k smallest of B, so
   * merge(sig(A), sig(B)) == sig(A ∪ B) as data ([[bottomKMerge]],
   * spec-pinned) — the persisted-signature incremental posture.
   *
   * Scale shape: one distinct over (group, 8 B hash) rows, then a
   * per-group rank — the same cost class as the distinct itself;
   * built once per corpus scan, every later batch merges k-bounded
   * tables.
   */
  def bottomKSketch(df: DataFrame, by: Seq[String], valueCol: String): DataFrame =
    keepBottomK(
      df.where(col(valueCol).isNotNull)
        .select((by.map(col) :+ bkHash(col(valueCol)).as("hv")): _*)
        .distinct(),
      by)

  /** Fold signature tables: distinct union, keep each group's k
    * smallest — merge(sig(A), sig(B)) == sig(A ∪ B) EXACTLY. */
  def bottomKMerge(sketches: Seq[DataFrame], by: Seq[String]): DataFrame =
    keepBottomK(sketches.reduce(_ unionByName _).distinct(), by)

  /**
   * Pairwise BOUNDED-ERROR intersection from bottom-k signatures +
   * HLL registers (both per the same `groupCol`): the k smallest of
   * each pair's merged signature are a uniform without-replacement
   * sample of A ∪ B, so the fraction present in BOTH signatures
   * estimates J(A, B) with Var ≤ J(1−J)/k — independent of how small
   * the overlap is relative to the union (the certificate HLL
   * inclusion–exclusion structurally lacks: its error compounds from
   * THREE ±4.6% cardinalities). |A ∩ B| then composes as
   * J · est_union(HLL), one multiplicative bound instead of a
   * difference of large numbers. Membership is sound: an hv among the
   * k smallest of A ∪ B that belongs to A is necessarily among A's k
   * smallest, hence in sig(A). Pairs whose groups BOTH hold fewer
   * than k distinct keys are EXACT (the signatures are the sets).
   *
   * Determinism: every decision before the two final divisions is
   * integer (distinct hashes, ranks, flag sums); `jaccard_bk` rounds
   * 6 dp, `est_inter` composes with the already-1-dp-rounded HLL
   * union and rounds 1 dp — both engines fold identical operands.
   *
   * Output: (`g1` < `g2`, `n_sample` ≤ k, `n_both`, `jaccard_bk`,
   * `est_union`, `est_inter`).
   *
   * Scale shape: pair rows are groups × (≤ k) — signature-bounded,
   * never data-sized; one max-flag dedup, one per-pair rank, the HLL
   * pair fold.
   */
  def bottomKIntersect(sig: DataFrame, hll: DataFrame,
                       groupCol: String): DataFrame = {
    val groups = sig.select(col(groupCol)).distinct()
    val pairRows = sig
      .join(groups.select(col(groupCol).as("__og")),
        col(groupCol) =!= col("__og"))
      .select(least(col(groupCol), col("__og")).as("g1"),
        greatest(col(groupCol), col("__og")).as("g2"),
        col("hv"), (col(groupCol) <= col("__og")).as("__in1"))
    val marked = pairRows.groupBy("g1", "g2", "hv")
      .agg(max(when(col("__in1"), 1L).otherwise(0L)).as("__i1"),
        max(when(!col("__in1"), 1L).otherwise(0L)).as("__i2"))
    val w = Window.partitionBy("g1", "g2").orderBy(col("hv"))
    val sample = marked.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= BkK)
    val j = sample.groupBy("g1", "g2")
      .agg(count(lit(1)).as("n_sample"),
        sum(col("__i1") * col("__i2")).as("n_both"))
      .select(col("g1"), col("g2"), col("n_sample"), col("n_both"),
        round(col("n_both").cast("double") / col("n_sample"), 6)
          .as("jaccard_bk"))
    j.join(pairUnionEstimate(hll, groupCol), Seq("g1", "g2"))
      .select(col("g1"), col("g2"), col("n_sample"), col("n_both"),
        col("jaccard_bk"), col("est_union"),
        round(col("jaccard_bk") * col("est_union"), 1).as("est_inter"))
  }
}
