package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming execution surface (SURVEY.md §2.8): the reference's delivery
 * loop — offset tracking, poll cadence, windowed aggregation, per-key
 * latest state — re-expressed as Structured Streaming primitives.
 *
 * Mapping (SURVEY §2.8):
 *  - ST1 offset topics (`connect-offset-storage`) → `checkpointLocation`
 *  - ST4 `poll.interval.ms=200` → `Trigger.ProcessingTime("200 ms")`
 *  - ST6 watermarks → `withWatermark` (engine-declared; Connect has no
 *    event time)
 *  - ST7 windows → the SAME `window()`/`session_window()` expressions the
 *    batch queries use (Q22/Q23) — one plan, two execution modes
 *  - ST8 per-key latest state → `mapGroupsWithState` (the streaming twin
 *    of Q24's ranking window)
 *
 * Everything here is plan construction only — callers attach sources,
 * sinks, triggers and checkpoints. That keeps the operators testable
 * offline (MemoryStream in, memory sink out) and cluster-ready
 * unchanged (Kafka in, Kafka/foreachBatch out).
 */
object StreamingOps {

  /**
   * Watermarked tumbling-window aggregate — the streaming twin of Q22.
   * Works identically on a batch DataFrame (watermark is a no-op there),
   * which is exactly how the oracle asserts it.
   *
   * State at scale: one row per (window, key) within the watermark
   * horizon; expired windows are dropped by the state store, so state is
   * bounded by (horizon / windowDuration) × |keys|.
   */
  def tumblingAgg(events: DataFrame, tsCol: String, windowDuration: String,
                  watermarkDelay: String, keyCols: Seq[String],
                  valueCol: String): DataFrame = {
    // Watermarks only accept TIMESTAMP, not TIMESTAMP_NTZ
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session is pinned to
    // UTC, so NTZ ⇄ TIMESTAMP casts are exact reinterpretations; the
    // output window start is cast back so batch oracle parity (NTZ on
    // the wire) is preserved.
    val evt = "__evt"
    events
      .withColumn(evt, col(tsCol).cast("timestamp"))
      .withWatermark(evt, watermarkDelay)
      .groupBy(window(col(evt), windowDuration) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("wstart") +:
        keyCols.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  /**
   * Watermarked sliding-window aggregate — the third ST7 window shape
   * beside tumbling (`tumblingAgg`) and session (`sessionAgg`): each
   * event lands in `windowDuration / slideDuration` overlapping
   * windows (the PromQL `rate(x[1m])` evaluated every 30 s shape).
   * Same NTZ⇄TIMESTAMP treatment and batch/streaming duality as
   * `tumblingAgg`.
   *
   * State at scale: (horizon / slideDuration) × |keys| window rows —
   * a factor duration/slide more than tumbling; keep the slide coarse
   * enough that the multiplier stays small.
   */
  def slidingAgg(events: DataFrame, tsCol: String, windowDuration: String,
                 slideDuration: String, watermarkDelay: String,
                 keyCols: Seq[String], valueCol: String): DataFrame = {
    val evt = "__evt"
    events
      .withColumn(evt, col(tsCol).cast("timestamp"))
      .withWatermark(evt, watermarkDelay)
      .groupBy(window(col(evt), windowDuration, slideDuration) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("wstart") +:
        keyCols.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  /**
   * Watermarked session-window count — the streaming twin of Q23
   * (30-minute-gap sessions). Same NTZ⇄TIMESTAMP treatment as
   * `tumblingAgg`. In append mode a session emits once the watermark
   * passes its close (last event + gap); state per key is bounded by
   * the watermark horizon.
   */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
                 watermarkDelay: String, keyCols: Seq[String]): DataFrame = {
    val evt = "__evt"
    events
      .withColumn(evt, col(tsCol).cast("timestamp"))
      .withWatermark(evt, watermarkDelay)
      .groupBy(session_window(col(evt), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(keyCols.map(col) :+
        col("session_window.start").cast("timestamp_ntz").as("session_start") :+
        col("session_window.end").cast("timestamp_ntz").as("session_end") :+
        col("n"): _*)
  }

  /**
   * Streaming exact dedup — the LLM-pipeline dedup north star under
   * streaming delivery: drop rows whose dedup key was already seen,
   * with state expiry bounded by the watermark horizon
   * (`dropDuplicatesWithinWatermark`). This is also the engine's
   * at-least-once → effectively-once compaction step: replayed source
   * records (ST2) collapse in-stream before reaching a sink.
   *
   * Pass a HASHED key (the `Dedup.textHashKey` shape) for document
   * dedup so the state store holds 16 bytes per seen key, never the
   * document body — the same 100 TB posture as the batch operator.
   */
  def dedupStream(df: DataFrame, tsCol: String, watermarkDelay: String,
                  keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    val evt = "__evt"
    df.withColumn(evt, col(tsCol).cast("timestamp"))
      .withWatermark(evt, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
      .drop(evt)
  }

  /**
   * Streaming incremental cross-corpus dedup — the continuous twin of
   * `Dedup.survivorsAgainstHistory`: arriving documents are dropped
   * where their 128-bit normalized-text key already exists in the
   * PERSISTED history fingerprint table (`Dedup.fingerprints` — a
   * static side, so the anti join runs per micro-batch with no stream
   * state), then deduplicated within the stream itself by the same key
   * via [[dedupStream]] (watermark-bounded 16 B/key state).
   *
   * Documented divergence from the batch operator: the in-stream
   * canonical is FIRST ARRIVAL (a stream cannot wait to learn the
   * minimum id), where batch picks min id — identical when delivery is
   * id-ordered, and irrelevant to which TEXTS survive either way.
   */
  def dedupAgainstHistoryStream(newDocs: DataFrame, textCol: String,
                                historyFps: DataFrame, tsCol: String,
                                watermarkDelay: String): DataFrame = {
    val Seq(h1, h2) = graft.operators.Dedup.textHashKey(col(textCol))
    val keyed = newDocs
      .withColumn("fp_h1", h1).withColumn("fp_h2", h2)
      .join(historyFps, Seq("fp_h1", "fp_h2"), "left_anti")
    dedupStream(keyed, tsCol, watermarkDelay, Seq("fp_h1", "fp_h2"))
      .drop("fp_h1", "fp_h2")
  }

  /** One per-chunk-occurrence verdict from [[chunkVerdictStream]]:
    * chunk `chunk_idx` of document `doc_id` survives iff `kept`. */
  case class ChunkVerdict(doc_id: Long, chunk_idx: Long, kept: Boolean)

  /** Internal wire row of [[chunkVerdictStream]] (public only because
    * Catalyst's generated deserializer must construct it). */
  case class ChunkRow(doc: Long, idx: Long, h1: Long, h2: Long,
                      hist: Boolean, evt: java.sql.Timestamp)

  /**
   * Streaming chunk-level dedup — the continuous twin of
   * `Dedup.chunkDedup`, completing the incremental family
   * (doc-level already has [[dedupAgainstHistoryStream]]): arriving
   * documents are cut in-row into `chunkWords`-word blocks (the SAME
   * hash basis as the batch operator, `Dedup.chunkHashStruct`, so
   * keying matches bit-for-bit), a block occurrence is dropped where
   * its 128-bit hash exists in the PERSISTED chunk-fingerprint history
   * (`Dedup.chunkFingerprints` — static side, no stream state), and
   * cross-document ownership within the stream resolves through
   * `flatMapGroupsWithState` keyed by the chunk hash: the first
   * micro-batch to present a chunk fixes its owner as that batch's
   * MINIMUM doc id (= the batch canonical when a corpus replays in one
   * batch; first-batch-min-id across batches — the same documented
   * divergence as [[dedupAgainstHistoryStream]]). Within the owner
   * document every occurrence survives, exactly like batch.
   *
   * Emits one verdict per chunk occurrence (doc_id, chunk_idx, kept) —
   * thin rows; document text never enters the shuffle or the state
   * store. Rebuilding `clean_text` from verdicts is the stateless
   * batch step `Dedup.rebuildFromChunkVerdicts` (sink-side /
   * foreachBatch), shared verbatim with the batch operator.
   *
   * State at scale: 24 B per distinct chunk (16 B key + owner id),
   * expired at the watermark horizon via event-time timeout —
   * RocksDB-backed past executor heap like any ST8 op.
   */
  def chunkVerdictStream(stream: DataFrame, idCol: String, textCol: String,
                         chunkWords: Int, historyFps: DataFrame,
                         tsCol: String,
                         watermarkDelay: String): Dataset[ChunkVerdict] = {
    require(chunkWords >= 1, "chunkWords must be >= 1")
    import graft.operators.Dedup
    val spark = stream.sparkSession
    import spark.implicits._
    val cw = chunkWords
    // split materialized before the chunk lambda reads it (the
    // wordShinglesOf perf contract)
    val nChunks = ceil(size(col("__ws")).cast("double") / cw).cast("long")
    val rows = stream
      .withColumn("__evt", col(tsCol).cast("timestamp"))
      .withWatermark("__evt", watermarkDelay)
      .select(col(idCol).cast("long").as("doc"), col("__evt").as("evt"),
        split(Dedup.normText(col(textCol)), " ").as("__ws"))
      .select(col("doc"), col("evt"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => Dedup.chunkHashStruct(col("__ws"), i, cw))).as(Seq("idx", "__h")))
      .join(historyFps.select(col("fp_h1"), col("fp_h2"),
          lit(true).as("__hist")),
        col("__h.h1") === col("fp_h1") && col("__h.h2") === col("fp_h2"),
        "left")
      .select(col("doc"), col("idx"), col("__h.h1").as("h1"),
        col("__h.h2").as("h2"), coalesce(col("__hist"), lit(false)).as("hist"),
        col("evt"))
      .as[ChunkRow]
    rows
      .groupByKey(r => (r.h1, r.h2))
      .flatMapGroupsWithState[Long, ChunkVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, Long), it: Iterator[ChunkRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = it.toIndexedSeq
            val fresh = rs.filter(!_.hist)
            // history owns its chunks outright; otherwise the first
            // batch to present the chunk fixes owner = its min doc id
            val owner: Option[Long] = state.getOption.orElse(
              if (fresh.nonEmpty) Some(fresh.map(_.doc).min) else None)
            if (fresh.nonEmpty && owner.isDefined) {
              if (!state.exists) state.update(owner.get)
              // keep the owner alive to the watermark horizon
              state.setTimeoutTimestamp(rs.map(_.evt.getTime).max,
                watermarkDelay)
            }
            rs.iterator.map(r =>
              ChunkVerdict(r.doc, r.idx, !r.hist && owner.contains(r.doc)))
          }
      }
  }

  /** One per-span-occurrence verdict from [[spanVerdictStream]]: the
    * span starting at word `start` of document `doc_id` survives iff
    * `kept`; a false verdict covers positions [start, start + w). */
  case class SpanVerdict(doc_id: Long, start: Long, kept: Boolean)

  /** Internal wire row of [[spanVerdictStream]] (public only because
    * Catalyst's generated deserializer must construct it). */
  case class SpanRow(doc: Long, start: Long, h1: Long, h2: Long,
                     hist: Boolean, evt: java.sql.Timestamp)

  /**
   * Streaming overlapping-window exact-substring dedup — the
   * continuous twin of `Dedup.substringDedup`, completing the
   * incremental family at the sub-document level (blocks have
   * [[chunkVerdictStream]]; this is the stride-1 span analogue):
   * arriving documents expand in-row into their overlapping
   * `windowWords`-word span hashes (the SAME basis as the batch
   * operator — `Dedup.spanAt` + double xxhash64 — so keying matches
   * bit-for-bit), a span occurrence is dropped where its 128-bit hash
   * exists in the PERSISTED span-fingerprint history
   * (`Dedup.spanFingerprints`, static side, no stream state), and
   * first-occurrence ownership within the stream resolves through
   * `flatMapGroupsWithState` keyed by the span hash. Ownership is the
   * batch policy at the occurrence grain: the first micro-batch to
   * present a span fixes its owner as that batch's lexicographically
   * MINIMUM (doc, start) — note the difference from the chunk twin,
   * where every occurrence inside the owner DOC survives; here only
   * the single owner occurrence does, exactly like batch (= the batch
   * keeper when a corpus replays in one batch; first-batch-min across
   * batches, the family's documented divergence).
   *
   * Emits one verdict per span occurrence — thin rows; document text
   * never enters the shuffle or the state store. Rebuilding
   * `clean_text` is the stateless batch step
   * `Dedup.rebuildFromSpanVerdicts` (sink-side / foreachBatch), shared
   * verbatim with the batch operator.
   *
   * State at scale: 32 B per distinct span (16 B key + owner doc +
   * start), expired at the watermark horizon via event-time timeout —
   * RocksDB-backed past executor heap like any ST8 op.
   */
  def spanVerdictStream(stream: DataFrame, idCol: String, textCol: String,
                        windowWords: Int, historyFps: DataFrame,
                        tsCol: String,
                        watermarkDelay: String): Dataset[SpanVerdict] = {
    require(windowWords >= 2, "windowWords must be >= 2")
    import graft.operators.Dedup
    val spark = stream.sparkSession
    import spark.implicits._
    val sw = windowWords
    val words = split(Dedup.normText(col(textCol)), " ")
    val starts = when(size(words) >= sw, sequence(lit(0), size(words) - sw))
      .otherwise(array().cast("array<int>"))
    val rows = stream
      .withColumn("__evt", col(tsCol).cast("timestamp"))
      .withWatermark("__evt", watermarkDelay)
      .select(col(idCol).cast("long").as("doc"), col("__evt").as("evt"),
        words.as("__ws"), explode(starts).as("__start"))
      .select(col("doc"), col("evt"), col("__start").cast("long").as("start"),
        xxhash64(Dedup.spanAt(col("__ws"), col("__start"), sw)).as("h1"),
        xxhash64(lit(0x9e3779b9L),
          Dedup.spanAt(col("__ws"), col("__start"), sw)).as("h2"))
      .join(historyFps.select(col("fp_h1"), col("fp_h2"),
          lit(true).as("__hist")),
        col("h1") === col("fp_h1") && col("h2") === col("fp_h2"),
        "left")
      .select(col("doc"), col("start"), col("h1"), col("h2"),
        coalesce(col("__hist"), lit(false)).as("hist"), col("evt"))
      .as[SpanRow]
    rows
      .groupByKey(r => (r.h1, r.h2))
      .flatMapGroupsWithState[(Long, Long), SpanVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, Long), it: Iterator[SpanRow],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = it.toIndexedSeq
            val fresh = rs.filter(!_.hist)
            // history owns its spans outright; otherwise the first
            // batch to present the span fixes owner = its minimum
            // (doc, start) occurrence
            val owner: Option[(Long, Long)] = state.getOption.orElse(
              if (fresh.nonEmpty) Some(fresh.map(r => (r.doc, r.start)).min)
              else None)
            if (fresh.nonEmpty && owner.isDefined) {
              if (!state.exists) state.update(owner.get)
              state.setTimeoutTimestamp(rs.map(_.evt.getTime).max,
                watermarkDelay)
            }
            rs.iterator.map(r => SpanVerdict(r.doc, r.start,
              !r.hist && owner.contains((r.doc, r.start))))
          }
      }
  }

  /**
   * Streaming fuzzy decontamination — the continuous twin of
   * `Dedup.crossNearDupPairs`: arriving (train-side) documents are
   * checked for near-duplicate overlap against a STATIC eval corpus
   * before they ever land in the training set. Same MinHash/LSH
   * banding + exact-Jaccard residual, restructured for a stream:
   *
   *  - the eval side is precomputed ONCE as a band table carrying each
   *    eval doc's full signature and distinct shingle-hash array, and
   *    broadcast (an eval benchmark is small by construction);
   *  - the arriving doc's shingle hashes, minhash signature and band
   *    keys are computed IN-ROW with higher-order array expressions —
   *    the same typed-seam exemption as the multimodal decode edge;
   *    this is the per-row stream path, not the batch hot path. The
   *    hash basis is IDENTICAL to `Dedup.shingleHashRows` (xxhash64
   *    over the window's token columns, then xxhash64(j, h) minima),
   *    so banding decisions match the batch operator bit-for-bit;
   *  - candidate dedup needs NO stream state: a (train, eval) pair is
   *    emitted only from its MINIMUM matching band — recomputable from
   *    the two carried signatures at join time — so the band explosion
   *    yields each pair exactly once without `distinct`;
   *  - the exact-Jaccard residual is a projection over the two carried
   *    hash arrays (`array_intersect` on distinct sets == the batch
   *    intersection-join counts).
   *
   * Entirely stateless (append mode, no watermark): the static side is
   * the only memory. Output: (train id, eval_id, exact jaccard ≥
   * threshold), one row per leak — stream == batch row-for-row
   * (StreamingSpec pins it on a replayed MemoryStream).
   */
  def crossNearDupStream(stream: DataFrame, idCol: String, textCol: String,
                         evalDocs: DataFrame, evalIdCol: String,
                         evalTextCol: String, threshold: Double,
                         shingleWidth: Int = 3, bands: Int = 16,
                         rowsPerBand: Int = 3): DataFrame = {
    import graft.operators.Dedup
    val k = bands * rowsPerBand

    // static eval side: band key -> (eval_id, full signature, shingle set)
    val sh = Dedup.shingleHashRows(evalDocs, evalIdCol, evalTextCol, shingleWidth)
    val sigCols = (0 until k).map(j =>
      min(xxhash64(lit(j.toLong), col("__sh"))).as(s"__m$j"))
    val agg = sh.groupBy("__id")
      .agg(sigCols.head, sigCols.tail :+ collect_list(col("__sh")).as("__esh"): _*)
    val eBandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"),
        struct((0 until rowsPerBand).map(r =>
          col(s"__m${i * rowsPerBand + r}").as(s"h$r")): _*).as("sig"))
    }
    val evalBands = agg.select(col("__id").as("eval_id"),
      array((0 until k).map(j => col(s"__m$j")): _*).as("__esig"),
      col("__esh"),
      explode(array(eBandCols: _*)).as("__ebk"))

    // stream side: shingle hashes, signature and band keys in-row;
    // the split materializes before the shingle lambda reads it (the
    // wordShinglesOf perf contract)
    val toksM = col("__toks")
    val shArr = array_distinct(transform(
      when(size(toksM) >= shingleWidth,
        sequence(lit(0), size(toksM) - shingleWidth))
        .otherwise(array().cast("array<int>")),
      i => xxhash64((0 until shingleWidth).map(w =>
        element_at(toksM, i + w + 1)): _*)))
    val sigExprs = (0 until k).map(j =>
      array_min(transform(col("__ssh"), h => xxhash64(lit(j.toLong), h))))
    val sBandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"),
        struct((0 until rowsPerBand).map(r =>
          element_at(col("__ssig"), i * rowsPerBand + r + 1).as(s"h$r")): _*).as("sig"))
    }
    val sBands = stream
      .select(col(idCol).as("__sid"),
        split(Dedup.normText(col(textCol)), " ").as("__toks"))
      .select(col("__sid"), shArr.as("__ssh"))
      .filter(size(col("__ssh")) > 0)
      .withColumn("__ssig", array(sigExprs: _*))
      .select(col("__sid"), col("__ssh"), col("__ssig"),
        explode(array(sBandCols: _*)).as("__bk"))

    // min-matching-band filter makes the pair unique without distinct
    val matching = filter(sequence(lit(0), lit(bands - 1)), i =>
      (0 until rowsPerBand).map(r =>
        element_at(col("__ssig"), i * rowsPerBand + (r + 1)) ===
          element_at(col("__esig"), i * rowsPerBand + (r + 1)))
        .reduce(_ && _))
    val inter = size(array_intersect(col("__ssh"), col("__esh")))
    val union = size(col("__ssh")) + size(col("__esh")) - inter
    sBands
      .join(broadcast(evalBands), col("__bk") === col("__ebk"))
      .filter(element_at(matching, 1) === col("__bk.band"))
      .select(col("__sid").as(idCol), col("eval_id"),
        (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Streaming semantic decontamination — the continuous twin of
   * `Dedup.crossEmbeddingNearDupPairs`, completing the streaming leak
   * checks (verbatim n-grams: `contaminatedAgainst` stream-static;
   * lexical near-dup: [[crossNearDupStream]]; this: embedding space).
   * The arriving vector's sign-LSH code is one in-row codegen'd
   * expression (`Similarity.signCode`); the static eval side is a
   * broadcast table of pigeonhole chunk keys carrying full codes,
   * vectors and precomputed norms. Pair dedup again needs NO stream
   * state: a matching chunk is a chunk where the XOR of the two codes
   * is all-zero, so the FIRST matching chunk is recomputable at join
   * time (`array_position` over the per-chunk zero tests — no dynamic
   * shifts) and each pair is emitted exactly once. Exact-cosine
   * residual as a projection. Stateless, append mode.
   */
  def crossEmbeddingNearDupStream(stream: DataFrame, idCol: String,
                                  vecCol: String, evalEmb: DataFrame,
                                  evalIdCol: String, evalVecCol: String,
                                  planes: Array[Array[Int]], codeRadius: Int,
                                  threshold: Double): DataFrame = {
    import graft.operators.Similarity
    val nChunks = codeRadius + 1
    val nBits = planes.length
    require(nBits >= nChunks, "need at least codeRadius+1 code bits")
    val width = nBits / nChunks
    def chunkBits(code: Column, i: Int): Column =
      if (i == nChunks - 1) shiftrightunsigned(code, i * width)
      else shiftrightunsigned(code, i * width).bitwiseAND((1L << width) - 1)
    def chunkKeys(code: Column) = array((0 until nChunks).map(i =>
      struct(lit(i).as("i"), chunkBits(code, i).as("bits"))): _*)

    val eval = evalEmb.select(col(evalIdCol).as("eval_id"),
        col(evalVecCol).as("__ev"),
        Similarity.signCode(col(evalVecCol), planes).as("__ec"),
        sqrt(Similarity.dot(col(evalVecCol), col(evalVecCol))).as("__en"))
      .select(col("eval_id"), col("__ev"), col("__ec"), col("__en"),
        explode(chunkKeys(col("__ec"))).as("__eck"))

    val s = stream.select(col(idCol).as("__sid"), col(vecCol).as("__sv"),
        Similarity.signCode(col(vecCol), planes).as("__sc"),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__sn"))
      .select(col("__sid"), col("__sv"), col("__sc"), col("__sn"),
        explode(chunkKeys(col("__sc"))).as("__ck"))

    val xorc = col("__sc").bitwiseXOR(col("__ec"))
    val firstMatch = array_position(
      array((0 until nChunks).map(i => chunkBits(xorc, i) === lit(0L)): _*),
      true)
    s.join(broadcast(eval), col("__ck") === col("__eck"))
      .filter(bit_count(xorc) <= codeRadius &&
        firstMatch === col("__ck.i").cast("long") + 1L)
      .select(col("__sid").as(idCol), col("eval_id"),
        (Similarity.dot(col("__sv"), col("__ev")) /
          (col("__sn") * col("__en"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * Streaming per-key latest state (ST8 / A1): `mapGroupsWithState`
   * keeping, per key, the record that ranks highest under `newer`.
   * Emits the updated state for every key touched by a micro-batch
   * (update output mode); state survives restarts via the checkpoint.
   *
   * `newer(a, b)` must be a strict total order ("a strictly newer than
   * b") including a unique tie-breaker, mirroring the determinism
   * contract of `Relational.latestStatePerKey`.
   *
   * State at scale: exactly one record per key — the same footprint a
   * compacted topic holds in the reference. For unbounded key spaces add
   * a TTL via `GroupStateTimeout` in a wrapper.
   */
  def latestStateStream[K, T](ds: Dataset[T])(key: T => K)(newer: (T, T) => Boolean)(
      implicit ke: Encoder[K], te: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)
      .mapGroupsWithState[T, T](GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          var cur = state.getOption.getOrElse(null.asInstanceOf[T])
          rows.foreach { r =>
            if (cur == null || newer(r, cur)) cur = r
          }
          state.update(cur)
          cur
      }

  /**
   * Streaming SCD Type-2 (the continuous twin of `Relational.scd2`):
   * each arriving change CLOSES the key's previous open version —
   * emitting it with its now-known `[validFrom, validTo)` interval —
   * and becomes the new open version held in state. Only closed
   * versions are emitted (append semantics); the current version of
   * every key lives in state until its next change, exactly like the
   * warehouse table's `valid_to IS NULL` row.
   *
   * Ordering contract: changes must arrive per-key in `order`
   * (changelog order — what a keyed topic partition guarantees in the
   * reference); within one micro-batch the rows are sorted by `order`
   * before chaining, and an out-of-order arrival ACROSS batches fails
   * loudly rather than emitting a negative interval.
   *
   * State at scale: exactly one open version per key — the
   * latest-state footprint.
   */
  def scd2Stream[K, T](ds: Dataset[T])(key: T => K)(order: T => Long)(
      implicit ke: Encoder[K], te: Encoder[T],
      oe: Encoder[(T, Long)]): Dataset[(T, Long)] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, (T, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[T]) =>
          val sorted = rows.toIndexedSeq.sortBy(order)
          var open = state.getOption.getOrElse(null.asInstanceOf[T])
          val closed = IndexedSeq.newBuilder[(T, Long)]
          sorted.foreach { r =>
            if (open != null) {
              require(order(r) >= order(open),
                s"scd2Stream: out-of-order change for key $k " +
                  s"(${order(r)} after ${order(open)})")
              closed += ((open, order(r))) // [from, to): to = successor's order
            }
            open = r
          }
          if (open != null) state.update(open)
          closed.result().iterator
      }

  /**
   * Stream-static BPE tokenizer — serving the trained tokenizer online
   * (the third leg of train q105 → apply q106 → serve): `merges` is
   * the TRAINED merge table (`merge_round`, `pair`); it collapses to
   * one broadcast ordered array, and each arriving document tokenizes
   * in-row — every word folds through the merges in training order via
   * the same input-forward non-overlapping `replace` the trainer used.
   * No explode, no shuffle, no state; append-mode safe. Scoring the
   * training corpus reproduces q106's counts exactly (per-word-type
   * application times multiplicity = per-occurrence application).
   *
   * Output: `idCol`, `keep`, `n_words`, `n_bpe_tokens`.
   */
  def bpeTokenizeStream(docs: DataFrame, idCol: String, textCol: String,
                        merges: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val out = (idCol +: keep).distinct
    val m = merges.agg(
      array_sort(collect_list(struct(col("merge_round"), col("pair"))))
        .as("__ms"))
    val ws = filter(split(lower(trim(col(textCol))), " "), t => t =!= "")
    def bpeCount(w: Column): Column = {
      val init = concat(lit(" "),
        array_join(filter(split(w, ""), c => c =!= ""), " "), lit(" "))
      val merged = aggregate(col("__ms"), init, (acc, mm) =>
        replace(acc,
          concat(lit(" "), mm.getField("pair"), lit(" ")),
          concat(lit(" "), replace(mm.getField("pair"), lit(" "), lit("")),
            lit(" "))))
      size(filter(split(trim(merged), " "), x => x =!= "")).cast("long")
    }
    docs.crossJoin(broadcast(m))
      .select(out.map(col) :+
        size(ws).cast("long").as("n_words") :+
        aggregate(transform(ws, w => bpeCount(w)), lit(0L), _ + _)
          .as("n_bpe_tokens"): _*)
      .filter(col("n_words") > 0)
  }

  /** One emission of [[profileStream]]: the key, its running dense
    * bucket vector, and the cumulative event count (monotone — the
    * row with the key's max `n_events` is its latest profile). */
  case class ProfileUpdate(key: Long, vec: Seq[Double], n_events: Long)

  /**
   * Running activity profiles — the streaming twin of
   * `Similarity.activityProfiles`: each key's dense `buckets`-dim
   * vector of per-bucket value sums, updated as events arrive
   * (`mapGroupsWithState`, one emission per key per micro-batch).
   *
   * Exactness contract: state holds the per-bucket sums as DECIMALS
   * (exact, order-independent — the same arithmetic the batch
   * operator's DECIMAL aggregation performs), and the emitted vector
   * converts to double once per emission. Replaying a corpus through
   * the stream therefore lands on bit-identical vectors to the batch
   * operator, regardless of batch boundaries.
   *
   * State at scale: `buckets` decimals + one long per key — bounded by
   * the keyspace, RocksDB-backed past executor heap like any ST8 op.
   */
  def profileStream(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, buckets: Int = 24,
                    bucketOf: Column => Column = hour(_)): Dataset[ProfileUpdate] = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(col(keyCol).cast("long").as("__k"),
        bucketOf(col(tsCol)).cast("int").as("__h"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      // Null ts/value rows would NPE in the primitive-Int encoder /
      // BigDecimal ctor; the batch twin never sees them either.
      .where(col("__k").isNotNull && col("__h").isNotNull && col("__v").isNotNull)
      .as[(Long, Int, java.math.BigDecimal)]
    prepared
      .groupByKey(_._1)
      .mapGroupsWithState[(Seq[scala.math.BigDecimal], Long), ProfileUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Int, java.math.BigDecimal)],
         state: GroupState[(Seq[scala.math.BigDecimal], Long)]) =>
          val (sums0, n0) = state.getOption.getOrElse(
            (Seq.fill(buckets)(scala.math.BigDecimal(0)), 0L))
          val sums = sums0.toArray
          var n = n0
          rows.foreach { case (_, h, v) =>
            // Drop out-of-range buckets exactly like the batch twin
            // (Similarity.activityProfiles), keeping the twins replay-
            // identical for any bucketOf; counts only in-range rows.
            if (h >= 0 && h < buckets) {
              sums(h) = sums(h) + scala.math.BigDecimal(v)
              n += 1
            }
          }
          state.update((sums.toSeq, n))
          ProfileUpdate(key, sums.map(_.toDouble).toSeq, n)
      }
  }

  /** One closed window of [[driftMonitorStream]]: window start (epoch
    * ms), total token count, IN-MARGINAL distinct token types
    * (`n_vocab` — the exact analogue of batch `sliceDivergence`'s
    * n_vocab, which joins on the marginal before counting),
    * out-of-marginal token occurrences (`n_oov`) and distinct types
    * (`n_oov_vocab`), and the window's KL divergence from the
    * reference marginal. */
  case class DriftWindow(window_start: Long, n_toks: Long, n_vocab: Long,
                         n_oov: Long, kl: Double, n_oov_vocab: Long)

  /**
   * Windowed corpus-drift monitor — the streaming twin of q101's
   * `CorpusLM.sliceDivergence`, with the slice = an event-time tumbling
   * window and the corpus marginal a SUPPLIED static table (e.g.
   * yesterday's corpus token counts — the crawl-ops alarm that fires
   * when a feed's token mix shifts mid-day).
   *
   * Token counts accumulate per open window in `flatMapGroupsWithState`
   * state (vocabulary-bounded — the same fits-an-executor contract as
   * the broadcast `*Against` twins); when the watermark passes the
   * window end, the event-time timeout fires exactly once, the KL
   * computes against the marginal, and the state drops. Tokens absent
   * from the marginal are counted in `n_oov` and excluded from the KL
   * (sliceDivergence's no-smoothing contract assumes slice ⊂ corpus;
   * the stream can't). The arithmetic replays sliceDivergence's exactly
   * — per-term doubles in the same op shape, HALF_UP rounding to 6 dp,
   * exact decimal summation, final HALF_UP round to 4 — so scoring the
   * reference corpus itself through the stream reproduces the batch
   * report row for row.
   *
   * @param marginal token → corpus count (the static reference)
   * @param windowMs tumbling window width in event-time milliseconds
   */
  def driftMonitorStream(docs: DataFrame, tsCol: String, textCol: String,
                         marginal: Map[String, Long], windowMs: Long,
                         watermarkDelay: String): Dataset[DriftWindow] = {
    require(windowMs > 0, "windowMs must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val nc = marginal
    val ncTotal = marginal.values.sum
    // watermark AFTER the projection: declaring it on tsCol and then
    // projecting would drop the watermarked attribute and fail the
    // event-time-timeout analysis check
    val toks = docs
      .select(col(tsCol).cast("timestamp").as("__ts"),
        filter(split(lower(trim(col(textCol))), " "), t => t =!= "").as("__w"))
      .withWatermark("__ts", watermarkDelay)
      .as[(java.sql.Timestamp, Seq[String])]

    def round6(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)

    toks
      .groupByKey { case (ts, _) => ts.getTime / windowMs * windowMs }
      .flatMapGroupsWithState[Map[String, Long], DriftWindow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, rows: Iterator[(java.sql.Timestamp, Seq[String])],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val ns = counts.filter { case (t, _) => nc.contains(t) }
            val nsTotal = ns.values.sum
            val oov = counts.collect { case (t, n) if !nc.contains(t) => n }.sum
            val sum = ns.foldLeft(java.math.BigDecimal.ZERO) {
              case (acc, (t, n)) =>
                // the exact sliceDivergence term shape: (ns/Ns)·ln(ns·Nc/(nc·Ns))
                val term = (n.toDouble / nsTotal) *
                  math.log((n * ncTotal).toDouble / (nc(t) * nsTotal).toDouble)
                acc.add(round6(term))
            }
            val kl = java.math.BigDecimal.valueOf(sum.doubleValue)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
            Iterator.single(DriftWindow(windowStart,
              counts.values.sum, ns.size.toLong, oov, kl,
              (counts.size - ns.size).toLong))
          } else {
            var counts = state.getOption.getOrElse(Map.empty[String, Long])
            rows.foreach { case (_, ws) =>
              ws.foreach { t => counts = counts.updated(t, counts.getOrElse(t, 0L) + 1L) }
            }
            state.update(counts)
            // fire when the watermark passes the window end
            state.setTimeoutTimestamp(windowStart + windowMs)
            Iterator.empty
          }
      }
  }

  /** One row of [[coActivityProfileStream]]'s per-window profile:
    * `partner` is `key`'s rank-`rank` co-active partner in the window
    * starting at `window_start` (epoch ms). */
  case class CoActivity(window_start: Long, key: String, partner: String,
                        n_events: Long, rank: Int)

  /**
   * Streaming windowed co-activity profile — the LIVE twin of
   * `Behavior.coActivityProfile` and the watermarked counterpart of
   * the q290 bounded partner profile: per tumbling event-time window,
   * each active key reports its top-`k` co-active partners ranked by
   * the partner's in-window event count (count desc, partner asc).
   *
   * State per open window (`flatMapGroupsWithState`, event-time
   * timeout): ONE key → count map of the window's active keys — the
   * top-k discipline bounds the OUTPUT at active-keys·k, and the map
   * is bounded by the window's distinct actives (the
   * fits-an-executor contract the broadcast `*Against` twins carry;
   * a pathologically hot window is the intervalOverlapPartnerTopK
   * hot-bucket caveat in window form). When the watermark passes the
   * window end the timeout fires exactly once, every key's profile
   * emits, and the state drops — append-safe, exactly-once per
   * window.
   *
   * Keys compare AS STRINGS (cast once, both gears) so the
   * rank tie-break is one binary collation in Spark, in this Scala
   * sort, and in an external SQL oracle. Per key, the global
   * (count desc, partner asc) order with the key itself filtered out
   * IS its partner ranking — one sort serves every key in the window.
   */
  def coActivityProfileStream(events: DataFrame, keyCol: String,
                              tsCol: String, windowMs: Long, k: Int,
                              watermarkDelay: String): Dataset[CoActivity] = {
    require(windowMs > 0, "windowMs must be positive")
    require(k >= 1, "k must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events
      .select(col(tsCol).cast("timestamp").as("__ts"),
        col(keyCol).cast("string").as("__k"))
      .withWatermark("__ts", watermarkDelay)
      .as[(java.sql.Timestamp, String)]
    rows
      .groupByKey { case (ts, _) => ts.getTime / windowMs * windowMs }
      .flatMapGroupsWithState[Map[String, Long], CoActivity](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, it: Iterator[(java.sql.Timestamp, String)],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val ranked = counts.toSeq.sortBy { case (p, n) => (-n, p) }
            counts.keysIterator.toSeq.sorted.iterator.flatMap { u =>
              ranked.iterator.filter(_._1 != u).take(k).zipWithIndex.map {
                case ((p, n), i) => CoActivity(windowStart, u, p, n, i + 1)
              }
            }
          } else {
            var counts = state.getOption.getOrElse(Map.empty[String, Long])
            it.foreach { case (_, u) =>
              counts = counts.updated(u, counts.getOrElse(u, 0L) + 1L)
            }
            state.update(counts)
            state.setTimeoutTimestamp(windowStart + windowMs)
            Iterator.empty
          }
      }
  }

  /** One admission verdict from [[domainCapStream]]: the row with
    * ordinal `ordinal` under key `key` is admitted iff `kept`. */
  case class CapVerdict(key: String, ordinal: Long, kept: Boolean)

  /** One emission of [[touchAttributionStream]]: a conversion's
    * attribution verdict under both models. */
  case class TouchVerdict(key: String, ordinal: Long, first_touch: String,
                          last_touch: String)

  /**
   * Streaming first/last-touch attribution — the continuous twin of
   * `Behavior.touchAttribution`: each arriving conversion is credited
   * immediately from TWO strings of per-user state (the user's first
   * and most recent non-conversion touch so far) instead of a
   * windowed replay. Under the house ordered-replay contract (per-key
   * (ts, ordinal) order; intra-batch rows are sorted), the verdict
   * stream aggregates to exactly the batch report — StreamingSpec
   * pins it. Touchless conversions report `(none)`, matching batch.
   *
   * State per user: two strings, forever — the cheapest ST8 state in
   * the repo; RocksDB-backed like any other.
   */
  def touchAttributionStream(df: DataFrame, keyCol: String,
                             ordinalCol: String, typeCol: String,
                             convType: String): Dataset[TouchVerdict] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(ordinalCol).cast("long").as("__o"),
        col(typeCol).cast("string").as("__t"))
      .where(col("__k").isNotNull && col("__o").isNotNull &&
        col("__t").isNotNull)
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[String], Option[String]), TouchVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, String)],
         state: GroupState[(Option[String], Option[String])]) =>
          var (first, last) = state.getOption.getOrElse(
            (Option.empty[String], Option.empty[String]))
          val out = rows.toArray.sortBy(_._2).flatMap { case (_, o, t) =>
            if (t == convType)
              Some(TouchVerdict(key, o, first.getOrElse("(none)"),
                last.getOrElse("(none)")))
            else {
              if (first.isEmpty) first = Some(t)
              last = Some(t)
              None
            }
          }
          state.update((first, last))
          out.iterator
      }
  }

  /** One emission of [[logHistStream]]: the group's count and current
    * rank-query lower bounds after a micro-batch. */
  case class QuantileUpdate(key: String, n: Long, p50: Long, p90: Long,
                            p99: Long)

  /**
   * Streaming quantile serving — the continuous twin of
   * `Sketch.logHistSketch`/`logHistQuantiles`: per key, the
   * DDSketch-shaped log-histogram lives as `mapGroupsWithState` state
   * (≤ ~64·8 (b, q) → count entries — bounded for any stream length)
   * and p50/p90/p99 lower bounds re-emit after every micro-batch.
   * Bucket updates use the SAME pure integer programs as the batch
   * column expressions (`Sketch.logBucketOf`/`logQuantileOf` — bit
   * length, floor divisions, ⌈φ·N⌉ rank walk), so after any replay
   * the last emission per key EQUALS the batch rank query exactly
   * (StreamingSpec pins it). Order-independent: histogram adds
   * commute.
   */
  def logHistStream(df: DataFrame, keyCol: String,
                    valueCol: String): Dataset[QuantileUpdate] = {
    import graft.operators.Sketch
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__k").isNotNull && col("__v").isNotNull && col("__v") >= 0L)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[(Int, Long), Long], QuantileUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[(Int, Long), Long]]) =>
          var h = state.getOption.getOrElse(Map.empty[(Int, Long), Long])
          rows.foreach { case (_, v) =>
            val bq = Sketch.logBucketOf(v)
            h = h.updated(bq, h.getOrElse(bq, 0L) + 1L)
          }
          state.update(h)
          QuantileUpdate(key, h.valuesIterator.sum,
            Sketch.logQuantileOf(h, 0.5),
            Sketch.logQuantileOf(h, 0.9),
            Sketch.logQuantileOf(h, 0.99))
      }
  }

  /** One emission of [[hllStream]]: the group's register count and
    * current cardinality estimate after a micro-batch. */
  case class HllUpdate(key: String, n_regs: Int, est_distinct: Double)

  /**
   * Streaming approximate-distinct — the continuous twin of
   * `Sketch.hllSketch`/`hllEstimate`: per key, HLL registers held as
   * `mapGroupsWithState` state (≤ 512 (reg → ρ) ints — bounded
   * regardless of stream length, RocksDB-backed like any ST8 op),
   * re-estimated after every micro-batch. Register updates use the
   * SAME pure mid-square programs as the batch column expressions
   * (`Sketch.regOf`/`rhoOf`) and the estimate replays `hllEstimate`'s
   * fixed-order double program with Spark-round semantics, so after
   * any replay (order-independent — max-fold registers commute) the
   * last emission per key EQUALS the batch estimate bit for bit
   * (StreamingSpec pins it).
   */
  def hllStream(df: DataFrame, keyCol: String,
                valueCol: String): Dataset[HllUpdate] = {
    import graft.operators.Sketch
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__k").isNotNull && col("__v").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[Int, Int], HllUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Int, Int]]) =>
          var regs = state.getOption.getOrElse(Map.empty[Int, Int])
          rows.foreach { case (_, v) =>
            val r = Sketch.regOf(v)
            val rho = Sketch.rhoOf(v)
            if (regs.getOrElse(r, 0) < rho) regs = regs.updated(r, rho)
          }
          state.update(regs)
          HllUpdate(key, regs.size, Sketch.estimateFrom(regs))
      }
  }

  /**
   * Streaming per-key crawl cap — the continuous twin of q117's
   * per-domain quota (RefinedWeb's anti-spam stage as an ingest-time
   * gate instead of a batch pass): at most `quota` rows are admitted
   * per key over the stream's lifetime, first-come in ordinal order.
   * Within a micro-batch the group's rows sort by `ordinalCol`, so a
   * replayed corpus produces identical verdicts regardless of shuffle
   * order; across batches admission is arrival-ordered — the
   * documented batch-vs-stream divergence (the batch operator ranks
   * by the portable selector hash over the WHOLE corpus, which a
   * stream cannot know; feed the stream in selector order and the
   * two match row for row, which is exactly how the spec pins it).
   *
   * State is ONE long (admitted count) per key — bytes per domain,
   * bounded by |domains|, the cheapest state shape there is. Emits a
   * verdict per row (thin: key + ordinal, never the payload);
   * admitted rows are a sink-side semi-join on (key, ordinal), the
   * same thin-verdict posture as [[chunkVerdictStream]].
   */
  def domainCapStream(df: DataFrame, keyCol: String, ordinalCol: String,
                      quota: Int): Dataset[CapVerdict] = {
    require(quota >= 1, "quota must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(ordinalCol).cast("long").as("__o"))
      .where(col("__k").isNotNull && col("__o").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, CapVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val verdicts = rows.map(_._2).toArray.sorted.map { o =>
            val keep = admitted < quota
            if (keep) admitted += 1
            CapVerdict(key, o, keep)
          }
          state.update(admitted)
          verdicts.iterator
      }
  }

  /** One emission of [[rollingZStream]] — the batch `Behavior.rollingZ`
    * row for one arriving series point. */
  case class RollingZUpdate(key: String, period_ms: Long, value: Long,
                            roll_n: Long, roll_mean: Option[Double],
                            z: Option[Double])

  /**
   * Streaming rolling-baseline anomaly flags — the continuous twin of
   * `Behavior.rollingZ`, scoring each arriving series point (an
   * already-aggregated (key, period, value) row, e.g. a closed
   * tumbling window's count) against its key's strictly-prior
   * `lookback` points. State per key is a ring buffer of ≤ `lookback`
   * (period, value) pairs — bounded, RocksDB-backed like any ST8 op.
   *
   * Exactness contract: the ring sums are exact integers (BigInt for
   * Σx², matching the batch DECIMAL(38,0) path) and the mean/var/z
   * program replays the batch operator's fixed-order double ops and
   * HALF_UP 4-dp rounds, so under ordered replay (per-key period
   * order — the same framing as [[funnelStream]]; intra-batch rows
   * are sorted) the emissions equal `Behavior.rollingZ` row for row.
   */
  def rollingZStream(points: DataFrame, keyCol: String, periodCol: String,
                     valueCol: String, lookback: Int,
                     minN: Int = 3): Dataset[RollingZUpdate] = {
    require(lookback >= minN && minN >= 2, "need lookback >= minN >= 2")
    val spark = points.sparkSession
    import spark.implicits._
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    points
      .select(col(keyCol).cast("string").as("__k"),
        unix_millis(col(periodCol).cast("timestamp")).as("__p"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__k").isNotNull && col("__p").isNotNull &&
        col("__v").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], RollingZUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Seq[(Long, Long)]]) =>
          var ring = state.getOption.getOrElse(Seq.empty[(Long, Long)])
          val out = rows.toIndexedSeq.sortBy(_._2).map { case (_, p, v) =>
            val n = ring.length
            val upd = if (n >= minN) {
              val sum = ring.iterator.map(_._2).sum
              val ss = ring.iterator.map(x => BigInt(x._2) * x._2).sum
              val mean = sum.toDouble / n
              val vr = ss.toDouble / n - mean * mean
              RollingZUpdate(key, p, v, n, Some(round4(mean)),
                if (vr > 0) Some(round4((v.toDouble - mean) / math.sqrt(vr)))
                else None)
            } else RollingZUpdate(key, p, v, n, None, None)
            ring = (ring :+ (p, v)).takeRight(lookback)
            upd
          }
          state.update(ring)
          out.iterator
      }
  }

  /** One emission of [[sessionizeStream]]: the event's key, epoch-ms
    * timestamp, and its assigned 1-based session index. */
  case class SessionLabel(key: Long, ts_ms: Long, session_idx: Long)

  /**
   * Streaming gap-based session labeling — the continuous twin of
   * `Behavior.sessionize`: each arriving event gets its key's current
   * session index, a new session opening when the gap since the key's
   * last event reaches `gapSeconds` (the same half-open boundary).
   * State per key is TWO longs (last event ms, current index); rows
   * sort by ts inside a batch, and under ordered replay (the
   * [[funnelStream]] framing) labels equal the batch operator's —
   * zero gaps never open sessions, so ties are safe on both paths.
   */
  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
                       gapSeconds: Long): Dataset[SessionLabel] = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("__k"),
        unix_millis(col(tsCol).cast("timestamp")).as("__ms"))
      .where(col("__k").isNotNull && col("__ms").isNotNull)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), SessionLabel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (last, idx) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.map(_._2).toIndexedSeq.sorted.map { ms =>
            if (idx == 0L || ms - last >= gapSeconds * 1000L) idx += 1
            last = ms
            SessionLabel(key, ms, idx)
          }
          state.update((last, idx))
          out.iterator
      }
  }

  /** One emission of [[transitionStream]]: one observed consecutive
    * (from → to) step in a key's event sequence, stamped with the
    * arriving event's epoch-ms. */
  case class Transition(key: Long, from_type: String, to_type: String,
                        ts_ms: Long)

  /**
   * Streaming event-sequence transitions — the continuous twin of
   * `Behavior.transitionMatrix`'s lag chain: each arriving event
   * (after a key's first) emits its (previous type → this type) step;
   * the downstream matrix is a plain aggregation of the emissions.
   * State per key is its last (ms, tie, type); intra-batch rows sort
   * by (ts, tie) — pass the same unique tie column as the batch
   * operator so the chain is total-ordered — and under ordered replay
   * the emitted multiset equals the batch lag chain exactly.
   */
  def transitionStream(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("__k"),
        unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
        col(tieCol).cast("long").as("__tie"),
        col(typeCol).cast("string").as("__t"))
      .where(col("__k").isNotNull && col("__ms").isNotNull &&
        col("__t").isNotNull)
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          var prev = state.getOption.orNull
          val out = rows.toIndexedSeq.sortBy(r => (r._2, r._3)).flatMap {
            case (_, ms, tie, t) =>
              val emitted =
                if (prev == null) Nil
                else List(Transition(key, prev._3, t, ms))
              prev = (ms, tie, t)
              emitted
          }
          state.update(prev)
          out.iterator
      }
  }

  /** One emission of [[funnelStream]]: the key, how many funnel steps
    * it has completed so far (`reached`, monotone — the row with the
    * key's max `reached` is its latest), and the completion epoch-ms
    * of each completed step in order. */
  case class FunnelUpdate(key: Long, reached: Int, step_ms: Seq[Long])

  /**
   * Running ordered-funnel state — the streaming twin of
   * `Behavior.funnel`: each key's chain of step-completion times,
   * advanced as events arrive (`mapGroupsWithState`, one emission per
   * key per micro-batch).
   *
   * Exactness contract: completion times are monotone and set-once —
   * step i completes at the FIRST event of type `steps(i)` strictly
   * after step i−1's completion. Within a micro-batch, a key's rows
   * are sorted by (ts, step index) before applying, so intra-batch
   * disorder is harmless; ACROSS batches the contract is ordered
   * replay (per-key event-time order, a replayed log) — the same
   * replay framing the other twins' stream==batch gates use. Under
   * it, the final state reproduces `Behavior.funnel`'s per-user
   * frames exactly: in time order, the first qualifying occurrence
   * IS the minimum qualifying occurrence.
   *
   * State at scale: at most `steps.length` longs per key — bounded by
   * the keyspace, RocksDB-backed past executor heap like any ST8 op.
   */
  def funnelStream(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): Dataset[FunnelUpdate] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val prepared = events
      .select(col(keyCol).cast("long").as("__k"),
        unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
        col(typeCol).as("__t"))
      .where(col("__k").isNotNull && col("__ms").isNotNull &&
        col("__t").isin(steps.map(lit): _*))
      .as[(Long, Long, String)]
    prepared
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], FunnelUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[Seq[Long]]) =>
          val done = state.getOption.getOrElse(Seq.empty[Long]).toBuffer
          rows.toIndexedSeq
            .sortBy { case (_, ms, t) => (ms, stepIdx(t)) }
            .foreach { case (_, ms, t) =>
              val i = stepIdx(t)
              if (i == done.length && (i == 0 || ms > done(i - 1)))
                done += ms
            }
          state.update(done.toSeq)
          FunnelUpdate(key, done.length, done.toSeq)
      }
  }

  /** One emission of [[trendFitStream]]: the group's running OLS fit
    * after a micro-batch. */
  case class TrendUpdate(key: String, n: Long, slope: Option[Double],
                         intercept: Option[Double], r2: Option[Double])

  /** One emission of [[fanoStream]]: the group's dispersion state
    * after a micro-batch, scored by the batch Fano program. */
  case class FanoUpdate(key: String, n_days: Long, n_active_days: Long,
                        total: Long, mean_micro: Long,
                        fano: Option[Double])

  /**
   * Streaming Fano factor — the continuous twin of
   * `Behavior.fanoFactor`: per key, the state is (min day, max day,
   * active-day count, Σn, Σn² as BigInt-string), ALL of which commute
   * — any arrival order of daily-count rows lands on identical state;
   * no ordered replay, no intra-batch sort. The live burstiness
   * monitor: a feed whose F jumps ≫1 mid-stream is replaying a
   * backfill through an organic tag.
   *
   * Contract: rows are (key, day index, count) DAILY-MATRIX rows,
   * each (key, day) arriving at most once (the batch operator's input
   * shape; re-sends would double-count, the cusumStream-style caller
   * contract). Gap days inside [min, max] count as exact zeros
   * through the span, exactly like the batch. Each emission replays
   * the batch double program; the last emission equals the batch row
   * bit for bit (StreamingSpec pins it under shuffled batches).
   */
  def fanoStream(df: DataFrame, keyCol: String, dayCol: String,
                 nCol: String): Dataset[FanoUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(dayCol).cast("long").as("__d"), col(nCol).cast("long").as("__n"))
      .where(col("__k").isNotNull && col("__d").isNotNull &&
        col("__n").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, String), FanoUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Long, Long, String)]) =>
          val prev = state.getOption.getOrElse(
            (Long.MaxValue, Long.MinValue, 0L, 0L, "0"))
          var (dMin, dMax, active, total) = (prev._1, prev._2, prev._3, prev._4)
          var s2 = BigInt(prev._5)
          rows.foreach { case (_, d, n) =>
            if (d < dMin) dMin = d
            if (d > dMax) dMax = d
            active += 1
            total += n
            s2 += BigInt(n) * n
          }
          state.update((dMin, dMax, active, total, s2.toString))
          val nDays = dMax - dMin + 1
          val fano =
            if (total <= 0L) None
            else {
              val num = BigInt(nDays) * s2 - BigInt(total) * total
              val den = BigInt(nDays) * total
              Some(java.math.BigDecimal
                .valueOf(num.toDouble / den.toDouble)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
            }
          FanoUpdate(key, nDays, active, total,
            total * 1000000L / nDays, fano)
      }
  }

  /** One emission of [[intervalCoverageStream]]: the key's merged
    * island state after a micro-batch, scored by the batch
    * intervalCoverage program. */
  case class CoverageUpdate(key: String, n_intervals: Long,
                            n_islands: Long, covered: Long, span: Long,
                            coverage_ppm: Long)

  /**
   * Streaming interval-union coverage — the continuous twin of
   * `Behavior.intervalCoverage`: per key, the state is the DISJOINT
   * island list itself (merged [start, end) runs, sorted) plus the
   * interval counter. Interval union is ORDER-INDEPENDENT — any
   * arrival order of the same intervals produces the identical merged
   * island set — so no ordered replay is needed; state size is the
   * ISLAND count (bounded by true gaps, not arrivals). Half-open
   * adjacency chains exactly like the batch running-max rule
   * ([a,b) + [b,c) is one island); rows with end ≤ start drop.
   *
   * Each emission reads the batch outputs straight off the island
   * list — after the same rows the emission equals the batch row
   * field for field (StreamingSpec pins it under shuffled batches).
   */
  def intervalCoverageStream(df: DataFrame, keyCol: String,
                             startCol: String,
                             endCol: String): Dataset[CoverageUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .where(col("__k").isNotNull && col("__s").isNotNull &&
        col("__e").isNotNull && col("__e") > col("__s"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[(Long, Long)]), CoverageUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Seq[(Long, Long)])]) =>
          var (nIv, islands) =
            state.getOption.getOrElse((0L, Seq.empty[(Long, Long)]))
          rows.foreach { case (_, s, e) =>
            nIv += 1
            val (hit, miss) = islands.partition { case (is, ie) =>
              is <= e && ie >= s // overlap or half-open adjacency
            }
            val ns = (s +: hit.map(_._1)).min
            val ne = (e +: hit.map(_._2)).max
            islands = ((ns, ne) +: miss).sortBy(_._1)
          }
          state.update((nIv, islands))
          val covered = islands.iterator.map { case (a, b) => b - a }.sum
          val span = islands.last._2 - islands.head._1
          CoverageUpdate(key, nIv, islands.length.toLong, covered, span,
            covered * 1000000L / span)
      }
  }

  /** One emission of [[conformalStream]]: the monitor's split-conformal
    * state after a micro-batch, scored by the batch conformalGate
    * program. */
  case class ConformalUpdate(key: String, n_cal: Long, rank: Long,
                             q_hat: Option[Long], n_test: Long,
                             covered: Long, coverage_ppm: Long,
                             target_ppm: Long)

  /**
   * Streaming split-conformal coverage monitor — the continuous twin
   * of `Eval.conformalGate`: per key, the state is TWO score
   * histograms (calibration, test) — score-cardinality-bounded like
   * the batch operator's exchanges — and histogram increments
   * COMMUTE, so any arrival order lands on identical state (no
   * ordered replay, no intra-batch sort). The live "is my conformal
   * threshold still holding its promised rate" gate: drift shows up
   * as coverage_ppm sliding under target_ppm while q̂ (re-derived
   * each emission from the CURRENT calibration histogram) chases the
   * moving distribution.
   *
   * Each emission replays the batch program exactly — integer ceil
   * rank, first-cum ≥ r over the sorted histogram, integer ppm — so
   * after the same rows the emission equals the batch row field for
   * field (StreamingSpec pins it under shuffled batches).
   */
  def conformalStream(df: DataFrame, keyCol: String, calCol: String,
                      scoreCol: String, alphaNum: Int,
                      alphaDen: Int): Dataset[ConformalUpdate] = {
    require(alphaNum >= 1 && alphaDen > alphaNum,
      "conformalStream: alpha must be in (0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val keepNum = alphaDen - alphaNum
    val targetPpm = keepNum.toLong * 1000000L / alphaDen
    df.select(col(keyCol).cast("string").as("__k"),
        col(calCol).cast("boolean").as("__c"),
        col(scoreCol).cast("long").as("__s"))
      .where(col("__k").isNotNull && col("__c").isNotNull &&
        col("__s").isNotNull)
      .as[(String, Boolean, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Map[Long, Long], Map[Long, Long]),
        ConformalUpdate](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Boolean, Long)],
         state: GroupState[(Map[Long, Long], Map[Long, Long])]) =>
          var (cal, test) = state.getOption.getOrElse(
            (Map.empty[Long, Long], Map.empty[Long, Long]))
          rows.foreach { case (_, isCal, s) =>
            if (isCal) cal = cal.updated(s, cal.getOrElse(s, 0L) + 1L)
            else test = test.updated(s, test.getOrElse(s, 0L) + 1L)
          }
          state.update((cal, test))
          val nCal = cal.valuesIterator.sum
          val r = math.min(nCal,
            ((nCal + 1) * keepNum + alphaDen - 1) / alphaDen)
          var cum = 0L
          var qHat: Option[Long] = None
          if (nCal > 0L) {
            val it = cal.toSeq.sortBy(_._1).iterator
            while (qHat.isEmpty && it.hasNext) {
              val (s, c) = it.next(); cum += c
              if (cum >= r) qHat = Some(s)
            }
          }
          val nTest = test.valuesIterator.sum
          val covered = qHat.fold(0L)(q =>
            test.iterator.collect { case (s, c) if s <= q => c }.sum)
          ConformalUpdate(key, nCal, r, qHat, nTest, covered,
            if (nTest > 0L) covered * 1000000L / nTest else 0L, targetPpm)
      }
  }

  /** One emission of [[kappaStream]]: the group's 2×2 agreement state
    * after a micro-batch, scored by the batch kappa program. */
  case class KappaUpdate(key: String, n: Long, a: Long, b: Long,
                         c: Long, d: Long, po_micro: Long,
                         kappa: Option[Double])

  /** One emission of [[mcnemarStream]]: the group's paired-gate
    * discordance state after a micro-batch, scored by the batch
    * McNemar program. */
  case class McnemarUpdate(key: String, n: Long, b: Long, c: Long,
                           chi2: Option[Double])

  /** One emission of [[sprtStream]]: the group's trial state after a
    * micro-batch, scored by the batch SPRT program. */
  case class SprtUpdate(key: String, n: Long, k: Long, llr_micro: Long,
                        decision: String)

  /**
   * Streaming SPRT — the test that was BORN sequential, served live:
   * per key the state is (n, k), two commuting counters; each
   * emission replays the batch LLR program over the SAME portable
   * micro-nat literals (`Eval.sprtConstants`), so the decision
   * column flips to accept_h1/accept_h0 at the earliest micro-batch
   * the Wald boundary is crossed. Last emission == the batch row bit
   * for bit (StreamingSpec pins it under shuffled batches —
   * counters commute even though the DECISION HISTORY is the
   * sequential object; the final state is order-free).
   */
  def sprtStream(df: DataFrame, keyCol: String, labelCol: String,
                 p0Num: Long, p0Den: Long, p1Num: Long, p1Den: Long,
                 alphaMilli: Long = 50L,
                 betaMilli: Long = 50L): Dataset[SprtUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    val (w1, w0, up, lo) = graft.operators.Eval.sprtConstants(
      p0Num, p0Den, p1Num, p1Den, alphaMilli, betaMilli)
    df.select(col(keyCol).cast("string").as("__k"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__k").isNotNull && col("__y").isNotNull)
      .as[(String, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), SprtUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Boolean)],
         state: GroupState[(Long, Long)]) =>
          var (n, k) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, y) => n += 1; if (y) k += 1 }
          state.update((n, k))
          val llr = k * w1 + (n - k) * w0
          val decision =
            if (llr >= up) "accept_h1"
            else if (llr <= lo) "accept_h0"
            else "continue"
          SprtUpdate(key, n, k, llr, decision)
      }
  }

  /** One emission of [[essStream]]: the group's weight-moment state
    * after a micro-batch, scored by the batch Kish program. */
  case class EssUpdate(key: String, n: Long, sum_w: Long, ess: Double,
                       ess_ppm: Long, cv: Option[Double])

  /**
   * Streaming effective sample size — the continuous twin of
   * `Sampling.effectiveSampleSize`: per key, the state is
   * (n, Σw, Σw²) — three commuting moments (Σw² as BigInt-in-string,
   * the trendFitStream device: unbounded-magnitude-safe, still one
   * fixed field) — so any arrival order lands on identical state.
   * The live "is my weighted mixture still worth its row count?"
   * monitor: a drifting upstream sampler skews the weights and ESS
   * collapses long before row counts move.
   *
   * Each emission replays the batch program exactly: ess_ppm =
   * ((Σw)²·10⁶) div (Σw²·n) in exact BigInt, ess and cv the same
   * fixed-order double programs with Spark-round(6) semantics.
   * Zero/negative weights are excluded, matching batch. Last
   * emission == the batch row bit for bit (StreamingSpec pins it
   * under shuffled batches).
   */
  def essStream(df: DataFrame, keyCol: String,
                weightCol: String): Dataset[EssUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__k").isNotNull && col("__w").isNotNull &&
        col("__w") > 0L)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, String), EssUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Long, String)]) =>
          var (n, sw, w2s) = state.getOption.getOrElse((0L, 0L, "0"))
          var w2 = BigInt(w2s)
          rows.foreach { case (_, w) =>
            n += 1; sw += w; w2 += BigInt(w) * w
          }
          state.update((n, sw, w2.toString))
          def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
          val sw2 = BigInt(sw) * sw
          val ess = r6(sw2.toDouble / w2.toDouble)
          val ppm = ((sw2 * 1000000) / (w2 * n)).toLong
          val cv =
            if (n < 2) None
            else Some(r6(math.sqrt(math.max(
              (BigInt(n) * w2).toDouble / sw2.toDouble - 1.0d, 0.0d))))
          EssUpdate(key, n, sw, ess, ppm, cv)
      }
  }

  /**
   * Streaming McNemar — the continuous twin of `Eval.mcnemar`: per
   * key, the state is (n, b, c) — the paired-gate discordance
   * counters, which COMMUTE, so any arrival order lands on identical
   * state. The live "would swapping gate A for gate B change the
   * keep rate?" monitor beside [[kappaStream]]'s agreement monitor —
   * kappa drifts when the gates stop agreeing; McNemar fires when
   * their DISAGREEMENTS stop being symmetric.
   *
   * Each emission replays the batch program exactly: the
   * continuity-corrected (max(|b−c|−1,0))²/(b+c) via exact BigInt
   * squares, one double division, Spark-round(6); b + c = 0 → None.
   * Last emission == the batch row bit for bit (StreamingSpec pins
   * it under shuffled batches).
   */
  def mcnemarStream(df: DataFrame, keyCol: String, gate1Col: String,
                    gate2Col: String): Dataset[McnemarUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(gate1Col).cast("boolean").as("__g1"),
        col(gate2Col).cast("boolean").as("__g2"))
      .where(col("__k").isNotNull && col("__g1").isNotNull &&
        col("__g2").isNotNull)
      .as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), McnemarUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Boolean, Boolean)],
         state: GroupState[(Long, Long, Long)]) =>
          var (n, b, c) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { case (_, g1, g2) =>
            n += 1
            if (g1 && !g2) b += 1
            else if (!g1 && g2) c += 1
          }
          state.update((n, b, c))
          val num = math.max(math.abs(b - c) - 1L, 0L)
          val chi2 =
            if (b + c == 0L) None
            else Some(java.math.BigDecimal
              .valueOf((BigInt(num) * num).toDouble / (b + c).toDouble)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
          McnemarUpdate(key, n, b, c, chi2)
      }
  }

  /**
   * Streaming Cohen's kappa — the continuous twin of
   * `Eval.cohensKappa`: per key, the state is the four 2×2 agreement
   * counters (a = both-pos, b, c, d), which COMMUTE — any arrival
   * order lands on identical state, no ordered replay, no intra-batch
   * sort. The live "are my two label sources still agreeing?" monitor
   * for a scoring pipeline whose gates can drift apart silently.
   *
   * Each emission replays the batch program exactly: κ =
   * 2(ad − bc)/((a+b)(b+d)+(a+c)(c+d)) with exact BigInt products
   * converted to double the same correctly-rounded way the batch
   * DECIMAL(38,0) casts are, one division, Spark-round(6); zero
   * denominator → None. Last emission == the batch row bit for bit
   * (StreamingSpec pins it under shuffled batches).
   */
  def kappaStream(df: DataFrame, keyCol: String, rater1Col: String,
                  rater2Col: String): Dataset[KappaUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(rater1Col).cast("boolean").as("__r1"),
        col(rater2Col).cast("boolean").as("__r2"))
      .where(col("__k").isNotNull && col("__r1").isNotNull &&
        col("__r2").isNotNull)
      .as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long), KappaUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Boolean, Boolean)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          var (a, b, c, d) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, r1, r2) =>
            if (r1 && r2) a += 1
            else if (r1) b += 1
            else if (r2) c += 1
            else d += 1
          }
          state.update((a, b, c, d))
          val num = BigInt(2) * (BigInt(a) * d - BigInt(b) * c)
          val den = (BigInt(a + b) * (b + d)) + (BigInt(a + c) * (c + d))
          val n = a + b + c + d
          val kappa =
            if (den == 0) None
            else Some(java.math.BigDecimal
              .valueOf(num.toDouble / den.toDouble)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
          KappaUpdate(key, n, a, b, c, d, (a + d) * 1000000L / n, kappa)
      }
  }

  /**
   * Streaming OLS trend — the continuous twin of `Behavior.trendFit`:
   * per key, the five moment sums live as exact integer micro-scale
   * state (values 6-dp-quantize to micro-longs; second moments are
   * BigInt-as-string — unbounded-magnitude-safe, still a fixed FIELD
   * count per key). Sums COMMUTE, so unlike the chart twins this one
   * needs no ordered replay and no intra-batch sort: any arrival
   * order lands on the identical state.
   *
   * Each emission replays trendFit's exact program: the micro-sums
   * convert to scale-6/scale-12 BigDecimals (the same values the
   * batch DECIMAL sums hold), cast to double the same correctly-
   * rounded way, and run the identical fixed-order
   * cov/vx/intercept/r² arithmetic with Spark-round(6) semantics —
   * the last emission per key equals the batch fit bit for bit
   * (StreamingSpec pins it). Inputs finer than 6 dp are the caller's
   * rounding decision (the cusumStream contract).
   */
  def trendFitStream(df: DataFrame, keyCol: String, xCol: String,
                     yCol: String): Dataset[TrendUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        round(col(xCol).cast("double"), 6).as("__x"),
        round(col(yCol).cast("double"), 6).as("__y"))
      .where(col("__k").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .select(col("__k"),
        round(col("__x") * 1e6d).cast("long").as("__xm"),
        round(col("__y") * 1e6d).cast("long").as("__ym"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, String, String, String, String, String),
        TrendUpdate](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, String, String, String, String, String)]) =>
          val prev = state.getOption.getOrElse(
            (0L, "0", "0", "0", "0", "0"))
          var n = prev._1
          var sx = BigInt(prev._2); var sy = BigInt(prev._3)
          var sxx = BigInt(prev._4); var syy = BigInt(prev._5)
          var sxy = BigInt(prev._6)
          rows.foreach { case (_, xm, ym) =>
            n += 1
            sx += xm; sy += ym
            sxx += BigInt(xm) * xm; syy += BigInt(ym) * ym
            sxy += BigInt(xm) * ym
          }
          state.update((n, sx.toString, sy.toString, sxx.toString,
            syy.toString, sxy.toString))
          def d6(v: BigInt): Double =
            new java.math.BigDecimal(v.bigInteger, 6).doubleValue
          def d12(v: BigInt): Double =
            new java.math.BigDecimal(v.bigInteger, 12).doubleValue
          def rnd6(x: Double): Double =
            java.math.BigDecimal.valueOf(x)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
          val nd = n.toDouble
          val (sxD, syD) = (d6(sx), d6(sy))
          val (sxxD, syyD, sxyD) = (d12(sxx), d12(syy), d12(sxy))
          val cov = nd * sxyD - sxD * syD
          val vx = nd * sxxD - sxD * sxD
          val vy = nd * syyD - syD * syD
          val s = cov / vx
          TrendUpdate(key, n,
            if (vx > 0d) Some(rnd6(s)) else None,
            if (vx > 0d) Some(rnd6((syD - s * sxD) / nd)) else None,
            if (vx > 0d && vy > 0d) Some(rnd6(cov * cov / (vx * vy)))
            else None)
      }
  }

  /** One emission of [[cusumStream]]: the series' control-chart
    * position after a micro-batch, plus the cumulative breach counts. */
  case class CusumUpdate(key: String, n_seen: Long, s_plus: Double,
                         s_minus: Double, n_up: Long, n_down: Long)

  /**
   * Streaming CUSUM control chart — the continuous twin of
   * `Behavior.cusum` in its online posture: the baseline `mu` is a
   * KNOWN reference (yesterday's fitted mean, an SLO), not re-fit
   * from the stream, which is exactly how a live control chart runs.
   * Per key the state is six longs (count, cumulative deviation,
   * running min/max of the prefix sum, breach counters) in exact
   * 1e-6 micro-units — bounded regardless of stream length,
   * RocksDB-backed like any ST8 op.
   *
   * Ordered-replay contract (the house twin rule): rows carry a
   * sequence column and sort within each micro-batch; feed batches in
   * order. Under that replay the last emission per key equals the
   * batch operator's final row computed with the same baseline —
   * every compare happens on exact integers, every reported statistic
   * is one long-to-double division (StreamingSpec pins it, using data
   * whose exact mean IS `mu` so the batch side fits the same
   * baseline). Values and `mu`/`h` quantize to 6 dp (micro-longs);
   * finer input precision is the caller's rounding decision.
   */
  def cusumStream(df: DataFrame, keyCol: String, seqCol: String,
                  valueCol: String, mu: Double,
                  h: Double): Dataset[CusumUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    val muMicro = math.round(mu * 1e6d)
    val hMicro = math.round(h * 1e6d)
    df.select(col(keyCol).cast("string").as("__k"),
        col(seqCol).cast("long").as("__s"),
        (col(valueCol).cast("double") * 1e6d).as("__vm"))
      .where(col("__k").isNotNull && col("__s").isNotNull &&
        col("__vm").isNotNull)
      .select(col("__k"), col("__s"),
        round(col("__vm")).cast("long").as("__v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, Long, Long), CusumUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Long, Long, Long, Long)]) =>
          var (n, cum, rmin, rmax, nUp, nDown) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L))
          rows.toIndexedSeq.sortBy(_._2).foreach { case (_, _, vm) =>
            n += 1
            cum += vm - muMicro
            rmin = math.min(rmin, cum)
            rmax = math.max(rmax, cum)
            if (cum - rmin > hMicro) nUp += 1
            if (rmax - cum > hMicro) nDown += 1
          }
          state.update((n, cum, rmin, rmax, nUp, nDown))
          CusumUpdate(key, n, (cum - rmin).toDouble / 1e6d,
            (rmax - cum).toDouble / 1e6d, nUp, nDown)
      }
  }

  /** One point of a [[survivalStream]] curve — the union of the batch
    * `kaplanMeier` and `nelsonAalen` row fields at one event time. */
  case class SurvivalPoint(t: Long, n_risk: Long, d_events: Long,
                           n_censored: Long, na_micro: Long,
                           cum_hazard: Double, surv_na: Double,
                           ln_surv: Option[Double], surv: Double)

  /** One emission of [[survivalStream]]: the group's full curve after
    * a micro-batch; `n_obs` is monotone, so the row with a key's max
    * `n_obs` carries its latest curve. */
  case class SurvivalUpdate(key: String, n_obs: Long,
                            curve: Seq[SurvivalPoint])

  /**
   * Streaming survival curves — the continuous twin of
   * `Behavior.kaplanMeier` AND `Behavior.nelsonAalen` in one emission:
   * per key, the state is a duration histogram t → (d_events,
   * n_censored) — duration-cardinality-bounded exactly like the batch
   * operators' exchanges — and histogram increments COMMUTE, so any
   * arrival order lands on identical state. Each emission replays both
   * batch programs over the CURRENT histogram: exact risk sets from
   * suffix totals, the pure-integer Nelson–Aalen micro increments
   * (d·10⁶ div n), the KM 6-dp-rounded ln terms summed in exact
   * decimals with the n == d zero-mask — so after the same rows the
   * emitted curve equals the batch rows field for field (StreamingSpec
   * pins both, under split batches). Live churn/retention curves that
   * update as spans close, no nightly rescan.
   */
  def survivalStream(df: DataFrame, keyCol: String, durationCol: String,
                     eventCol: String): Dataset[SurvivalUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    def pr6(x: Double): Double =
      math.floor(x * 1e6d + 0.5d).toLong.toDouble / 1e6d
    def rnd6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    df.select(col(keyCol).cast("string").as("__k"),
        col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__e"))
      .where(col("__k").isNotNull && col("__t").isNotNull &&
        col("__e").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[Long, (Long, Long)], SurvivalUpdate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Map[Long, (Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
          rows.foreach { case (_, t, e) =>
            val (d, c) = hist.getOrElse(t, (0L, 0L))
            hist = hist.updated(t, if (e != 0L) (d + 1L, c) else (d, c + 1L))
          }
          state.update(hist)
          val ts = hist.toSeq.sortBy(_._1)
          val total = ts.iterator.map { case (_, (d, c)) => d + c }.sum
          var before = 0L
          var naMicro = 0L
          var lnSum = java.math.BigDecimal.ZERO
          var zero = false
          val curve = Seq.newBuilder[SurvivalPoint]
          ts.foreach { case (t, (d, c)) =>
            val nRisk = total - before
            before += d + c
            if (d > 0L) {
              naMicro += d * 1000000L / nRisk
              if (nRisk == d) zero = true
              else lnSum = lnSum.add(java.math.BigDecimal.valueOf(
                rnd6(math.log((nRisk - d).toDouble / nRisk.toDouble))))
              curve += SurvivalPoint(t, nRisk, d, c, naMicro,
                naMicro.toDouble / 1e6d,
                pr6(math.exp(naMicro.toDouble / -1e6d)),
                if (zero) None else Some(lnSum.doubleValue()),
                if (zero) 0.0d else pr6(math.exp(lnSum.doubleValue())))
            }
          }
          SurvivalUpdate(key, total, curve.result())
      }
  }
}
