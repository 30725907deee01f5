package graft

import org.scalatest.matchers.should.Matchers

/**
 * Physical-plan regression tests (SURVEY §4): the plan PROPERTIES each
 * query's 100 TB posture depends on, pinned under `sbt test` so a
 * refactor that silently trades them away (a lost pushdown, a join that
 * degrades to a nested loop, a vanished broadcast) fails here rather
 * than surfacing as a bench regression three rounds later.
 */
class PlanQualitySpec extends SparkTestBase with Matchers {

  private def plan(q: Queries.Q): String =
    q(spark, sf0001).queryExecution.executedPlan.toString

  // Queries whose BroadcastNestedLoopJoin is a deliberate tiny-side
  // broadcast — the ONE list shared with the PlanAudit dev tool.
  private def intentionalBnl = PlanAudit.intentionalBnl

  test("no query plans a CartesianProduct; BNL joins only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf0001).queryExecution.executedPlan.toString
      val flags =
        (if (p.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (p.contains("BroadcastNestedLoopJoin") && !intentionalBnl(name))
          Seq("BroadcastNestedLoopJoin") else Nil)
      if (flags.isEmpty) None else Some(s"$name: ${flags.mkString(",")}")
    }
    offenders shouldBe empty
  }

  // Inspect the exchange CHILD's output (the shuffled payload), not the
  // Exchange plan line — that line prints only partitioning keys, so a
  // wide column travelling as payload would slip past a string match.
  //
  // Plans are prepared with AQE OFF and inspected via executedPlan:
  // sparkPlan is the tree BEFORE EnsureRequirements, so join/aggregate
  // exchanges don't exist in it yet (the audit's pre-r9 form inspected
  // sparkPlan and therefore only ever saw explicit repartitions), and
  // with AQE on the executedPlan is an AdaptiveSparkPlanExec whose
  // inner tree collect() can't traverse.
  //
  // Wide = BinaryType (blobs are never legitimate shuffle cargo here),
  // or a String / Array(String) column whose name is in the corpus-
  // payload vocabulary below (the audit's old form only knew `text`,
  // so a refactor that started shuffling `bytes`/`frame`/`props` was
  // invisible). Columns that ARE the partitioning key are exempt by
  // construction: a groupBy(token) cannot avoid shuffling the token —
  // that covers portableSimhashCodes' intentional `__t` vote shuffle,
  // where the token is the key, never dead payload.
  // Round-robin fan-out of an under-split SMALL input is exempt by
  // design (Tables.fanOut — a no-op on real layouts).
  private def widePayloadOffenders(
      extraConfs: Seq[(String, String)],
      whitelist: Set[(String, String)]): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, BinaryType, StringType}
    val wideNames = Set("text", "bytes", "frame", "props", "body", "payload",
      "content", "line", "value", "tok", "tokens", "sh", "shingle", "shingles",
      "gram", "grams")
    def isWide(a: org.apache.spark.sql.catalyst.expressions.Attribute): Boolean =
      a.dataType match {
        case BinaryType => true
        case StringType | ArrayType(StringType, _) =>
          wideNames(a.name.toLowerCase.stripPrefix("__"))
        case ArrayType(BinaryType, _) => true
        case _ => false
      }
    // A partial aggregation's buffer attributes (`buf`, BinaryType for
    // object aggs like collect_list) ARE the exchange's minimal content
    // — map-side combine already ran, and what shuffles is the agg
    // state itself, not dead payload. Exempt them — UNLESS the
    // aggregate's own input references a wide column (collect_list over
    // `text` smuggles the corpus through the buffer; that must flag).
    def exemptBufferIds(child: org.apache.spark.sql.execution.SparkPlan)
        : Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      child match {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
          a.aggregateExpressions
            .filter(!_.aggregateFunction.references.exists(isWide))
            .flatMap(ae => ae.aggregateFunction.aggBufferAttributes ++
              ae.aggregateFunction.inputAggBufferAttributes)
            .map(_.exprId).toSet
        case _ => Set.empty
      }
    val confs = ("spark.sql.adaptive.enabled" -> "false") +: extraConfs
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val sp = fn(spark, sf0001).queryExecution.executedPlan
        sp.collect {
          case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
            val keyIds = e.outputPartitioning.asInstanceOf[HashPartitioning]
              .expressions.flatMap(_.references.map(_.exprId)).toSet
            val bufIds = exemptBufferIds(e.child)
            e.child.output
              .filterNot(a => keyIds.contains(a.exprId) || bufIds.contains(a.exprId))
              .filter(isWide)
              .map(a => (name, a.name))
        }.flatten.filterNot(whitelist).distinct
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no hash exchange carries a wide string/binary column as NON-KEY payload") {
    // (query, column) pairs reviewed and accepted as intentional
    widePayloadOffenders(Nil, whitelist = Set.empty) shouldBe empty
  }

  test("wide-payload audit holds with size-based broadcast DISABLED (100x-scale posture)") {
    // The pass above runs under normal planning, where a corpus-sized
    // build side can still slip under autoBroadcastJoinThreshold at
    // test scale and plan as BHJ — hiding the SMJ text-shuffle it
    // becomes at 100x the data. Planning with the size heuristic OFF
    // makes every non-hinted join take its at-scale shape, so joins
    // that are broadcast-at-test-scale-only surface here. Explicit
    // broadcast() hints survive (they mark sides that are BOUNDED at
    // scale — vocab tables, centroid rows, eval dictionaries — which
    // is exactly the distinction this audit enforces).
    //
    // Reviewed intentional entries ONLY where moving the wide column
    // is the query's actual output contract (none currently).
    widePayloadOffenders(
      Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
      whitelist = Set.empty) shouldBe empty
  }

  test("q03: the date predicate is pushed into the parquet scan") {
    val p = plan(Queries.q03)
    p should include("PushedFilters")
    p should include regex "PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*\\]"
  }

  test("q01: the scan reads only the projected columns") {
    val p = plan(Queries.q01)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    readSchema should include("l_orderkey")
    readSchema should include("l_linenumber")
    // a pruned scan must not drag the wide columns along
    readSchema should not include "l_comment"
    readSchema should not include "l_extendedprice"
  }

  test("q07: the dim side joins via broadcast hash join") {
    plan(Queries.q07) should include("BroadcastHashJoin")
  }

  test("q18: top-k plans as TakeOrderedAndProject, not a global sort") {
    plan(Queries.q18) should include("TakeOrderedAndProject")
  }

  test("q74: corpus n-gram top-k combines map-side and takes k, no total sort") {
    val p = plan(Queries.q74)
    p should include("TakeOrderedAndProject")
    // partial aggregation before the exchange: the shuffle carries
    // (gram, count) — vocabulary-bounded, not token-count-bounded
    p should include("partial_count")
  }

  test("q11: the range join is a bucketed equi-join, not a nested loop") {
    val p = plan(Queries.q11)
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q20 scalar pipeline and q27's native DotProduct run inside whole-stage codegen") {
    // The no-UDF policy's payoff: scalar chains fuse into generated
    // code, including graft.functions.DotProduct (doGenCode) — a
    // CodegenFallback expression in the hot path would break the span.
    // AQE defers codegen insertion to per-stage runtime, so inspect the
    // statically-prepared plan with AQE off.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // codegen'd operators print with the `*(n)` span marker
      plan(Queries.q20) should include regex "\\*\\(\\d+\\) (Project|Filter)"
      plan(Queries.q27) should include regex "\\*\\(\\d+\\) Project"
    } finally spark.conf.set(key, prev)
  }
}
