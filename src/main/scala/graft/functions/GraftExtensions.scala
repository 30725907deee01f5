package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions wiring (§2.10 extension surface): registers the
 * engine's native expressions with the SQL function registry so
 * `spark.sql("... graft_dot(a, b) ...")` resolves to the codegen'd
 * implementation — the Spark analogue of the reference's pluggable SMT
 * classes (`transforms.*.type`, reference README.md:105,215).
 *
 * Activate with `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
 * or `spark.sql.extensions=graft.functions.GraftExtensions` in any
 * deployment config — extensions compose, so this coexists with Delta/
 * Iceberg extension lists on a real cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.tokenHashFunction)
  }
}

object GraftExtensions {
  private val dotFunction = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
      DotProduct(args.head, args(1)): Expression
    })

  private val tokenHashFunction = (
    FunctionIdentifier("graft_token_hash"),
    new ExpressionInfo(classOf[TokenHash].getName, "graft_token_hash"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_token_hash(s) takes exactly 1 argument")
      TokenHash(args.head, 0L, 31L, 2147483647L): Expression
    })

  /** Same registration for an already-running session (extensions are
    * builder-time only — notebooks/tests attach post-hoc through here). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(dotFunction, tokenHashFunction).foreach { f =>
      spark.sessionState.functionRegistry
        .registerFunction(f._1, f._2, f._3)
    }
}
