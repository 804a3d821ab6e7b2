package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Native-function surface: registration of graft's custom Catalyst
 * expressions so they are callable from SQL text as well as the Column
 * API.
 *
 * Two entry points, same registry payload:
 *  - `spark.sql.extensions=graft.functions.GraftExtensions` (config-time,
 *    the standard `SparkSessionExtensions` hook), or
 *  - [[GraftFunctions.register]] on a live session (test/REPL-friendly).
 */
object GraftFunctions {

  private val cosineId = FunctionIdentifier("graft_cosine")
  private val cosineInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine")
  private val cosineBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"graft_cosine expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((cosineId, cosineInfo, cosineBuilder))

  /** Idempotent in-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(cosineId, cosineInfo, cosineBuilder)

  /** Column-API handle on the codegen'd kernel. Registers on the given
    * session first (idempotent), then resolves by name — Column
    * construction from a raw Expression is sealed off in Spark 4. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
