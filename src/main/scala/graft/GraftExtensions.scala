package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{VecCosine, VecDot}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL callers —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *
  * Per SURVEY §4, the reference needs NO custom analyzer/optimizer
  * rules or planner strategies — every operator compiles to built-in
  * Catalyst constructs, and hand-authoring the joins (K2/K3
  * decorrelation) happens at DataFrame-build time, not via a Rule.
  * The extension surface is therefore function registration only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosine(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Register on an already-built session (config-time injection only
    * works for sessions constructed with spark.sql.extensions set).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      exprs => VecCosine(exprs(0), exprs(1)), "built-in")
  }
}
