package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{TextRepetition, TextSimHash, VecCosine, VecD2, VecDot}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL callers and its planner strategy —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *
  * Per SURVEY §4, the reference itself needs NO custom planner
  * surface — every reference operator compiles to built-in Catalyst
  * constructs. The strategy below exists for a beyond-reference
  * operator (graft.plans.TopKPerGroup, heap-based top-k-per-group)
  * whose physical shape Spark's built-ins can't produce.
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
    e.injectFunction((
      new FunctionIdentifier("vec_d2"),
      new ExpressionInfo(classOf[VecD2].getName, "vec_d2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecD2(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("text_simhash"),
      new ExpressionInfo(classOf[TextSimHash].getName, "text_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextSimHash(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("text_repetition"),
      new ExpressionInfo(classOf[TextRepetition].getName, "text_repetition"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextRepetition(exprs(0))))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
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
    reg.createOrReplaceTempFunction("vec_d2",
      exprs => VecD2(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("text_simhash",
      exprs => TextSimHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_repetition",
      exprs => TextRepetition(exprs(0)), "built-in")
  }
}
