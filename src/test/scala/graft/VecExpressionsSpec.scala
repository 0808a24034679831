package graft

import org.apache.spark.sql.functions._

import graft.expressions.VecExpressions._
import graft.operators.Similarity

/** Native VecDot/VecCosine vs the composable HOF fold: bitwise
  * equality on the real embeddings table (both interpreted eval and
  * codegen paths), plus type-check failures.
  */
class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine == HOF cosine bitwise on real embeddings") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pairs = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      .crossJoin(broadcast(q))
    val diff = pairs.select(
      vec_cosine(col("qvec"), col("cvec")).as("native"),
      Similarity.cosineHof(col("qvec"), col("cvec")).as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise: any ulp diff survives
      .count()
    assert(diff == 0L)
  }

  test("native d2 == HOF (x-y)^2 fold bitwise on real embeddings") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pairs = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      .crossJoin(broadcast(q))
    val hof = aggregate(
      zip_with(col("qvec"), col("cvec"),
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val diff = pairs.select(
      vec_d2(col("qvec"), col("cvec")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("native dot on double arrays and mixed literals") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).first().getDouble(0)
    assert(got == 32.0)
  }

  test("codegen path yields same result as interpreted eval") {
    val e = Tables.embeddings(spark, Sf0001).limit(50)
    val expr = vec_cosine(col("embedding"), col("embedding"))
    val viaCodegen = e.select(expr.as("c")).agg(sum("c")).first().getDouble(0)
    // force interpreted eval: wrap in a non-codegen context via collect + map
    val rows = e.select(col("embedding")).collect()
    val viaEval = rows.map { r =>
      val v = r.getSeq[Float](0).toArray
      var d = 0.0; var n = 0.0
      v.foreach { x => d += x.toDouble * x.toDouble; n += x.toDouble * x.toDouble }
      d / math.sqrt(d * n)
    }.sum
    assert(math.abs(viaCodegen - viaEval) < 1e-9)
    // self-cosine is exactly 1 for nonzero vectors
    assert(math.abs(viaCodegen - 50.0) < 1e-12)
  }

  test("type check rejects non-array inputs with a named error") {
    val df = Seq((1, 2)).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(vec_dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.contains("array"), err.getMessage)
  }
}
