package graft

import org.apache.spark.sql.{GraftColumnBridge, GraftStatsSever}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

/** Canaries for the two same-package private-API shims (VERDICT r12
  * finding #1): both reach `private[sql]` Spark internals
  * (`LogicalRDD.copy`, `Dataset.ofRows`, `classic.ExpressionUtils`),
  * and a Spark minor bump can change their semantics SILENTLY — the
  * stats-severance hazard re-manifests as a driver stall measured in
  * minutes, not as an error. These tests fail loudly instead.
  *
  * Spark build pin: Spark 4.1.2 / Scala 2.13 (`/opt/spark/jars`,
  * recorded in SURVEY §4). On any Spark upgrade, run this suite
  * FIRST.
  */
class PrivateApiCanarySpec extends SparkSpec {

  import spark.implicits._

  test("sever: checkpoint stats read unknown-size defaults after") {
    val base = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2)
    val pre = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val cp = base.localCheckpoint()
    val unsevered = cp.queryExecution.optimizedPlan.stats.sizeInBytes
    val severedDf = GraftStatsSever.sever(cp)
    val severed = severedDf.queryExecution.optimizedPlan.stats.sizeInBytes

    // side A: an UN-severed checkpoint still carries origin stats —
    // if Spark stops propagating them, severance becomes a no-op and
    // this assert flags the change (the hazard it guards would then
    // be gone, but the helper's doc contract must be re-verified)
    assert(unsevered === pre,
      s"localCheckpoint no longer carries origin stats: $unsevered vs $pre")

    // side B: the severed copy reads the unknown-size DEFAULT
    // (spark.sql.defaultSizeInBytes = Long.MaxValue unset) — if a
    // Spark bump changes LogicalRDD.copy/originStats semantics so the
    // estimate survives, the compounding-stats driver stall returns
    assert(severed === BigInt(Long.MaxValue),
      s"severed checkpoint stats are not the unknown-size default: $severed")

    // severance must be a pure metadata rewrap: identical rows
    assert(severedDf.orderBy("id").as[(Long, Long)].collect().toSeq ===
      cp.orderBy("id").as[(Long, Long)].collect().toSeq)
  }

  test("sever: non-checkpoint plans pass through unchanged") {
    val df = spark.range(0, 10).toDF("id")
    assert(GraftStatsSever.sever(df) eq df)
  }

  test("bridge: Column -> catalyst Expression -> Column round-trip") {
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val e = GraftColumnBridge.toCatalystExpr(col("a") + col("b"))
    // the eager converter must yield a catalyst tree (serializable,
    // pattern-matchable), not a lazy ColumnNodeExpression wrapper
    assert(!e.getClass.getName.contains("ColumnNode"),
      s"toCatalystExpr returned a lazy wrapper: ${e.getClass.getName}")
    val back = GraftColumnBridge.toColumn(e)
    assert(df.select(back.as("s")).as[Long].collect().toSeq === Seq(3L, 7L))
  }

  test("bridge: sort orders convert to catalyst SortOrder (TopK path)") {
    GraftColumnBridge.toCatalystExpr(col("v").desc) match {
      case s: SortOrder => assert(s.direction === Descending)
      case other => fail(s"desc did not convert to SortOrder: $other")
    }
    GraftColumnBridge.toCatalystExpr(col("v").asc) match {
      case s: SortOrder => assert(s.direction === Ascending)
      case other => fail(s"asc did not convert to SortOrder: $other")
    }
  }

  test("bridge: analyzed plan -> DataFrame round-trip") {
    val df = Seq(("x", 1L), ("y", 2L)).toDF("k", "v")
    val plan = GraftColumnBridge.analyzed(df)
    val back = GraftColumnBridge.toDF(spark, plan)
    assert(back.orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("x", 1L), ("y", 2L)))
  }

  test("bridge: addStrategy is idempotent") {
    import graft.plans.TopKPerGroupStrategy
    GraftColumnBridge.addStrategy(spark, TopKPerGroupStrategy)
    GraftColumnBridge.addStrategy(spark, TopKPerGroupStrategy)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    assert(exp.extraStrategies.count(_ == TopKPerGroupStrategy) === 1)
  }
}
