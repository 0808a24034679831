package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Custom TopKPerGroup plan (logical node + strategy + two-phase
  * heap exec) vs the WindowExec rendering it replaces.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, Sf0001)
    .select("user_id", "event_id", "value")

  test("perGroup == row_number window filter, including ties and small groups") {
    val got = TopK.perGroup(events, Seq("user_id"),
      Seq(col("value").desc, col("event_id")), k = 3)
      .orderBy("user_id", "rn")
      .collect().toSeq
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val want = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("user_id", "rn")
      .collect().toSeq
    assert(got == want)
  }

  test("k larger than every group returns all rows ranked") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq(col("v").desc), k = 10)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq(("a", 2, 1), ("a", 1, 2), ("b", 5, 1)))
  }

  test("physical plan is heap partial/final + one exchange — no Window, no Sort") {
    val df = TopK.perGroup(events, Seq("user_id"), Seq(col("value").desc,
      col("event_id")), k = 3)
    df.collect() // materialize final (AQE) plan
    // AQE's toString prints Final and Initial plans; judge the Final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("Sort "))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("null ordering values rank exactly like the window (NULLS LAST on desc)") {
    val df = Seq(
      ("a", Some(3), 1L), ("a", None, 2L), ("a", Some(5), 3L),
      ("b", None, 4L), ("b", None, 5L))
      .toDF("g", "v", "id")
    val got = TopK.perGroup(df, Seq("g"), Seq(col("v").desc, col("id")), k = 2)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), r.getInt(3)))
      .toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).orderBy("g", "rn").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == want)
  }

  test("registered via SQL extensions strategy injection") {
    // session built by GraftSession already carries the strategy via
    // addStrategy; assert idempotent double-registration is safe
    val df = TopK.perGroup(events, Seq("user_id"), Seq(col("value").desc,
      col("event_id")), k = 1)
    assert(df.filter(col("rn") > 1).count() == 0)
  }

  test("GLOBAL top-k (empty grouping): AllTuples final phase agrees " +
      "with orderBy.limit, heap plan, partitioning-invariant") {
    val expect = events.orderBy(col("value").desc, col("event_id"))
      .limit(7).select("event_id").collect().map(_.getLong(0)).toSeq
    for (parts <- Seq(1, 13)) {
      val got = TopK.perGroup(events.repartition(parts), Seq.empty,
          Seq(col("value").desc, col("event_id")), k = 7)
        .orderBy("rn").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got === expect, s"parts=$parts")
    }
  }
}
