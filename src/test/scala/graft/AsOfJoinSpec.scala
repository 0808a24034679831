package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  lazy val left = Seq(
    (1L, 100L, ts(10)), // after r@5 -> match 5
    (2L, 100L, ts(20)), // after r@15 -> match 15
    (3L, 100L, ts(4)),  // before any right -> null
    (4L, 200L, ts(30)), // key with no right rows -> null
    (5L, 100L, ts(15))) // EQUAL to r@15 -> ties match
    .toDF("id", "k", "ts")

  lazy val right = Seq(
    (100L, ts(5), 1.0),
    (100L, ts(15), 2.0))
    .toDF("k", "rts", "v")

  test("latest preceding right row per key; ties match; misses null") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("matched_ts"))
        .map(_.toString), Option(r.getAs[Any]("matched_v"))))
    assert(got(0) == ((1L, Some(ts(5).toString), Some(1.0))))
    assert(got(1) == ((2L, Some(ts(15).toString), Some(2.0))))
    assert(got(2) == ((3L, None, None)))
    assert(got(3) == ((4L, None, None)))
    assert(got(4) == ((5L, Some(ts(15).toString), Some(2.0))))
  }

  test("tolerance drops stale matches") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
      toleranceSec = Some(120)) // 2 minutes
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("matched_v"))))
    assert(got(0)._2.isEmpty)        // r@5 is 5 min before l@10 -> stale
    assert(got(4)._2.contains(2.0))  // equal ts -> age 0 -> kept
  }

  test("plan: one shuffle on the key, no cartesian/range explosion") {
    val df = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
