package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 build + incremental merge: version collapse, validity
  * chaining, and the merge contract (incremental ∘ split == full
  * rebuild) across several cut points on the real events table.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: a->a (collapse) ->b ->b (collapse) ->a : 3 versions
  // key 2: single event: 1 open version
  lazy val log = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
    (1L, ts("2024-01-02 00:00:00"), 11L, "a"),
    (1L, ts("2024-01-03 00:00:00"), 12L, "b"),
    (1L, ts("2024-01-04 00:00:00"), 13L, "b"),
    (1L, ts("2024-01-05 00:00:00"), 14L, "a"),
    (2L, ts("2024-01-02 12:00:00"), 20L, "x"))
    .toDF("k", "ts", "eid", "v")

  // epoch micros (java8 datetime API returns LocalDateTime from
  // collect, so compare through a deterministic long cast instead)
  private def canon(df: DataFrame): Set[(Long, Long, String, Option[Long],
      Option[Long], Boolean)] =
    df.select(col("k"), col("eid"), col("v"),
        (col("valid_from").cast("timestamp").cast("double") * 1000000L)
          .cast("long").as("vf"),
        (col("valid_to").cast("timestamp").cast("double") * 1000000L)
          .cast("long").as("vt"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5)))
      .toSet

  private def us(s: String): Option[Long] = Some(ts(s).getTime * 1000L)

  test("fromChangeLog collapses consecutive duplicates and chains validity") {
    val dim = Scd2.fromChangeLog(log, "k", "ts", "eid", "v")
    assert(canon(dim) == Set(
      (1L, 10L, "a", us("2024-01-01 00:00:00"),
        us("2024-01-03 00:00:00"), false),
      (1L, 12L, "b", us("2024-01-03 00:00:00"),
        us("2024-01-05 00:00:00"), false),
      (1L, 14L, "a", us("2024-01-05 00:00:00"), None, true),
      (2L, 20L, "x", us("2024-01-02 12:00:00"), None, true)))
  }

  test("merge == rebuild on the planted log at every cut, including " +
      "same-value collapse across the boundary and new keys") {
    val full = canon(Scd2.fromChangeLog(log, "k", "ts", "eid", "v"))
    for (cut <- Seq("2024-01-01 06:00:00", "2024-01-02 06:00:00",
        "2024-01-03 06:00:00", "2024-01-04 06:00:00",
        "2024-01-05 06:00:00")) {
      val c = ts(cut)
      val dim0 = Scd2.fromChangeLog(log.filter(col("ts") < lit(c)),
        "k", "ts", "eid", "v")
      val merged = Scd2.merge(dim0, log.filter(col("ts") >= lit(c)),
        "k", "ts", "eid", "v")
      assert(canon(merged) == full, s"cut $cut")
    }
  }

  test("merge touches only batch keys: untouched dimension rows pass " +
      "through bit-identically") {
    val dim0 = Scd2.fromChangeLog(log, "k", "ts", "eid", "v")
    val batch = Seq((2L, ts("2024-02-01 00:00:00"), 21L, "y"))
      .toDF("k", "ts", "eid", "v")
    val merged = Scd2.merge(dim0, batch, "k", "ts", "eid", "v")
    // key 1 untouched
    assert(canon(merged.filter(col("k") === 1L)) ==
      canon(dim0.filter(col("k") === 1L)))
    // key 2: old open row closed at the batch ts, new open row appended
    assert(canon(merged.filter(col("k") === 2L)) == Set(
      (2L, 20L, "x", us("2024-01-02 12:00:00"),
        us("2024-02-01 00:00:00"), false),
      (2L, 21L, "y", us("2024-02-01 00:00:00"), None, true)))
  }

  test("merge == rebuild on the real events table at two cuts") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id").as("k"), col("ts"),
        col("event_id").as("eid"), col("event_type").as("v"))
    val full = canon(Scd2.fromChangeLog(ev, "k", "ts", "eid", "v"))
    for (cut <- Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")) {
      val c = ts(cut)
      val dim0 = Scd2.fromChangeLog(ev.filter(col("ts") < lit(c)),
        "k", "ts", "eid", "v")
      val merged = Scd2.merge(dim0, ev.filter(col("ts") >= lit(c)),
        "k", "ts", "eid", "v")
      assert(canon(merged) == full, s"cut $cut")
    }
  }

  test("asOf returns the version valid at the probe instant " +
      "(half-open intervals)") {
    val dim = Scd2.fromChangeLog(log, "k", "ts", "eid", "v")
    val at1 = Scd2.asOf(dim, lit(ts("2024-01-03 00:00:00")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(at1 == Set((1L, "b"), (2L, "x"))) // boundary: new version wins
    val at2 = Scd2.asOf(dim, lit(ts("2024-01-01 00:00:00")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(at2 == Set((1L, "a"))) // key 2 not yet born
  }

  test("retentionPlan expires only versions whose validity ENDED " +
      "before the watermark; the covering version always survives") {
    val dim = Scd2.fromChangeLog(log, "k", "ts", "eid", "v")
    // watermark between key 1's v2 (ends 01-05) and the open v3:
    // v1 [01-01,01-03) and v2 [01-03,01-05) both expired; v3 kept
    val plan = Scd2.retentionPlan(dim, "k",
        lit(ts("2024-01-06 00:00:00")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(plan(1L) === ((3L, 2L)))
    assert(plan(2L) === ((1L, 0L))) // single open version, never expires
    // a watermark INSIDE v2's validity keeps v2 (as-of at wm reads it)
    val plan2 = Scd2.retentionPlan(dim, "k",
        lit(ts("2024-01-04 00:00:00")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(plan2(1L) === 1L)
  }
}
