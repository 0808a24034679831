package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Survival

/** Streaming Kaplan–Meier retention: the per-user activity extents of
  * [[graft.operators.Survival.kaplanMeier]] maintained as a stateful
  * streaming aggregation, finished to the censoring-aware survival
  * curve per micro-batch — live churn monitoring where each arriving
  * event merely widens its user's (first, last) extent.
  *
  * Why this is safe to stream (the house argument): state is one
  * (min first_s, max last_s) row per user, and min/max are order-free
  * merges, so Spark's incremental streaming agg maintains exactly the
  * batch extents regardless of micro-batch boundaries. The curve
  * finish ([[Survival.kaplanMeierFromExtents]]) is shared arithmetic
  * with the batch operator, so the drained state finishes to the
  * BIT-EXACT batch curve of the same rows — StreamSurvivalSpec proves
  * batch ≡ streaming, the house requirement for every streaming
  * operator. State is O(users): for unbounded user populations pair
  * with state TTL at the retention horizon (a user quiet past the
  * horizon is a decided churner — their extent row no longer moves
  * the curve's head).
  */
object StreamSurvival {

  /** Streaming per-user extent state (user, first_s, last_s);
    * update/complete output modes.
    */
  def userExtents(stream: DataFrame, userCol: String,
      tsSec: Column): DataFrame =
    Survival.userExtents(stream, userCol, tsSec)

  /** Finish drained state to the survival curve — identical output to
    * the batch `Survival.kaplanMeier` on the same rows.
    */
  def curveFrom(state: DataFrame, censorGapDays: Int): DataFrame =
    Survival.kaplanMeierFromExtents(state, censorGapDays)
}
