package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Expectations.RowRule

/** Streaming data-quality expectations — the row-rule half of
  * [[graft.operators.Expectations]] running as a stateful streaming
  * aggregation, so every arrival batch updates live violation
  * counters instead of waiting for a batch audit.
  *
  * Streams exactly (the StreamSketch/StreamDrift/StreamCdc theorem):
  * state is one (n_checked, n_violations) counter pair per RULE — a
  * bounded key domain with order-free sum merges — so the drained
  * stream equals the batch `auditRows` of the same rows bit-for-bit
  * (StreamExpectationsSpec). The rules ride the same `RowRule`
  * values as batch, so gate definitions cannot fork between the
  * ingest path and the backfill path.
  *
  * Unique/FK audits deliberately stay batch-side: uniqueness over an
  * unbounded stream is unbounded state by definition — run those on
  * the compacted table, not the feed.
  */
object StreamExpectations {

  /** Live audit state: (rule, n_checked, n_violations), one row per
    * rule. Update/complete output modes.
    */
  def auditCounters(stream: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "at least one row rule")
    val ruleRows = explode(array(rules.map(r =>
      struct(lit(r.name).as("rule"),
        when(r.violated, 1L).otherwise(0L).as("v"))): _*))
    stream.select(ruleRows.as("x"))
      .groupBy(col("x.rule").as("rule"))
      .agg(count(lit(1)).as("n_checked"), sum("x.v").as("n_violations"))
  }
}
