package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingest gate a 100 TB
  * lake runs on every arrival batch before it reaches training: each
  * rule yields one audit row `(rule, n_checked, n_violations)` and the
  * batch is admitted only when every count is zero (or under a
  * caller-side tolerance).
  *
  * Scale shape is the whole point of the API split:
  *  - ROW rules (null/range/regex/consistency predicates) all fold
  *    into ONE conditional-aggregation pass — a single scan of the
  *    fact emits every rule's violation count via
  *    `sum(when(violated, 1))`, map-side combined, then one 1-row
  *    exchange; adding a rule adds a register, not a scan (the
  *    ExpectationsSpec asserts one scan node for N rules).
  *  - UNIQUE rules need their own hash aggregation on the key (the
  *    only way to see a duplicate is to shuffle the key);
  *    over-counted keys are counted, never collected.
  *  - FK rules are a left-anti join against the (dimension-sized,
  *    AQE-broadcastable) referenced key set, then a count.
  * The audit table is rules-sized — metadata, never data.
  */
object Expectations {

  /** A row-level expectation: `violated` is true on rows breaking it.
    * Names must be identifier-shaped (`[A-Za-z_][A-Za-z0-9_]*`) —
    * they become SQL column references in the one-scan unpivot, and
    * an unquoted `-` or `'` would silently parse as arithmetic /
    * break the literal.
    */
  final case class RowRule(name: String, violated: Column) {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"rule name must be identifier-shaped, got '$name'")
  }

  /** All row rules in one scan. Output: (rule, n_checked, n_violations). */
  def auditRows(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "at least one row rule")
    val aggs = rules.flatMap { r =>
      Seq(sum(when(r.violated, 1L).otherwise(0L)).as(s"v_${r.name}"))
    } :+ count(lit(1)).as("n_checked")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide aggregate into the audit shape — stack is
    // driver-side plan surgery over a single row, not a data operation
    val pairs = rules.map(r =>
      s"'${r.name}', v_${r.name}").mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $pairs) AS (rule, n_violations)"),
      col("n_checked"))
      .select("rule", "n_checked", "n_violations")
  }

  /** Key-uniqueness expectation: rows carrying a key that occurs more
    * than once all count as violations (both of a duplicated pair).
    */
  def auditUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(
        lit(name).as("rule"),
        sum(col("_n")).as("n_checked"),
        coalesce(sum(when(col("_n") > 1, col("_n"))), lit(0L))
          .as("n_violations"))
      .select("rule", "n_checked", "n_violations")

  /** Referential-integrity expectation: fact rows whose `fkCol` value
    * has no match in `dim.pkCol` (NULL fks violate — an FK that is
    * nullable should be range-ruled separately).
    */
  def auditFk(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String, name: String): DataFrame = {
    val keys = dim.select(col(pkCol).as(fkCol)).distinct()
    val orphans = fact.select(fkCol).join(keys, Seq(fkCol), "left_anti")
    fact.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Full audit: row rules in one scan, plus any unique/FK audits. */
  def audit(rowRuleScan: DataFrame, rowRules: Seq[RowRule],
      extra: Seq[DataFrame] = Nil): DataFrame =
    extra.foldLeft(auditRows(rowRuleScan, rowRules))(_ unionByName _)
      .orderBy("rule")
}
