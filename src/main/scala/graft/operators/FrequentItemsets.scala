package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-pair mining (the 2-itemset A-Priori round, Agrawal &
  * Srikant VLDB'94) — co-occurrence structure over baskets: which
  * items appear together more than chance. In a data pipeline this
  * is the co-occurrence feature builder (product pairs, tag pairs,
  * co-cited docs) and the input to association-rule filters.
  *
  * Scale shape IS the A-Priori insight: the candidate pair join runs
  * over baskets restricted to FREQUENT items only (monotonicity: a
  * pair can only be frequent if both items are), so the quadratic
  * per-basket blowup is bounded by the frequent-item count per
  * basket, not basket size; the item-support pass is one map-side-
  * combined agg and the frequent-item set joins back as a (small,
  * AQE-broadcastable) semi filter. Lift is exact integer micros —
  * support·N·10⁶ // (supp_a·supp_b) — no float anywhere. Long
  * capacity: support·N·10⁶ must fit 2⁶³ ⇒ support·N ≤ 9.2e12 (at
  * web scale swap the numerator to decimal; the SQL shape holds).
  */
object FrequentItemsets {

  /** Frequent co-occurring pairs with support ≥ minSupport baskets.
    * Output: (item_a, item_b, support, lift_micros), item_a < item_b.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val nB = bi.select("b").distinct().count() // one scalar to the driver
    // lift numerator support·nB·10⁶ must fit a long; support ≤ nB, so
    // nB²·10⁶ < 2⁶³ ⇔ nB ≤ 3,037,000 guarantees it for every pair.
    // Fail loudly instead of silently corrupting lift past the bound
    // (the doc's "swap the numerator to decimal" is the web-scale fix).
    require(nB <= 3037000L,
      s"frequentPairs lift_micros long arithmetic overflows past " +
        s"nB = 3,037,000 baskets (got $nB); widen the lift numerator " +
        s"to DECIMAL(38) for larger corpora (same SQL shape)")
    val freq = bi.groupBy("i").agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minSupport)
    val fbi = bi.join(freq, Seq("i"))
    val a = fbi.select(col("b"), col("i").as("item_a"),
      col("supp").as("supp_a"))
    val c = fbi.select(col("b"), col("i").as("item_b"),
      col("supp").as("supp_b"))
    a.join(c, Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b", "supp_a", "supp_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("item_a"), col("item_b"), col("support"),
        expr(s"support * $nB * 1000000 div (supp_a * supp_b)")
          .as("lift_micros"))
  }
}
