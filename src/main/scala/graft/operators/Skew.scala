package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. At 100 TB a handful of hot keys (a viral document
  * id, a bot user) make one shuffle partition 1000× the median and a
  * single straggler owns the job. Two standard remedies, both pure
  * plan rewrites:
  *
  *  - salted two-stage aggregation: spread each hot group over
  *    `salts` subgroups (map-side), aggregate partials, then combine —
  *    works for any decomposable aggregate;
  *  - salt-replicated join: the big side adds a random salt in
  *    [0, salts), the small side is replicated once per salt value, and
  *    the join key becomes (key, salt) — every hot-key row lands in a
  *    different partition while results stay exactly a plain join.
  *
  * AQE's skewedJoin handles moderate skew automatically
  * (GraftSession leaves it on); these are for the pathological keys
  * AQE can't split (single-key groups).
  */
object Skew {

  /** Two-stage salted sum/count. `agg` pairs are (column, alias) with
    * the aggregate applied per stage (sum-of-sums, sum-of-counts).
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16,
      seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"),
        sum("__pcnt").as("n"))
  }

  /** Salt-replicated equi-join (big ⋈ small on `key`): result rows are
    * identical to `big.join(small, key)`; only the partitioning
    * changes.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16,
      seed: Long = 42L): DataFrame = {
    val b = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
