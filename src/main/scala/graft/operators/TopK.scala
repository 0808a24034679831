package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, AttributeReference, SortOrder}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{TopKPerGroup, TopKPerGroupStrategy}

/** DataFrame entry point for the custom top-k-per-group plan
  * (graft.plans.TopKPerGroup): heap-based partial/final phases instead
  * of WindowExec's full per-partition sort.
  *
  *   TopK.perGroup(events, Seq("user_id"),
  *     Seq(col("value").desc, col("event_id")), k = 3)
  *
  * appends a dense rank column (1..k within each group, in the given
  * order). Ties must be broken by the ordering itself for
  * deterministic output — pass a total order, as you would for
  * row_number.
  */
object TopK {
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      rankName: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    GraftColumnBridge.addStrategy(spark, TopKPerGroupStrategy)
    val plan = GraftColumnBridge.analyzed(df)
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerGroup: no column '$name' in ${plan.output.map(_.name)}"))
    val so = orderBy.map { c =>
      val raw = GraftColumnBridge.toCatalystExpr(c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      }
      raw.transform {
        case u: UnresolvedAttribute => attr(u.nameParts.last)
      }.asInstanceOf[SortOrder]
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftColumnBridge.toDF(spark,
      TopKPerGroup(groupCols.map(attr), so, k, rankAttr, plan))
  }
}
