package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape audit CLI: prints the formatted physical plan and a
  * one-line shape summary (joins/exchanges/windows/scans) for one or
  * more catalog queries — the ".explain and iterate" loop the build
  * brief prescribes, runnable as
  *
  *   sbt "runMain graft.tools.PlanAudit q_r_hybrid_rrf [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q1_agg"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val sp = graft.Queries.specs.find(_.name == n)
        .getOrElse(sys.error(s"unknown query: $n"))
      val p = sp.fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      def nodes(pat: String) =
        p.linesIterator.count(_.matches(s"""^\\(\\d+\\) $pat.*"""))
      println(s"[plan] $n" +
        s" bhj=${nodes("BroadcastHashJoin")}" +
        s" shj=${nodes("ShuffledHashJoin")}" +
        s" smj=${nodes("SortMergeJoin")}" +
        s" bnlj=${nodes("BroadcastNestedLoopJoin")}" +
        s" cartesian=${nodes("CartesianProduct")}" +
        s" topk=${nodes("TopKPerGroup")}" +
        s" window=${nodes("Window")}" +
        s" exchange=${nodes("Exchange")}" +
        s" scans=${p.linesIterator.count(_.contains("Scan parquet"))}")
      if (sys.env.get("PLAN_FULL").contains("1")) println(p)
    }
    spark.stop()
  }
}
