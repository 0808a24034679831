package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times plan
  * variants of the slowest bench queries at sf0.1.
  */
object Scratch {
  def time(label: String)(f: => DataFrame): Unit = {
    val times = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label%-28s min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    Tables.lineitem(spark, d).limit(10).write.format("noop").mode("overwrite").save()

    // ---- current experiment (edit freely) ----
    {
      import graft.operators.KCore
      def parts() = {
        val sparse = Tables.lineitem(spark, d)
          .filter(col("l_linenumber") === 1)
          .select((col("l_orderkey") % 3000).as("src"),
            ((col("l_orderkey") * 7 + col("l_partkey")) % 3000).as("dst"))
        val n1 = Tables.nation(spark, d).select(col("n_nationkey"))
        val clique = n1.as("a").join(n1.as("b"),
          col("a.n_nationkey") < col("b.n_nationkey"))
          .select(col("a.n_nationkey").as("src"),
            col("b.n_nationkey").as("dst"))
        (sparse, clique)
      }
      val (sparse, clique) = parts()
      val base = sparse.filter(col("src") % 7 =!= 0).unionByName(clique)
      import spark.implicits._
      val prior = KCore.peel(base, "src", "dst", 4, 8).select("node")
        .collect().map(_.getLong(0)).toSeq.toDF("node")
      val deleted = spark.range(0, 3000).toDF().filter(col("id") % 13 === 0)
      var t0 = System.nanoTime()
      val core1 = KCore.peelAfterDeletions(base, "src", "dst", prior,
        deleted, k = 4, iters = 14).select("node")
      core1.write.format("noop").mode("overwrite").save()
      println(f"[scratch] leg1 delete peel ${(System.nanoTime()-t0)/1e9}%.1f s")
      val survivorsBase = base
        .filter(col("src") % 13 =!= 0 && col("dst") % 13 =!= 0)
      val additions = sparse.filter(col("src") % 7 === 0)
        .filter(col("src") % 13 =!= 0 && col("dst") % 13 =!= 0)
      t0 = System.nanoTime()
      KCore.peelWarm(survivorsBase.unionByName(additions), "src", "dst",
          core1, k = 4, iters = 14)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] leg2 warm peel ${(System.nanoTime()-t0)/1e9}%.1f s")
      // variant: sever core1 through a local relation before pinning
      t0 = System.nanoTime()
      val core1Local = core1.collect().map(_.getLong(0)).toSeq.toDF("node")
      KCore.peelWarm(survivorsBase.unionByName(additions), "src", "dst",
          core1Local, k = 4, iters = 14)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] leg2 warm peel (local pin) ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
