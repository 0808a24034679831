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
      // r12: hot-cell radius join — the q_geo_radius_skew fixture vs
      // its uniform twin (q_geo_radius_join), wall-clock side by side.
      val pts = Queries.geoSkewPoints(spark, d)
      time("radius_skew degree profile") {
        val pr = graft.operators.Geo
          .radiusJoin(pts, "id", "lat", "lon", 50000L)
        pr.select(col("id_a").as("id"), col("dist2"))
          .union(pr.select(col("id_b").as("id"), col("dist2")))
          .groupBy("id").agg(count(lit(1)).as("n"), sum("dist2").as("s"))
      }
      time("radius_join uniform twin") {
        Queries.specs.find(_.name == "q_geo_radius_join").get.fn(spark, d)
      }
    }
    spark.stop()
  }
}
