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
      // r12 sf10 spill A/B: the pair-family entries spill ~60GB at
      // sf10 under the bench's fixed shuffle.partitions=32; the same
      // plan at 256 partitions should shard the sort buffers under
      // the per-task memory and collapse the spill/wall.
      Seq("32", "256").foreach { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          Queries.specs.find(_.name == "q_d_minhash_pairs").get.fn(spark, d)
            .write.format("noop").mode("overwrite").save()
          println(f"[scratch] minhash_pairs parts=$n run$i ${(System.nanoTime()-t0)/1e9}%.1f s")
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}
