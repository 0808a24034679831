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
      import graft.expressions.{MinHashSig, OnePermMinHash, TextShingleHashes}
      // signature BUILD cost in isolation: classic k×n loop vs OPH
      // one-permutation + densify, same base hashes, k = 64. The
      // replica corpus multiplies docs so the scan is non-trivial.
      val docs = Tables.documents(spark, d)
      val reps = spark.range(20).select(col("id").as("rep"))
      val big = docs.crossJoin(reps)
        .select((col("doc_id") * 100 + col("rep")).as("id"), col("text"))
      time("sig classic k=64") {
        big.select(MinHashSig.ofHashes(
            array_distinct(TextShingleHashes(col("text"), 3)), 64).as("s"))
          .select(element_at(col("s"), 1).as("x")) }
      time("sig OPH k=64") {
        big.select(OnePermMinHash.ofHashes(
            array_distinct(TextShingleHashes(col("text"), 3)), 64).as("s"))
          .select(element_at(col("s"), 1).as("x")) }
      time("sig classic k=256") {
        big.select(MinHashSig.ofHashes(
            array_distinct(TextShingleHashes(col("text"), 3)), 256).as("s"))
          .select(element_at(col("s"), 1).as("x")) }
      time("sig OPH k=256") {
        big.select(OnePermMinHash.ofHashes(
            array_distinct(TextShingleHashes(col("text"), 3)), 256).as("s"))
          .select(element_at(col("s"), 1).as("x")) }
      time("pairs classic") {
        Queries.specs.find(_.name == "q_d_minhash_pairs").get.fn(spark, d) }
      time("pairs OPH") {
        Queries.specs.find(_.name == "q_d_minhash_oph").get.fn(spark, d) }
    }
    spark.stop()
  }
}
