package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}

/** Benchmark main: times every benchmark-flagged query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Uses the noop sink so
  * the full plan (all projected columns) executes — `count()` would let
  * Catalyst prune computation down to parquet row-group metadata.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    // JVM/session warmup outside the timed region (codegen, parquet
    // footer reads, broadcast machinery, shuffle + sort + agg paths —
    // without the agg/sort warmup the first timed queries absorb
    // one-time JIT cost and read ~0.3-0.7 s heavy).
    val wli = Tables.lineitem(spark, sfDir)
    wli.limit(10).write.format("noop").mode("overwrite").save()
    wli.limit(10000)
      .filter(col("l_quantity") > 1)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .orderBy("l_returnflag")
      .write.format("noop").mode("overwrite").save()

    // Optional comma-separated name filter for targeted iteration
    // (SPARK_GRAFT_ONLY=q_a,q_b); full catalog when unset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    // 2 runs per query: first run pays codegen/JIT/footer-cache noise;
    // min is the steady-state cost the cluster would see, and BOTH
    // samples ride into the artifact so round-over-round noise (the
    // documented ±8% box) is quantifiable per query, not by narrative.
    // returns (first, second) in CHRONOLOGICAL order — the artifact's
    // runs map must keep which sample was the cold one; min() is taken
    // at the use sites
    def timeBoth(name: String)(run: => Unit): (Double, Double) = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try run
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (ts(0), ts(1))
    }
    val catalogResults = Queries.specs
      .filter(sp => sp.bench && only.forall(_.contains(sp.name)))
      .map { sp =>
        sp.name -> timeBoth(sp.name) {
          sp.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
      }

    // X3 payoff pair: the SAME fact⋈fact join+agg, once over bucketed
    // catalog tables (zero-Exchange SMJ zip, SkewBucketSpec's claim)
    // and once over plain parquet. The one-off bucket write is setup,
    // not timed — at 100 TB it amortizes over every recurring join.
    // Broadcast is disabled for BOTH sides: this models the regime the
    // bucketing exists for (neither fact fits in memory), which at
    // sf0.1 a broadcast of orders would otherwise short-circuit.
    val bucketPair: Seq[(String, (Double, Double))] =
      if (only.isDefined) Seq.empty
      else {
        import org.apache.spark.sql.DataFrame
        graft.sinks.Bucketed.write(
          Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
          "bench_bx_orders", "o_orderkey", 8)
        graft.sinks.Bucketed.write(
          Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          "bench_bx_lineitem", "o_orderkey", 8)
        def joinAgg(o: DataFrame, l: DataFrame): DataFrame =
          o.join(l, Seq("o_orderkey"))
            .groupBy((col("o_orderkey") % 100).as("grp"))
            .agg(sum(col("l_quantity").cast("long")).as("qty"),
              org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("n"))
            .orderBy("grp")
        val restoreBroadcast = spark.conf.get(
          "spark.sql.autoBroadcastJoinThreshold", "10MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        val pair = try {
          Seq(
            "q_x_bucketed_join_bucketed" ->
              timeBoth("q_x_bucketed_join_bucketed") {
                joinAgg(
                  graft.sinks.Bucketed.table(spark, "bench_bx_orders"),
                  graft.sinks.Bucketed.table(spark, "bench_bx_lineitem"))
                  .write.format("noop").mode("overwrite").save()
              },
            "q_x_bucketed_join_plain" ->
              timeBoth("q_x_bucketed_join_plain") {
                joinAgg(
                  Tables.orders(spark, sfDir)
                    .select("o_orderkey", "o_totalprice"),
                  Tables.lineitem(spark, sfDir)
                    .select(col("l_orderkey").as("o_orderkey"),
                      col("l_quantity")))
                  .write.format("noop").mode("overwrite").save()
              })
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
            restoreBroadcast)
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
        pair
      }
    val results = catalogResults ++ bucketPair
    // Self-healing artifact layout: a bounded tail capture truncated
    // the round-6 record because the whole catalog rode one giant JSON
    // line (its HEAD — with the total — fell outside the window). Emit
    // redundantly: (1) one small line per query, sorted, so any capture
    // window keeps most of them; (2) the full one-line map for
    // whole-file parsers; (3) a compact total line LAST, so the tail
    // always ends with a parseable total no matter the window size.
    val sorted = results.sortBy(_._1)
    def mn(p: (Double, Double)) = math.min(p._1, p._2)
    sorted.foreach { case (k, p) =>
      println(f"""{"bench_query":"$k","sec":${mn(p)}%.3f}""")
    }
    val qs = sorted.map { case (k, p) => "\"" + k + f"\":${mn(p)}%.3f" }
      .mkString("{", ",", "}")
    // both raw samples per entry, chronological — the per-query noise
    // AND warm-up record (run 1 pays codegen/JIT; labeling the min as
    // "second" lost which sample was cold)
    val runs = sorted.map { case (k, (v1, v2)) =>
      "\"" + k + f"\":{\"first\":$v1%.3f,\"second\":$v2%.3f}" }
      .mkString("{", ",", "}")
    val total = results.map(p => mn(p._2)).sum
    val detail =
      f"""{"metric":"total_detail","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir","n_queries":${results.size}}"""
    println(detail)
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    // (4) the complete per-query record as its OWN file, immune to any
    // stdout tail window (round-7 artifact lost 38 of 109 values).
    // FULL runs default to BENCH_per_query.json in CWD; TARGETED runs
    // (SPARK_GRAFT_ONLY set) write only when SPARK_GRAFT_BENCH_OUT is
    // explicit — a filtered run must never clobber the committed
    // full-catalog artifact with a partial map.
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (only.isEmpty) Some("BENCH_per_query.json") else None)
    outPath.foreach { p =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p), detail + "\n")
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] per-query file write failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
