package graft

import org.apache.spark.sql.DataFrame

/** ANSI-mode forward-compatibility profile (r13, VERDICT ask #6).
  *
  * GraftSession.tune pins `spark.sql.ansi.enabled=false` because the
  * reference's coercion semantics (truncating casts, null-on-bad-
  * parse) are non-ANSI — but Spark's DEFAULT is ANSI-on and drifting.
  * This suite runs every batch catalog entry at sf0.001 under BOTH
  * profiles and compares results value-exactly, so the set of entries
  * that legitimately require non-ANSI semantics is PINNED
  * ([[nonAnsiPinned]], with the per-entry reason) instead of being
  * discovered during a Spark upgrade. Any entry outside that list
  * that throws or diverges under ANSI is a regression — fix it with
  * try_cast / explicit expressions or pin it with a reason.
  *
  * Streaming readbacks and the timed serve pipeline are skipped: each
  * drains a real stream (minutes of wall per profile) and their
  * arithmetic faces are the batch twins already covered here.
  */
class AnsiProfileSpec extends SparkSpec {

  /** Entries whose CONTRACT is non-ANSI — each with the exact
    * mechanism. Under ANSI these may throw or change values; the
    * profile documents them rather than chasing a lenient rendering
    * that would no longer match the reference's semantics.
    */
  val nonAnsiPinned: Map[String, String] = Map(
    "q_f_scalar_parity" ->
      ("F3/F5/F6/F13 truncating double->int casts (ANSI raises on " +
        "overflow and rejects fractional-to-int narrowing semantics)"),
    "q_f3_trunc_cast" ->
      "F3 contract: (v*0.1).cast(int) truncates like pandas .astype(int)",
    "q_f5_fahrenheit_to_celsius" ->
      "F5 contract: ((f-32)*5/9).cast(int) truncating",
    "q_pipe_end2end" ->
      "composes the F3/F5 scalar stages end-to-end",
    "q_pipe_serve_latency" ->
      "composes normalizeTemp/rescalePrediction (F5/F13 casts)")

  /** Skipped: stream drains (minutes each; batch twins covered) and
    * entries whose fn mutates external state in ways a double run
    * inside one JVM would interleave.
    */
  val skip: Set[String] = Set(
    "q_stream_dedup_readback", "q_stream_concatcut_readback",
    "q_stream_scd2_readback", "q_stream_domaincap_readback",
    "q_stream_celldensity_readback", "q_stream_ewma_readback",
    "q_stream_holt_readback", "q_stream_drift_readback",
    "q_stream_expectations_readback", "q_stream_winsorize_readback",
    "q_stream_trend_readback", "q_stream_calibration_readback",
    "q_stream_survival_readback", "q_stream_cdc_readback",
    "q_stream_diversity_readback", "q_stream_join_readback",
    "q_stream_bottomk_readback", "q_stream_acf_readback",
    "q_stream_emd_readback", "q_stream_embdrift_readback",
    "q_stream_hll_readback",
    "q_pipe_serve_latency", "q_k_star_readback")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .sorted.toSeq
  }

  private def runMode(sp: QSpec, ansi: Boolean): Either[String, Seq[String]] = {
    if (ansi) sys.props(GraftSession.AnsiOverrideProp) = "true"
    else sys.props.remove(GraftSession.AnsiOverrideProp)
    try Right(canon(sp.fn(spark, Sf0001)))
    catch { case e: Throwable =>
      Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
    } finally {
      sys.props.remove(GraftSession.AnsiOverrideProp)
      GraftSession.tune(spark)
    }
  }

  test("every non-pinned catalog entry is ANSI-clean (sf0.001)") {
    val entries = Queries.specs.filterNot(sp => skip(sp.name))
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    var pinnedDivergent = 0
    entries.foreach { sp =>
      val off = runMode(sp, ansi = false)
      val on = runMode(sp, ansi = true)
      (off, on) match {
        case (Right(a), Right(b)) if a == b =>
          if (nonAnsiPinned.contains(sp.name))
            info(s"pinned ${sp.name} agreed at this fixture (pin kept: " +
              "the mechanism is input-dependent)")
        case (Right(_), Right(_)) =>
          if (nonAnsiPinned.contains(sp.name)) pinnedDivergent += 1
          else bad += s"${sp.name}: VALUES DIVERGE under ANSI"
        case (Right(_), Left(err)) =>
          if (nonAnsiPinned.contains(sp.name)) pinnedDivergent += 1
          else bad += s"${sp.name}: THROWS under ANSI: $err"
        case (Left(err), _) =>
          bad += s"${sp.name}: fails under the CATALOG profile: $err"
      }
    }
    info(s"${entries.size} entries compared; " +
      s"${nonAnsiPinned.size} pinned non-ANSI ($pinnedDivergent " +
      "divergent at this fixture)")
    assert(bad.isEmpty, "ANSI regressions:\n" + bad.mkString("\n"))
  }
}
