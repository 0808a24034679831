package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{AhoCorasickCounts, BinaryCdcChunks, BinaryShingleHashes, JaroWinkler, LangId, MinHashSig, OnePermMinHash, TextFingerprint, TextNormalize, TextQuality, TextRepetition, TextShingleHashes, TextSimHash, VecCosine, VecD2, VecDot, WavPcmStats}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL callers and its planner strategy —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *
  * Per SURVEY §4, the reference itself needs NO custom planner
  * surface — every reference operator compiles to built-in Catalyst
  * constructs. The strategy below exists for a beyond-reference
  * operator (graft.plans.TopKPerGroup, heap-based top-k-per-group)
  * whose physical shape Spark's built-ins can't produce.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosine(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_d2"),
      new ExpressionInfo(classOf[VecD2].getName, "vec_d2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecD2(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("text_simhash"),
      new ExpressionInfo(classOf[TextSimHash].getName, "text_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextSimHash(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("text_repetition"),
      new ExpressionInfo(classOf[TextRepetition].getName, "text_repetition"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextRepetition(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("text_quality"),
      new ExpressionInfo(classOf[TextQuality].getName, "text_quality"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextQuality(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LangId(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("text_normalize"),
      new ExpressionInfo(classOf[TextNormalize].getName, "text_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextNormalize(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("text_fingerprint"),
      new ExpressionInfo(classOf[TextFingerprint].getName, "text_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextFingerprint(exprs(0))))
    e.injectFunction((
      // n-gram width comes in as a literal second argument:
      //   text_shingle_hashes(text, 3)
      new FunctionIdentifier("text_shingle_hashes"),
      new ExpressionInfo(classOf[TextShingleHashes].getName, "text_shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextShingleHashes(exprs(0), exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"text_shingle_hashes: n must be a literal int, got $other")
        })))
    e.injectFunction((
      // binary_shingle_hashes(payload, 8, 4): w and sampleMod as
      // literal ints (same convention as text_shingle_hashes)
      new FunctionIdentifier("binary_shingle_hashes"),
      new ExpressionInfo(classOf[BinaryShingleHashes].getName,
        "binary_shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"binary_shingle_hashes: $what must be a literal int, got $other")
        }
        BinaryShingleHashes(exprs(0), litInt(exprs(1), "w"),
          litInt(exprs(2), "sampleMod"))
      }))
    e.injectFunction((
      // binary_cdc_chunks(payload, 7, 61): w and maskMod literal ints
      new FunctionIdentifier("binary_cdc_chunks"),
      new ExpressionInfo(classOf[BinaryCdcChunks].getName,
        "binary_cdc_chunks"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"binary_cdc_chunks: $what must be a literal int, got $other")
        }
        BinaryCdcChunks(exprs(0), litInt(exprs(1), "w"),
          litInt(exprs(2), "maskMod"))
      }))
    e.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((
      // minhash_sig(hashes, 64): k as a literal int, seed fixed 42
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(exprs(0), GraftExtensions.litInt("minhash_sig", "k",
          exprs(1)), 42L)))
    e.injectFunction((
      // one_perm_minhash(hashes, 64): the OPH sibling, same contract
      new FunctionIdentifier("one_perm_minhash"),
      new ExpressionInfo(classOf[OnePermMinHash].getName,
        "one_perm_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        OnePermMinHash(exprs(0), GraftExtensions.litInt(
          "one_perm_minhash", "k", exprs(1)), 42L)))
    e.injectFunction((
      // aho_corasick_counts(text, 'p1,p2,...'): comma-separated
      // literal phrase list (commas inside phrases unsupported on the
      // SQL surface; use the Scala API for those)
      new FunctionIdentifier("aho_corasick_counts"),
      new ExpressionInfo(classOf[AhoCorasickCounts].getName,
        "aho_corasick_counts"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AhoCorasickCounts(exprs(0), GraftExtensions.litPatterns(exprs(1)))))
    e.injectFunction((
      new FunctionIdentifier("wav_pcm_stats"),
      new ExpressionInfo(classOf[WavPcmStats].getName, "wav_pcm_stats"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WavPcmStats(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("hilbert_value2"),
      new ExpressionInfo(graft.operators.ZOrder.getClass.getName,
        "hilbert_value2"),
      GraftExtensions.hilbertValue2Builder))
    e.injectFunction((
      new FunctionIdentifier("z_value2"),
      new ExpressionInfo(graft.operators.ZOrder.getClass.getName, "z_value2"),
      GraftExtensions.zValue2Builder))
    e.injectFunction((
      new FunctionIdentifier("weighted_priority"),
      new ExpressionInfo(graft.operators.Sampling.getClass.getName,
        "weighted_priority"),
      GraftExtensions.weightedPriorityBuilder))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Composed-Column functions (no single native Expression class —
    * the builder expands the same exact-integer column tree the Scala
    * API uses, so SQL callers get identical semantics and codegen).
    */
  private def requireArity(
      fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${exprs.length}")

  private[graft] def litInt(fn: String, what: String,
      e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a literal int, got $other")
  }

  /** Comma-separated literal phrase list for the AC SQL surface. */
  private[graft] def litPatterns(e: Expression): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.split(',').toSeq.filter(_.nonEmpty)
    case other => throw new IllegalArgumentException(
      s"aho_corasick_counts: patterns must be a literal string, got $other")
  }

  private[graft] val hilbertValue2Builder: Seq[Expression] => Expression =
    exprs => {
      requireArity("hilbert_value2", exprs, 3)
      GraftColumnBridge.toCatalystExpr(
        graft.operators.ZOrder.hilbertValue2(
          GraftColumnBridge.toColumn(exprs(0)),
          GraftColumnBridge.toColumn(exprs(1)),
          litInt("hilbert_value2", "bits", exprs(2))))
    }

  private[graft] val zValue2Builder: Seq[Expression] => Expression =
    exprs => {
      requireArity("z_value2", exprs, 2)
      GraftColumnBridge.toCatalystExpr(
        graft.operators.ZOrder.zValue2(
          GraftColumnBridge.toColumn(exprs(0)),
          GraftColumnBridge.toColumn(exprs(1))))
    }

  private[graft] val weightedPriorityBuilder: Seq[Expression] => Expression =
    exprs => {
      requireArity("weighted_priority", exprs, 2)
      GraftColumnBridge.toCatalystExpr(
        graft.operators.Sampling.weightedPriority(
          GraftColumnBridge.toColumn(exprs(0)),
          GraftColumnBridge.toColumn(exprs(1))))
    }

  /** Register on an already-built session (config-time injection only
    * works for sessions constructed with spark.sql.extensions set).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      exprs => VecCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_d2",
      exprs => VecD2(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("text_simhash",
      exprs => TextSimHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_repetition",
      exprs => TextRepetition(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_quality",
      exprs => TextQuality(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("lang_id",
      exprs => LangId(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_normalize",
      exprs => TextNormalize(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_fingerprint",
      exprs => TextFingerprint(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("text_shingle_hashes",
      exprs => TextShingleHashes(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"text_shingle_hashes: n must be a literal int, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction("binary_shingle_hashes",
      exprs => {
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"binary_shingle_hashes: $what must be a literal int, got $other")
        }
        BinaryShingleHashes(exprs(0), litInt(exprs(1), "w"),
          litInt(exprs(2), "sampleMod"))
      }, "built-in")
    reg.createOrReplaceTempFunction("binary_cdc_chunks",
      exprs => {
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"binary_cdc_chunks: $what must be a literal int, got $other")
        }
        BinaryCdcChunks(exprs(0), litInt(exprs(1), "w"),
          litInt(exprs(2), "maskMod"))
      }, "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("z_value2", zValue2Builder, "built-in")
    reg.createOrReplaceTempFunction("weighted_priority",
      weightedPriorityBuilder, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs(0),
        litInt("minhash_sig", "k", exprs(1)), 42L), "built-in")
    reg.createOrReplaceTempFunction("one_perm_minhash",
      exprs => OnePermMinHash(exprs(0),
        litInt("one_perm_minhash", "k", exprs(1)), 42L), "built-in")
    reg.createOrReplaceTempFunction("aho_corasick_counts",
      exprs => AhoCorasickCounts(exprs(0), litPatterns(exprs(1))),
      "built-in")
    reg.createOrReplaceTempFunction("wav_pcm_stats",
      exprs => WavPcmStats(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("hilbert_value2",
      hilbertValue2Builder, "built-in")
  }
}
