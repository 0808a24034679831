package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.TextRepetition
import graft.operators.TextOps

/** Model-based document quality filter — the learned complement to the
  * rule CorpusGate: train a logistic regression on weakly-labeled
  * documents (a heuristic teacher labels the obvious extremes), then
  * score every document with a calibrated P(quality) that generalizes
  * past the teacher's exact thresholds. This is the classic
  * classifier-filter stage of an LLM data pipeline (a linear model
  * over cheap text statistics, fastText-style).
  *
  * Scale shape: featurization is map-only (the same single-pass
  * native expressions the rule gates use — no shuffle, no UDF);
  * training reduces a features×label aggregate per L-BFGS iteration
  * (MLlib treeAggregate — the standard distributed-GLM path); scoring
  * is a map-only dot product per row. The model artifact
  * saves/loads via the MLWritable path like every other model here.
  */
object QualityClassifier {

  /** Map-only feature vector per doc: quality stats + repetition
    * fractions + a length signal. All from single-pass native
    * expressions.
    */
  val FeatureCols: Seq[String] = Seq(
    "mean_token_len", "stopword_ratio", "punct_ratio",
    "top_2gram_frac", "dup_3gram_frac", "log_tokens")

  /** NaN/null-proof a ratio feature: empty or whitespace-only docs
    * yield 0/0 ratios, and an unguarded NaN would make the assembler
    * silently DROP the row — the scored output must keep every input
    * row, so degenerate docs get 0.0 (which the junk/clean teacher
    * rules both treat as "not evidence of quality").
    */
  private def guarded(c: Column): Column =
    when(c.isNull || isnan(c), lit(0.0)).otherwise(c)

  def featurize(docs: DataFrame, textCol: String): DataFrame = {
    val qf = TextOps.qualityFeatures(col(textCol))
    val rep = TextRepetition(col(textCol))
    val out = docs
      .withColumns(qf.toMap)
      .withColumn("top_2gram_frac", rep.getField("top_2gram_frac"))
      .withColumn("dup_3gram_frac", rep.getField("dup_3gram_frac"))
      .withColumn("log_tokens", log(col("n_tokens").cast("double") + lit(1.0)))
    FeatureCols.foldLeft(out)((d, f) => d.withColumn(f, guarded(col(f))))
  }

  /** Heuristic teacher: weak labels for the obvious extremes only
    * (NULL for the ambiguous middle — callers train on the labeled
    * subset). Clean prose: stopwords present, sane token lengths,
    * low repetition. Junk: repetition-heavy or punctuation soup or
    * stopword-free token noise.
    */
  def weakLabel(
      stopwordFloor: Double = 0.10,
      punctCeil: Double = 0.20,
      repCeil: Double = 0.30): Column = {
    val clean = col("stopword_ratio") >= stopwordFloor &&
      col("punct_ratio") <= punctCeil &&
      col("top_2gram_frac") <= repCeil && col("dup_3gram_frac") <= repCeil &&
      col("mean_token_len").between(2.0, 12.0)
    val junk = col("top_2gram_frac") > 2 * repCeil ||
      col("dup_3gram_frac") > 2 * repCeil ||
      col("punct_ratio") > 2 * punctCeil ||
      (col("stopword_ratio") === 0.0 && col("n_tokens") >= 10)
    when(junk, 0.0).when(clean, 1.0).otherwise(lit(null))
  }

  def pipeline(maxIter: Int = 50, regParam: Double = 1e-3): Pipeline = {
    // "error", not "skip": featurize() guarantees NaN-free features,
    // and an assembler that silently drops rows would break score()'s
    // every-row contract — fail loudly if the guarantee ever breaks
    val asm = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
      .setHandleInvalid("error")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
    new Pipeline().setStages(Array(asm, lr))
  }

  /** Train on the teacher's confident extremes of `docs`. */
  def train(docs: DataFrame, textCol: String): PipelineModel = {
    val labeled = featurize(docs, textCol)
      .withColumn("label", weakLabel())
      .filter(col("label").isNotNull)
    pipeline().fit(labeled)
  }

  /** Score every document: adds `p_quality` in [0,1]. Map-only. */
  def score(model: PipelineModel, docs: DataFrame,
      textCol: String): DataFrame =
    model.transform(featurize(docs, textCol))
      .withColumn("p_quality",
        org.apache.spark.ml.functions.vector_to_array(col("probability"))(1))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** Calibration report — the threshold-tuning table for the deployed
    * gate: equi-depth bins over p_quality (micro-quantized, so the
    * binning rides the exact selection path of Stats.equiDepthBins),
    * each bin reporting (n, mean predicted, observed positive rate)
    * against a reference label. A well-calibrated filter shows
    * obs_rate tracking mean_pred monotonically; divergence tells you
    * where the cut is safe. Scale: the binning never sorts the
    * corpus; the report is one map-side-combining agg over B rows.
    */
  def calibrationReport(scored: DataFrame, labelCol: String,
      bins: Int = 10): DataFrame = {
    val binned = graft.operators.Stats.equiDepthBins(
      scored.withColumn("__g", lit("all")),
      "__g", floor(col("p_quality") * 1000000), bins,
      keep = Seq(labelCol, "p_quality"))
    binned.groupBy("bin").agg(
        count(lit(1)).as("n"),
        avg("p_quality").as("mean_pred"),
        avg(labelCol).as("obs_rate"))
      .orderBy("bin")
  }
}
