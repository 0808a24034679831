package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier

/** Learned quality filter: the weak-label teacher marks only the
  * obvious extremes; the logistic regression must then separate a
  * held-out set of clean vs junk documents the teacher never saw
  * (including middle-ground cases near the teacher's thresholds).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val cleanSentences = Seq(
    "the weather in the city is mild and the streets are quiet today",
    "a small group of researchers published the results of the study",
    "it is often said that the best time to plant a tree was long ago",
    "the library on the corner opens early and closes late in summer",
    "many of the travelers chose to stay for an extra day by the lake",
    "the recipe calls for a cup of flour and a pinch of salt to start",
    "over the hills the river bends toward the old stone bridge again",
    "she wrote a long letter to her friend about the trip to the coast")

  private val junkDocs = Seq(
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "click here click here click here click here click here click here",
    "!!! $$$ ### @@@ %%% ^^^ &&& *** ((( ))) !!! $$$ ### @@@ %%% ^^^",
    "win win win win prize prize prize prize now now now now now now",
    "xjqzv kplmw qwrtz bnmvc xjqzv kplmw qwrtz bnmvc xjqzv kplmw qzzt",
    "aaaaaaaa bbbbbbbb cccccccc dddddddd aaaaaaaa bbbbbbbb cccccccc dd")

  test("trained filter separates held-out clean prose from junk") {
    // train on one half of each family, evaluate on the other half
    val trainDocs = (cleanSentences.take(4) ++ junkDocs.take(3))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val evalDocs = (cleanSentences.drop(4).map((_, 1.0))
      ++ junkDocs.drop(3).map((_, 0.0)))
      .zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "truth")

    val model = QualityClassifier.train(trainDocs, "text")
    val scored = QualityClassifier.score(model, evalDocs, "text")
      .select("doc_id", "truth", "p_quality").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

    // every held-out clean doc must outscore every held-out junk doc
    // (perfect ranking — AUC 1.0 on this margin), and the 0.5 cut
    // must classify all of them
    val cleanScores = scored.collect { case (1.0, p) => p }
    val junkScores = scored.collect { case (0.0, p) => p }
    assert(cleanScores.nonEmpty && junkScores.nonEmpty)
    assert(cleanScores.min > junkScores.max,
      s"clean ${cleanScores.toSeq} vs junk ${junkScores.toSeq}")
    assert(cleanScores.forall(_ > 0.5) && junkScores.forall(_ < 0.5),
      s"clean ${cleanScores.toSeq} vs junk ${junkScores.toSeq}")
  }

  test("calibration report: observed positive rate is monotone across " +
      "equi-depth score bins and pins the extremes on separable data") {
    val docs = (cleanSentences.map((_, 1.0)) ++ junkDocs.map((_, 0.0)))
      .zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "truth")
    val model = QualityClassifier.train(docs.select("doc_id", "text"), "text")
    val scored = QualityClassifier.score(model, docs, "text")
    val rep = QualityClassifier.calibrationReport(scored, "truth", bins = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(rep.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rep.map(_._2).sum == 14L) // every doc lands in exactly one bin
    val rates = rep.map(_._3).toSeq
    assert(rates.sliding(2).forall(w => w.head <= w.last), rates)
    assert(rates.head == 0.0 && rates.last == 1.0, rates)
  }

  test("weak labels only mark the confident extremes; model artifact " +
      "round-trips") {
    val docs = (cleanSentences ++ junkDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val labeled = QualityClassifier.featurize(docs, "text")
      .withColumn("label", QualityClassifier.weakLabel())
    val byLabel = labeled.groupBy("label").count().collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        r.getLong(1))).toMap
    assert(byLabel.getOrElse(Some(1.0), 0L) >= 6L) // most prose labeled clean
    assert(byLabel.getOrElse(Some(0.0), 0L) >= 4L) // most junk labeled junk

    val model = QualityClassifier.train(docs, "text")
    val dir = tmpDir("qc_model") + "/m"
    model.write.overwrite().save(dir)
    val back = PipelineModel.load(dir)
    val a = QualityClassifier.score(model, docs, "text")
      .select("doc_id", "p_quality").collect().map(r => r.getDouble(1)).toSeq
    val b = QualityClassifier.score(back, docs, "text")
      .select("doc_id", "p_quality").collect().map(r => r.getDouble(1)).toSeq
    assert(a == b)
  }
}
