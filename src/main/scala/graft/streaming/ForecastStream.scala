package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.pipelines.ForecastServe
import graft.sinks.StarSchemaSink
import graft.sources.CsvSources

/** Structured-Streaming rendering of the 12-hourly poll (SURVEY §2
  * "streaming" row): the reference is a micro-batch pipeline with
  * overlapping 12-hour horizons, deduped by ON CONFLICT. Here a
  * landing directory of forecast JSON payloads is a streaming source;
  * `Trigger.AvailableNow` drains whatever has landed and stops —
  * exactly the scheduled-batch cadence — while `foreachBatch` reuses
  * the same idempotent anti-join sink, so overlapping horizons stay
  * exactly-once in the star schema even across restarts.
  */
object ForecastStream {

  /** Run one drain of the landing dir. Returns when all available
    * files are processed.
    */
  def runAvailableNow(
      s: SparkSession,
      landingDir: String,
      modelPath: String,
      warehouse: String,
      checkpointDir: String): Unit = {
    GraftSession.tune(s)
    StarSchemaSink.createTables(s, warehouse)
    val model: PipelineModel = graft.ml.TrafficModel.load(modelPath)

    val stream = s.readStream
      .schema(CsvSources.forecastSchema)
      .option("multiLine", "true")
      .json(landingDir)

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val forecast = ForecastServe
          .parseForecastFrame(batch)
          .cache()
        StarSchemaSink.idempotentAppend(
          s, warehouse, "weather",
          forecast.selectExpr("DateTime", "WindSpeed", "Temperature",
            "Precipitation"),
          naturalKeys = Seq("DateTime"))
        val preds = ForecastServe.score(model, ForecastServe.featureize(forecast))
        StarSchemaSink.appendTraffic(s, warehouse, preds)
        forecast.unpersist()
        ()
      }
      .start()
    query.awaitTermination()
  }
}
