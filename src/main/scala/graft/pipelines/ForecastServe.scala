package graft.pipelines

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{NLHolidays, ScalarOps}
import graft.ml.TrafficModel
import graft.sinks.StarSchemaSink
import graft.sources.CsvSources

/** The serving DAG (SURVEY §3.2; dags/DAG.py + dags/utils.py): every
  * 12 h, pull the 12-hour hourly forecast, featureize, score with the
  * persisted model, and load the star schema idempotently.
  *
  * Differences from the reference, by design:
  *  - the forecast payload is fetched ONCE and cached — the reference
  *    re-fetches the API between the weather and traffic tasks
  *    (dags/utils.py:204 vs :226), a correctness hazard it documents;
  *  - loads are set-based (anti-join) instead of per-row
  *    INSERT ... ON CONFLICT with one commit per row.
  *
  * The HTTP GET itself (S4/S5) is a driver-side concern; this module
  * takes the landed JSON path (file or landing dir) as input, which is
  * also what the streaming variant consumes.
  */
object ForecastServe {

  /** S5+F5/F6/F12: forecast JSON → typed hourly frame with the exact
    * transform chain of dags/utils.py:180-194.
    */
  def parseForecast(s: SparkSession, jsonPath: String): DataFrame = {
    GraftSession.tune(s)
    parseForecastFrame(CsvSources.forecastJson(s, jsonPath))
  }

  /** Same transform over an already-loaded frame (batch of the
    * streaming source shares this path).
    *
    * The stored DateTime is the UTC instant (Postgres TIMESTAMPTZ
    * parity, dags/utils.py:102,211); the calendar features use the
    * *local wall-clock* components of the ISO string — pandas keeps
    * the `+01:00` offset and `.hour` is the local hour
    * (dags/utils.py:191,240), so `hour()` of the UTC instant would be
    * off by the offset.
    */
  def parseForecastFrame(raw: DataFrame): DataFrame =
    raw.filter(col("DateTime").isNotNull).select(
      to_timestamp(col("DateTime")).as("DateTime"), // ISO8601 with offset
      to_date(substring(col("DateTime"), 1, 10)).as("LocalDate"),
      substring(col("DateTime"), 12, 2).cast("int").as("LocalHour"),
      ScalarOps.normalizeTemp(
        col("Temperature.Value"), col("Temperature.Unit"))
        .as("Temperature"), // F6: F→C only when Unit='F'
      col("Wind.Speed.Value").cast("int").as("WindSpeed"), // F12
      col("HasPrecipitation").as("Precipitation")) // F11

  /** dags/utils.py:236-245: featureize the forecast rows for scoring
    * (same 8-feature shape as training; F9 weekday shim; holiday set
    * computed, not hard-coded like the reference's 2022 list).
    */
  def featureize(forecast: DataFrame): DataFrame = {
    val holidaySet = NLHolidays.isoStrings(1990, 2035)
    forecast
      .withColumn("Month", month(col("LocalDate")))
      .withColumn("Day", dayofmonth(col("LocalDate")))
      .withColumn("Hour", col("LocalHour"))
      .withColumn("DayofWeek", ScalarOps.weekdayMon0(col("LocalDate")))
      .withColumn("isHoliday",
        ScalarOps.inDateList(col("LocalDate"), holidaySet))
      .withColumnRenamed("WindSpeed", "Wind Speed")
  }

  /** Score + F13 rescale: Intensity = int(prediction * 10)
    * (dags/utils.py:247,273).
    */
  def score(model: PipelineModel, featureized: DataFrame): DataFrame =
    TrafficModel.predict(model, featureized)
      .select(
        col("DateTime"),
        ScalarOps.rescalePrediction(col("prediction")).as("Intensity"))

  /** One full DAG run: create tables → weather append (K2) → predict →
    * traffic append with FK resolution (K3). Returns (weather rows
    * appended, traffic rows appended); a re-run with the same payload
    * appends (0, 0) — ON CONFLICT parity.
    */
  def run(
      s: SparkSession,
      jsonPath: String,
      modelPath: String,
      warehouse: String): (Long, Long) = {
    val forecast = parseForecast(s, jsonPath).cache() // fetch once, feed both
    StarSchemaSink.createTables(s, warehouse)

    val nWeather = StarSchemaSink.idempotentAppend(
      s, warehouse, "weather",
      forecast.select("DateTime", "WindSpeed", "Temperature", "Precipitation"),
      naturalKeys = Seq("DateTime"))

    val model = TrafficModel.load(modelPath)
    val preds = score(model, featureize(forecast))
    val nTraffic = StarSchemaSink.appendTraffic(s, warehouse, preds)
    forecast.unpersist()
    (nWeather, nTraffic)
  }
}
