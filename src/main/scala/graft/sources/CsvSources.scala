package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit-schema readers for the reference's file formats
  * (FIXTURES.md §1–4). The reference infers dtypes via pandas
  * (extract_from_raw_data.py:20,28; notebook cells 1,4); we pin
  * schemas so semantics can't drift (SURVEY §1.2).
  */
object CsvSources {

  /** KNMI hourly weather, header `# STN,YYYYMMDD,H,FH,T,RH,R`
    * (data/weatherdata2015.csv). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("STN", IntegerType),
    StructField("YYYYMMDD", IntegerType),
    StructField("H", IntegerType),
    StructField("FH", IntegerType),
    StructField("T", IntegerType),
    StructField("RH", IntegerType),
    StructField("R", IntegerType)))

  def weather(s: SparkSession, path: String): DataFrame =
    s.read.schema(weatherSchema).option("header", "true").csv(path)

  /** Hourly traffic counts, header `,Date,Hour,Count,longitude,latitude`
    * (data/TrafficCounts2015.csv; leading pandas index column). */
  val trafficSchema: StructType = StructType(Seq(
    StructField("idx", LongType),
    StructField("Date", StringType),
    StructField("Hour", IntegerType),
    StructField("Count", DoubleType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType)))

  def trafficCounts(s: SparkSession, path: String): DataFrame =
    s.read.schema(trafficSchema).option("header", "true").csv(path)
      .drop("idx")

  /** Raw traffic-flow files (`ind*`), two dialects
    * (extract_from_raw_data.py:20-31):
    *  A: comma-separated, `Datum` = yyyy-MM-dd;
    *  B: `;`-separated, `Long`/`Lat` strings with comma decimal marks,
    *     `Datum` = dd-MM-yyyy.
    * Read both as strings, normalize downstream (RawExtract).
    */
  val rawFlowSchemaA: StructType = StructType(Seq(
    StructField("Datum", StringType),
    StructField("Uur", IntegerType),
    StructField("Detector", DoubleType),
    StructField("Waarde", DoubleType)))

  val rawFlowSchemaB: StructType = StructType(Seq(
    StructField("Datum", StringType),
    StructField("Uur", IntegerType),
    StructField("Detector", DoubleType),
    StructField("Waarde", DoubleType),
    StructField("Long", StringType),
    StructField("Lat", StringType)))

  /** S2 dialect fallback: probe the header for `;` (one tiny driver-side
    * read of the first line — not a data-plane collect), then scan the
    * whole glob with the right reader. The reference retries per file
    * inside a Python loop; one schema-per-dialect scan keeps the read
    * distributed and vectorized.
    */
  def rawFlow(s: SparkSession, globPath: String): DataFrame = {
    val firstLine = s.read.text(globPath).limit(1)
      .collect().headOption.map(_.getString(0)).getOrElse("")
    if (firstLine.contains(";"))
      s.read.schema(rawFlowSchemaB).option("header", "true")
        .option("sep", ";").csv(globPath)
        .withColumn("file", input_file_name())
    else
      s.read.schema(rawFlowSchemaA).option("header", "true").csv(globPath)
        .withColumn("Long", lit(null: String))
        .withColumn("Lat", lit(null: String))
        .withColumn("file", input_file_name())
  }

  /** AccuWeather hourly-forecast JSON (dags/utils.py:177-192): array of
    * records; fields consumed are DateTime, Temperature.{Value,Unit},
    * Wind.Speed.Value, HasPrecipitation (F12 nested access).
    */
  val forecastSchema: StructType = StructType(Seq(
    StructField("DateTime", StringType),
    StructField("Temperature", StructType(Seq(
      StructField("Value", DoubleType),
      StructField("Unit", StringType)))),
    StructField("Wind", StructType(Seq(
      StructField("Speed", StructType(Seq(
        StructField("Value", DoubleType))))))),
    StructField("HasPrecipitation", BooleanType)))

  /** Read a forecast JSON document (file containing a JSON array, as the
    * API returns). S5: driver fetch lands the payload in a file/dir;
    * the parse itself is a distributed `from_json`-equivalent scan.
    */
  def forecastJson(s: SparkSession, path: String): DataFrame =
    s.read.schema(forecastSchema).option("multiLine", "true").json(path)
}
