package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.ScalarOps
import graft.sources.CsvSources

/** The raw-data extractor (SURVEY §3.3; data/extract_from_raw_data.py):
  * glob-scan `ind*` files → keep detector 1.2 → hourly mean of Waarde →
  * dual-format date parse → sort → stamp station coordinates.
  *
  * The reference loops file-by-file in pandas with a per-file
  * try/except for the `;` dialect; here the whole glob is one
  * distributed scan (dialect probed once), the mean is one partial+
  * final hash aggregate, and the coordinate "broadcast" (P4) is a
  * grand-aggregate cross join instead of a positional `df['lat'][0]`.
  * Implements the script's *intent* — the original has a latent frame-
  * accumulation bug (extract_from_raw_data.py:10,24,41).
  */
object RawExtract {

  val DetectorOfInterest = 1.2

  def extract(s: SparkSession, globPath: String): DataFrame = {
    GraftSession.tune(s)
    val raw = CsvSources.rawFlow(s, globPath)

    // P3 filter + A1 hourly mean (exact double-literal compare, like
    // pandas `data['Detector']==1.2`).
    val hourly = raw
      .filter(col("Detector") === DetectorOfInterest)
      .groupBy("Datum", "Uur")
      .agg(avg("Waarde").as("Count"))

    // F7 dual-format parse, then O1 sort. Keep Date as ISO string
    // (output parity with data/TrafficCounts2015.csv).
    val dated = hourly
      .withColumn("Date",
        date_format(ScalarOps.parseDateMulti(col("Datum")), "yyyy-MM-dd"))
      .withColumnRenamed("Uur", "Hour")
      .select("Date", "Hour", "Count")

    // P4/A3: stamp constant station coords. The reference takes row 0
    // of the last `;`-file; set-based rendering: F4 locale-parse the
    // coords where present, take the single distinct value.
    val coords = raw
      .filter(col("Long").isNotNull)
      .agg(
        first(ScalarOps.localeDouble(col("Long"))).as("longitude"),
        first(ScalarOps.localeDouble(col("Lat"))).as("latitude"))

    dated
      .crossJoin(broadcast(coords))
      .orderBy("Date", "Hour")
  }
}
