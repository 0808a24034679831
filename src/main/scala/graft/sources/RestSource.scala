package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REST-feed source (SURVEY §2 S4/S5): the reference polls the
  * AccuWeather location-search and 12-hour-forecast endpoints
  * (dags/utils.py:153-196). The HTTP GET is inherently a driver-side
  * concern — one small JSON payload per poll — so the fetch happens on
  * the driver and the *parse* is a distributed scan over the landed
  * text (`CsvSources.forecastSchema` via a Dataset of one JSON
  * document). Retries with backoff stand in for the Airflow
  * `retries=2, retry_delay=1min` task policy (dags/DAG.py:19-20).
  *
  * `file:` URIs are read directly, which is what the offline tests
  * (and any replay/backfill from landed payloads) use.
  */
object RestSource {

  def fetchString(
      url: String,
      maxRetries: Int = 2,
      backoffMs: Long = 100): String = {
    val uri = URI.create(url)
    if (uri.getScheme == "file") {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(uri)), "UTF-8")
    } else {
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10)).build()
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofSeconds(30)).GET().build()
      var attempt = 0
      var last: Throwable = null
      while (attempt <= maxRetries) {
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 == 2) return resp.body()
          last = new RuntimeException(s"HTTP ${resp.statusCode()} from $url")
        } catch { case t: Throwable => last = t }
        attempt += 1
        if (attempt <= maxRetries) Thread.sleep(backoffMs * attempt)
      }
      throw last
    }
  }

  /** S5: fetch a forecast JSON document and parse it distributed with
    * the pinned schema.
    */
  def forecast(s: SparkSession, url: String): DataFrame = {
    import s.implicits._
    val payload = fetchString(url)
    s.read.schema(CsvSources.forecastSchema)
      .json(Seq(payload).toDS())
  }

  /** S4: location search → location key. The reference picks the
    * record whose EnglishName equals the query (dags/utils.py:160-168,
    * handling both a JSON array and a single object).
    */
  def locationKey(s: SparkSession, url: String, query: String): Option[String] = {
    import s.implicits._
    val payload = fetchString(url).trim
    val asArray = if (payload.startsWith("[")) payload else s"[$payload]"
    val df = s.read.json(Seq(asArray).toDS())
    if (!df.columns.contains("EnglishName") || !df.columns.contains("Key"))
      return None
    df.filter(org.apache.spark.sql.functions.col("EnglishName") === query)
      .select("Key").collect().headOption.map(_.getString(0))
  }
}
