package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session tuning + table access shared by every entry point.
  *
  * The reference pipeline (pandas/psycopg2) has lenient coercion
  * semantics: casts truncate toward zero, failed date parses yield
  * NaT, arithmetic never raises. Spark 4 defaults to ANSI mode which
  * raises instead; we pin the legacy behavior at runtime so operator
  * semantics match the reference (SURVEY.md §2 F3/F5/F7) and the
  * DuckDB oracle queries can express the same thing with TRUNC/
  * try_strptime.
  */
object GraftSession {

  /** ANSI override hook for the r13 forward-compat profile
    * (AnsiProfileSpec): tune() pins ansi=false — the catalog
    * contract — unless this JVM property asks for ANSI-on, letting
    * the identical catalog entries run under Spark's drifting
    * default so the entries that LEGITIMATELY require non-ANSI
    * semantics stay pinned by a test instead of discovered in an
    * upgrade.
    */
  val AnsiOverrideProp = "graft.ansi.override"

  /** Apply runtime confs we rely on. Safe to call repeatedly. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled",
      sys.props.getOrElse(AnsiOverrideProp, "false"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS); Spark's TimestampType is
    // micros. Read nanos as raw Long and convert explicitly (Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Builder for standalone mains/tests (local mode, 32 threads). */
  def local(app: String, cores: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
  }
}

/** Readers for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame   = read(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = read(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame   = read(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame   = read(s, dir, "region")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS). With nanosAsLong=true Spark
    * surfaces it as LongType (ns since epoch); normalize to an epoch-
    * seconds Long `ts_sec` plus a micros TimestampType `ts` so downstream
    * operators are precision-stable vs the DuckDB oracle (which keeps ns).
    * Query outputs must never emit raw timestamps — always DATE or epoch
    * seconds (see Queries.scala).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    GraftSession.tune(s)
    val df = read(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
      case _ =>
        df.withColumn("ts_ns", (unix_timestamp(col("ts")) * 1000000000L))
    }
  }
}
