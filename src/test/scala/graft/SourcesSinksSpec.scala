package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Introspect
import graft.sinks.PartitionedLake
import graft.sources.RestSource

/** REST source (S4/S5) against a loopback HTTP server + file://,
  * schema introspection (O4), and the partitioned lake (pruning
  * evidence in the scan plan).
  */
class SourcesSinksSpec extends SparkSpec {

  private def withServer(routes: Map[String, (Int, String)])(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (code, body)) =>
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("S5: forecast fetched over HTTP parses with the pinned schema") {
    val payload = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(resource("forecast_fixture.json"))), "UTF-8")
    withServer(Map("/forecast" -> (200, payload))) { base =>
      val df = RestSource.forecast(spark, s"$base/forecast")
      assert(df.count() == 12L)
      assert(df.schema("Temperature").dataType.isInstanceOf[StructType])
    }
  }

  test("S4: location search picks the exact EnglishName match") {
    val body =
      """[{"EnglishName":"Utrecht","Key":"249758"},
        |{"EnglishName":"Utrecht Heights","Key":"999"}]""".stripMargin
    withServer(Map("/loc" -> (200, body))) { base =>
      assert(RestSource.locationKey(spark, s"$base/loc", "Utrecht")
        .contains("249758"))
      assert(RestSource.locationKey(spark, s"$base/loc", "Nowhere").isEmpty)
    }
  }

  test("S4/S5: retry recovers after transient 5xx; file:// replays") {
    var calls = 0
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        calls += 1
        val (code, body) =
          if (calls < 3) (503, "busy") else (200, """[{"DateTime":"x"}]""")
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val got = RestSource.fetchString(
        s"http://127.0.0.1:${server.getAddress.getPort}/flaky",
        maxRetries = 2, backoffMs = 1)
      assert(got.contains("DateTime") && calls == 3)
    } finally server.stop(0)

    // file:// replay of a landed payload
    val got2 = RestSource.fetchString("file://" + resource("forecast_fixture.json"))
    assert(got2.trim.startsWith("["))
  }

  test("O4: dtype-driven column selection mirrors select_dtypes") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("a", IntegerType), StructField("b", LongType),
        StructField("c", BooleanType), StructField("d", StringType),
        StructField("e", DoubleType))))
    assert(Introspect.intCols(df) == Seq("a", "b"))
    assert(Introspect.boolCols(df) == Seq("c"))
    assert(Introspect.numericCols(df) == Seq("a", "b", "e"))
  }

  test("partitioned lake: date-range read prunes partitions in the scan") {
    val root = tmpDir("lake")
    PartitionedLake.write(
      Tables.orders(spark, Sf0001), root, "orders", "o_orderdate")
    val all = PartitionedLake.read(spark, root, "orders")
    assert(all.count() == Tables.orders(spark, Sf0001).count())

    val ranged = PartitionedLake.readRange(spark, root, "orders",
      "1995-01-01", "1995-03-31")
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"), plan)
    // partition count actually scanned is bounded by the date range
    val expected = Tables.orders(spark, Sf0001)
      .filter(to_date(col("o_orderdate")).between("1995-01-01", "1995-03-31"))
      .count()
    assert(ranged.count() == expected)
  }

  test("lake compaction bin-packs named partitions, leaves others untouched") {
    val root = tmpDir("lake-compact")
    val orders = Tables.orders(spark, Sf0001)
    // land the same table three times (three polls) → 3+ files/date
    (1 to 3).foreach { _ =>
      PartitionedLake.write(orders.limit(300), root, "orders", "o_orderdate")
    }
    def files(date: String) =
      new java.io.File(s"$root/orders/p_date=$date").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val dates = new java.io.File(s"$root/orders").listFiles()
      .filter(_.getName.startsWith("p_date=")).map(_.getName.drop(7)).sorted
    val (target, untouched) = (dates.head, dates.last)
    assert(files(target).size >= 3)
    val untouchedBefore = files(untouched)
    val rowsBefore = PartitionedLake.read(spark, root, "orders").count()

    PartitionedLake.compact(spark, root, "orders", Seq(target))

    assert(files(target).size == 1, files(target))
    assert(files(untouched) == untouchedBefore) // byte-identical dirs
    assert(PartitionedLake.read(spark, root, "orders").count() == rowsBefore)
  }

  test("lake upsert replaces matched keys, appends new, leaves other partitions byte-identical") {
    import spark.implicits._
    val root = tmpDir("lake_upsert")
    val base = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    PartitionedLake.write(base, root, "orders", "o_orderdate")

    // dirty = the best-populated date (the earliest dates can hold a
    // single order at this SF, starving the 3-victim fixture)
    val byCount = base.groupBy(to_date(col("o_orderdate")).as("d"))
      .count().orderBy(col("count").desc, col("d"))
      .select("d").as[java.sql.Date].collect()
    val (dirty, untouched) = (byCount.head, byCount.last)
    def files(d: java.sql.Date) =
      new java.io.File(s"$root/orders/p_date=$d").listFiles()
        .map(f => f.getName -> f.lastModified()).toMap
    val untouchedBefore = files(untouched)

    // batch: bump price for 3 existing keys of the dirty date + 1 new key
    val victims = base.filter(to_date(col("o_orderdate")) === lit(dirty))
      .limit(3).select("o_orderkey", "o_orderdate")
      .withColumn("o_totalprice", lit(-1.0))
    val fresh = Seq((999999999L, dirty.toString, -2.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    PartitionedLake.upsert(spark, root, "orders",
      victims.unionByName(fresh), "o_orderdate", Seq("o_orderkey"))

    val after = PartitionedLake.read(spark, root, "orders")
    assert(after.count() == base.count() + 1)
    assert(after.filter($"o_totalprice" === -1.0).count() == 3)
    assert(after.filter($"o_orderkey" === 999999999L).count() == 1)
    // the un-upserted rows of the dirty date survive unchanged
    val dirtyRows = after.filter($"p_date" === lit(dirty))
    val origDirty = base.filter(to_date(col("o_orderdate")) === lit(dirty))
    assert(dirtyRows.count() == origDirty.count() + 1)
    // other partitions were not rewritten
    assert(files(untouched) == untouchedBefore)
  }

  test("lake delete: doomed keys gone everywhere, emptied partition " +
      "directory removed, untouched partitions byte-identical") {
    import spark.implicits._
    val root = tmpDir("lake_delete")
    val base = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    PartitionedLake.write(base, root, "orders", "o_orderdate")

    val byCount = base.groupBy(to_date(col("o_orderdate")).as("d"))
      .count().orderBy(col("count").desc, col("d"))
      .select("d").as[java.sql.Date].collect()
    val (bigDate, wipeDate, untouched) =
      (byCount.head, byCount.last, byCount(byCount.length / 2))
    def files(d: java.sql.Date) =
      new java.io.File(s"$root/orders/p_date=$d").listFiles()
        .map(f => f.getName -> f.lastModified()).toMap
    val untouchedBefore = files(untouched)

    // victims: 2 keys from the populated date + EVERY key of wipeDate
    // (keys pinned driver-side: limit() is not stable across actions)
    val victims2 = base.filter(to_date(col("o_orderdate")) === lit(bigDate))
      .limit(2).select("o_orderkey").as[Long].collect().toSeq
      .toDF("o_orderkey")
    val wiped = base.filter(to_date(col("o_orderdate")) === lit(wipeDate))
      .select("o_orderkey")
    val nWiped = wiped.count()
    val (nDeleted, dirty) = PartitionedLake.delete(spark, root, "orders",
      victims2.unionByName(wiped), Seq("o_orderkey"))

    assert(nDeleted == nWiped + 2)
    assert(dirty.toSet == Set(bigDate.toString, wipeDate.toString))
    val after = PartitionedLake.read(spark, root, "orders")
    assert(after.count() == base.count() - nDeleted)
    val doomed = victims2.unionByName(wiped).as[Long].collect().toSet
    assert(after.filter(col("o_orderkey").isInCollection(doomed)).count() == 0)
    // the emptied partition's DIRECTORY is gone (compliance, not cosmetics)
    assert(!new java.io.File(s"$root/orders/p_date=$wipeDate").exists())
    // unrelated partitions were never rewritten
    assert(files(untouched) == untouchedBefore)
    // idempotent: deleting the same keys again touches nothing
    val (n2, d2) = PartitionedLake.delete(spark, root, "orders",
      victims2.unionByName(wiped), Seq("o_orderkey"))
    assert(n2 == 0L && d2.isEmpty)
  }

  test("format breadth: ORC round-trip is exact and pushes filters to the scan") {
    val dir = tmpDir("orc") + "/lineitem"
    val li = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("l_quantity") < 5).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(l_quantity,5"), plan.take(2000))
  }

  test("format breadth: JSON-lines round-trip with explicit schema") {
    import spark.implicits._
    val dir = tmpDir("jsonl") + "/docs"
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text", "lang")
    docs.write.mode("overwrite").json(dir)
    // explicit StructType — no inference pass over 100 TB of JSON
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // corrupt lines must not kill a 1000-executor job: PERMISSIVE null-row
    val mixed = dir + "_mixed"
    spark.read.text(dir).unionAll(
      Seq("{not json", "{\"doc_id\": \"noise\"}").toDF("value"))
      .write.mode("overwrite").text(mixed)
    val lenient = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(mixed)
    assert(lenient.filter(col("doc_id").isNotNull).count() == docs.count())
  }

  test("O4+: column profile counts nulls and distincts, stringifies " +
      "extrema across heterogeneous types") {
    import spark.implicits._
    import graft.operators.Introspect
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")),
      (3L, Option("a"))).toDF("id", "s")
    val p = Introspect.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("id") == ((4L, 4L, 3L, "1", "3")))
    assert(p("s") == ((4L, 3L, 2L, "a", "b"))) // null excluded everywhere
  }

  test("profileSketch: same report shape, HLL distincts within rel-err; " +
      "an all-null column profiles to 0, small cardinalities are exact") {
    import spark.implicits._
    import graft.operators.Introspect
    // small cardinalities sit in HLL's linear-counting regime → exact
    val df = Seq((1L, Option("a"), Option.empty[Long]),
      (2L, None, None), (3L, Option("b"), None), (3L, Option("a"), None))
      .toDF("id", "s", "dead")
    val p = Introspect.profileSketch(df, Seq("id", "s", "dead")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("id") == ((4L, 4L, 3L, "1", "3")))
    assert(p("s") == ((4L, 3L, 2L, "a", "b")))
    assert(p("dead")._2 == 0L && p("dead")._3 == 0L) // no melted rows at all
    // at real cardinality the estimate lands within the m=256 error
    // envelope (~6.5% theoretical; assert a slack 15%)
    val orders = Tables.orders(spark, Sf001)
    val est = Introspect.profileSketch(orders, Seq("o_custkey")).collect()
      .head.getLong(3)
    val exact = orders.select("o_custkey").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.15, s"$est vs $exact")
  }

  test("profileSketch: fractional/temporal distincts do NOT collapse " +
      "(1.1 vs 1.9 are two values, not one); unsupported types throw") {
    import spark.implicits._
    import graft.operators.Introspect
    val df = Seq((1.1, 100L), (1.9, 200L), (1.9, 300L))
      .toDF("d", "us")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("us")))
    val p = Introspect.profileSketch(df, Seq("d", "ts")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // the old long-cast surrogate collapsed 1.1 and 1.9 to 1 → est 1
    assert(p("d") == 2L, p)
    assert(p("ts") == 3L, p)
    val bad = df.withColumn("arr",
      org.apache.spark.sql.functions.array($"d"))
    val e = intercept[IllegalArgumentException] {
      Introspect.profileSketch(bad, Seq("arr"))
    }
    assert(e.getMessage.contains("unsupported column type"))
  }

  test("incremental aggregate merge: N deltas == full recompute " +
      "exactly; a tiny delta rewrites only its hash buckets") {
    import spark.implicits._
    val root = tmpDir("lake_ivm")
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    def cents = (col("value").cast("decimal(12,2)") * 100).cast("long")
    // three append-only delta batches
    for (i <- 0 until 3)
      PartitionedLake.mergeAdditive(spark, root, "agg",
        ev.filter(col("event_id") % 3 === i), "user_id", cents, nBuckets = 8)
    val got = PartitionedLake.read(spark, root, "agg")
      .select("user_id", "n", "sum_cents").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = ev.withColumn("__v", cents).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("__v").as("s")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == full) // additive integer merge ≡ one-shot recompute

    // a single-user delta must rewrite only that user's bucket
    val oneUser = got.keySet.head
    val bucket = graft.operators.Sampling.hashBucket(lit(oneUser), 8)
    val bucketId = ev.sparkSession.range(1).select(bucket).first().getLong(0)
    def files(b: Long) = {
      val d = new java.io.File(s"$root/agg/p_bucket=$b")
      if (d.exists()) d.listFiles().map(f => f.getName -> f.lastModified()).toMap
      else Map.empty[String, Long]
    }
    val before = (0L until 8L).map(b => b -> files(b)).toMap
    PartitionedLake.mergeAdditive(spark, root, "agg",
      Seq((oneUser, 1.00)).toDF("user_id", "value"), "user_id", cents,
      nBuckets = 8)
    for (b <- 0L until 8L; if b != bucketId)
      assert(files(b) == before(b), s"bucket $b rewritten")
    val after = PartitionedLake.read(spark, root, "agg")
      .filter(col("user_id") === oneUser)
      .select("n", "sum_cents").first()
    assert(after.getLong(0) == full(oneUser)._1 + 1)
    assert(after.getLong(1) == full(oneUser)._2 + 100)
  }

  test("schema evolution: mergeSchema reads mixed-generation parquet " +
      "shards, null-filling the column old shards predate") {
    import spark.implicits._
    val root = tmpDir("evolve")
    // gen1 shards written before the `score` column existed
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(root + "/gen=1")
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(root + "/gen=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(root + "/gen=1", root + "/gen=2")
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq == Seq(1L -> None, 2L -> None,
      3L -> Some(0.5), 4L -> Some(0.9)))
    // the logical-plan rendering of the same merge (unionByName with
    // null fill) agrees row-for-row with the file-level mergeSchema
    val viaUnion = spark.read.parquet(root + "/gen=1")
      .unionByName(spark.read.parquet(root + "/gen=2"),
        allowMissingColumns = true)
    assert(viaUnion.exceptAll(merged).isEmpty &&
      merged.exceptAll(viaUnion).isEmpty)
  }
}
