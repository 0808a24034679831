package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration through spark.sql.extensions. Needs its
  * own session (extensions bind at build time), so this spec builds a
  * second SparkSession against the same local master.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_cosine callable from SQL via extensions") {
    // getOrCreate returns whatever session exists when suites share a
    // JVM, so config-time injection can't be asserted here; register
    // on a cloned session instead (the config path is exercised by
    // GraftExtensions.apply over the same inject calls).
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    try {
      GraftSession.tune(s2)
      Tables.embeddings(s2, Sf0001).limit(20)
        .createOrReplaceTempView("emb")
      val out = s2.sql(
        """SELECT a.vec_id, vec_cosine(a.embedding, a.embedding) AS c,
          |       vec_dot(a.embedding, a.embedding) AS d
          |FROM emb a""".stripMargin).collect()
      assert(out.length == 20)
      assert(out.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
      assert(out.forall(r => r.getDouble(2) > 0.0))
    } finally {
      // do not stop: getOrCreate may share the context with other suites
    }
  }

  test("text analysis family callable from SQL") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.documents(s2, Sf0001).limit(25).createOrReplaceTempView("docs_sql")
    val out = s2.sql(
      """SELECT doc_id,
        |       text_quality(text).n_tokens AS nt,
        |       lang_id(text) AS lang,
        |       text_fingerprint(text) AS fp,
        |       text_normalize(text) AS norm,
        |       size(text_shingle_hashes(text, 3)) AS nsh
        |FROM docs_sql""".stripMargin).collect()
    assert(out.length == 25)
    assert(out.forall(_.getInt(1) > 0))
    assert(out.forall(r => r.getString(2).nonEmpty))
    assert(out.forall(r => r.getLong(3) >= 0L))
    assert(out.forall(r => r.getString(4).nonEmpty))
    assert(out.forall(r => r.getInt(5) > 0))
  }

  test("vec_d2 and text_simhash callable from SQL") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.embeddings(s2, Sf0001).limit(5).createOrReplaceTempView("emb2")
    val d2 = s2.sql(
      "SELECT vec_d2(embedding, embedding) AS z FROM emb2").collect()
    assert(d2.forall(_.getDouble(0) == 0.0))
    Tables.documents(s2, Sf0001).limit(5).createOrReplaceTempView("docs2")
    val sh = s2.sql(
      "SELECT text_simhash(text) AS h FROM docs2").collect()
    assert(sh.forall(_.getLong(0) >= 0L))
  }

  test("z_value2 and weighted_priority callable from SQL, matching " +
      "the Scala column API") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.lineitem(s2, Sf0001).limit(50)
      .createOrReplaceTempView("li_ext")
    val sql = s2.sql(
      """SELECT z_value2(l_partkey, l_suppkey) AS z,
        |       weighted_priority(l_orderkey, l_extendedprice) AS p
        |FROM li_ext""".stripMargin).collect()
    val api = Tables.lineitem(s2, Sf0001).limit(50)
      .select(
        graft.operators.ZOrder.zValue2(
          org.apache.spark.sql.functions.col("l_partkey"),
          org.apache.spark.sql.functions.col("l_suppkey")).as("z"),
        graft.operators.Sampling.weightedPriority(
          org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_extendedprice")).as("p"))
      .collect()
    assert(sql.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      api.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("binary_cdc_chunks callable from SQL, matching the Scala API") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.documents(s2, Sf0001).limit(20)
      .createOrReplaceTempView("docs_cdc")
    val sql = s2.sql(
      """SELECT size(binary_cdc_chunks(encode(text, 'UTF-8'), 7, 61)) AS n
        |FROM docs_cdc""".stripMargin).collect().map(_.getInt(0)).toSeq
    val api = Tables.documents(s2, Sf0001).limit(20)
      .select(org.apache.spark.sql.functions.size(
        graft.expressions.BinaryCdcChunks(
          org.apache.spark.sql.functions.encode(
            org.apache.spark.sql.functions.col("text"), "UTF-8"),
          7, 61)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(sql == api && sql.sum > 20)
  }

  test("binary_shingle_hashes and jaro_winkler callable from SQL, " +
      "matching the Scala API") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.documents(s2, Sf0001).limit(20)
      .createOrReplaceTempView("docs_ext")
    val sql = s2.sql(
      """SELECT size(binary_shingle_hashes(encode(text, 'UTF-8'), 7, 4)) AS n,
        |       jaro_winkler(text, text) AS jw
        |FROM docs_ext""".stripMargin).collect()
    val api = Tables.documents(s2, Sf0001).limit(20)
      .select(
        org.apache.spark.sql.functions.size(
          graft.expressions.BinaryShingleHashes(
            org.apache.spark.sql.functions.encode(
              org.apache.spark.sql.functions.col("text"), "UTF-8"),
            7, 4)).as("n"),
        graft.expressions.JaroWinkler(
          org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.col("text")).as("jw"))
      .collect()
    assert(sql.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      api.map(r => (r.getInt(0), r.getDouble(1))).toSeq)
    assert(sql.forall(_.getDouble(1) == 1.0))
  }

  test("r9 kernels callable from SQL: minhash families, Aho-Corasick, " +
      "WAV PCM stats, Hilbert — values identical to the Column API") {
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    GraftSession.tune(s2)
    Tables.documents(s2, Sf0001).limit(15)
      .createOrReplaceTempView("docs_r9")
    val sql = s2.sql(
      """SELECT doc_id,
        |  minhash_sig(text_shingle_hashes(text, 3), 16) AS sig,
        |  one_perm_minhash(text_shingle_hashes(text, 3), 16) AS oph,
        |  aho_corasick_counts(text, 'batch batch,slow merge') AS ac,
        |  hilbert_value2(doc_id, doc_id + 7, 10) AS hv
        |FROM docs_r9 ORDER BY doc_id""".stripMargin).collect()
    // Column-API replay of the same four kernels
    val apiRows = Tables.documents(s2, Sf0001).limit(15)
      .select(col("doc_id"),
        graft.expressions.MinHashSig.ofHashes(
          graft.expressions.TextShingleHashes(col("text"), 3), 16).as("sig"),
        graft.expressions.OnePermMinHash.ofHashes(
          graft.expressions.TextShingleHashes(col("text"), 3), 16).as("oph"),
        graft.expressions.AhoCorasickCounts.of(col("text"),
          Seq("batch batch", "slow merge")).as("ac"),
        graft.operators.ZOrder.hilbertValue2(col("doc_id"),
          col("doc_id") + 7, 10).as("hv"))
      .orderBy("doc_id").collect()
    assert(sql.length == 15)
    sql.zip(apiRows).foreach { case (a, b) =>
      assert(a.getSeq[Long](1) === b.getSeq[Long](1))
      assert(a.getSeq[Long](2) === b.getSeq[Long](2))
      assert(a.getSeq[Long](3) === b.getSeq[Long](3))
      assert(a.getLong(4) === b.getLong(4))
    }
    // wav_pcm_stats over a literal canonical WAV (1 sample, value 2)
    val wav = "52494646" + "10000000" + "57415645" +
      "64617461" + "02000000" + "0200"
    val st = s2.sql(
      s"SELECT wav_pcm_stats(unhex('$wav')).sum_sq AS e").collect().head
    assert(st.getLong(0) === 4L)
  }
}
