package graft

import org.apache.spark.sql.functions._

import graft.operators.PublicSuffix

/** PSL algorithm edge cases (the published publicsuffix.org spec)
  * and the operator's scale shape. The catalog-wide hash gate is
  * q_u_registrable_domain; this spec pins the rule-precedence corners
  * one host at a time so a failure names the broken rule class.
  */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def reg(hosts: String*): Seq[(String, String, Long)] =
    PublicSuffix.withRegistrableDomain(
        hosts.toDF("host"), "host")
      .select(col("host"), col("registrable_domain"),
        col("registrable_domain_ps_depth").cast("long"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
      .toSeq

  test("normal rules: single- and multi-label suffixes") {
    assert(reg("a.b.example.com") ==
      Seq(("a.b.example.com", "example.com", 1L)))
    assert(reg("sub.example.co.uk") ==
      Seq(("sub.example.co.uk", "example.co.uk", 2L)))
    assert(reg("example.co.uk") ==
      Seq(("example.co.uk", "example.co.uk", 2L)))
  }

  test("a host that IS a public suffix has no registrable domain") {
    assert(reg("co.uk") == Seq(("co.uk", null, 2L)))
    assert(reg("com") == Seq(("com", null, 1L)))
    assert(reg("github.io") == Seq(("github.io", null, 2L)))
  }

  test("wildcard consumes one extra label; exception overrides it") {
    // *.ck: anything.ck is itself a public suffix
    assert(reg("foo.bar.ck") == Seq(("foo.bar.ck", "foo.bar.ck", 2L)))
    assert(reg("bar.ck") == Seq(("bar.ck", null, 2L)))
    // !www.ck: exception wins over the wildcard -> suffix is just ck
    assert(reg("www.ck") == Seq(("www.ck", "www.ck", 1L)))
    assert(reg("a.www.ck") == Seq(("a.www.ck", "www.ck", 1L)))
    // *.kawasaki.jp with !city.kawasaki.jp (3-label rules)
    assert(reg("x.y.kawasaki.jp") ==
      Seq(("x.y.kawasaki.jp", "x.y.kawasaki.jp", 3L)))
    assert(reg("city.kawasaki.jp") ==
      Seq(("city.kawasaki.jp", "city.kawasaki.jp", 2L)))
    assert(reg("a.city.kawasaki.jp") ==
      Seq(("a.city.kawasaki.jp", "city.kawasaki.jp", 2L)))
  }

  test("private-section hoster: each customer subdomain is its own " +
      "registrable unit") {
    assert(reg("alice.github.io") ==
      Seq(("alice.github.io", "alice.github.io", 2L)))
    assert(reg("deep.a.alice.github.io") ==
      Seq(("deep.a.alice.github.io", "alice.github.io", 2L)))
    assert(reg("bucket.s3.amazonaws.com") ==
      Seq(("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com", 3L)))
  }

  test("unknown TLD takes the implicit * rule") {
    assert(reg("foo.bar.unknowntld") ==
      Seq(("foo.bar.unknowntld", "bar.unknowntld", 1L)))
    assert(reg("unknowntld") == Seq(("unknowntld", null, 1L)))
  }

  test("longest rule wins among normal rules (jp vs co.jp)") {
    assert(reg("a.example.co.jp") ==
      Seq(("a.example.co.jp", "example.co.jp", 2L)))
    // bare jp as TLD: example.jp registers directly under jp
    assert(reg("a.example.jp") == Seq(("a.example.jp", "example.jp", 1L)))
  }

  test("subdomain shards collapse to one cap key (the evasion the " +
      "host key misses)") {
    val shards = (0 until 6).map(i => s"sub$i.spam.co.uk")
    val out = reg(shards: _*)
    assert(out.map(_._2).distinct == Seq("spam.co.uk"))
  }

  test("scale shape: map-only — broadcast joins per depth, no " +
      "shuffle Exchange of the host stream") {
    val df = PublicSuffix.withRegistrableDomain(
      (0 until 100).map(i => s"s$i.example$i.co.uk").toDF("host"), "host")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    val shuffles = p.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("Broadcast") &&
        !l.contains("Reused")).toSeq
    assert(shuffles.isEmpty, s"unexpected shuffle:\n$p")
  }
}
