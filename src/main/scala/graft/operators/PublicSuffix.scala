package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public-suffix-list registrable-domain extraction — the
  * crawl-curation key a domain cap actually needs. `UrlOps.host()`
  * stops at the hostname, so a spam site sharding across subdomains
  * (`sub1.spam.co.uk`, `sub2.spam.co.uk`, …) evades a host-keyed cap
  * entirely; the registrable domain (`spam.co.uk`) is the unit of
  * administrative control, and computing it needs the public suffix
  * list (publicsuffix.org) because "one label above the TLD" is
  * wrong for multi-label suffixes (`co.uk`), wildcard rules
  * (`*.ck`), and their exceptions (`!www.ck`).
  *
  * Algorithm (the published PSL spec): split the host into labels;
  * among all rules whose label sequence suffix-matches the host,
  * an EXCEPTION rule prevails (public suffix = the rule minus its
  * leading label), else the rule with the most labels (a wildcard
  * `*.foo` matches one extra arbitrary label); if nothing matches,
  * the implicit rule `*` makes the last label the public suffix.
  * The registrable domain is the public suffix plus one label; a
  * host that IS a public suffix has none (null).
  *
  * Spark rendering — scale-shaped for a corpus scan: the snapshot
  * is grouped by rule-key label depth into per-depth dimensions of
  * (key → norm/wild/exc flags), and the host stream takes ONE
  * broadcast left join per depth (3 with the pinned snapshot) on
  * its last-i-labels suffix, then a map-side coalesce/greatest picks
  * the prevailing rule. No shuffle of the corpus, no UDF, no
  * explode+regroup — the whole thing stays in one codegen stage,
  * and every step replays in the DuckDB oracle (the same snapshot
  * renders as a VALUES CTE via [[rulesSqlValues]]).
  *
  * The rule set is a PINNED SNAPSHOT SUBSET of the public suffix
  * list (upstream is a versioned external artifact; this subset
  * covers the major ICANN TLDs, the common multi-label registries,
  * the wildcard/exception families, and the big private-section
  * hosters). Swapping in the full artifact is a data change only:
  * replace [[rules]] (or load the published file into the same
  * three columns) — the join plan is depth-driven and grows only
  * with the deepest rule key.
  */
object PublicSuffix {

  /** Raw PSL-syntax rules (pinned snapshot subset; `*.` = wildcard,
    * `!` = exception, otherwise a normal rule).
    */
  val rules: Seq[String] = Seq(
    // generic + common country TLDs (single-label normal rules)
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "mobi", "app", "dev", "io", "ai", "co", "me", "tv", "cc",
    "xyz", "online", "site", "shop", "blog", "cloud", "us", "uk",
    "fr", "de", "nl", "es", "it", "pl", "ru", "jp", "cn", "au", "br",
    "in", "ca", "ch", "se", "no", "fi", "dk", "be", "at", "cz", "gr",
    "pt", "ro", "hu", "ie", "il", "kr", "mx", "ar", "cl", "nz", "za",
    "tr", "ua", "sg", "hk", "th", "my", "id", "ph", "vn", "eu",
    // multi-label registries
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "ac.uk", "gov.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "net.za", "org.za", "web.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.pl", "net.pl", "org.pl",
    "com.ua", "net.ua", "org.ua",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "com.ph", "com.vn", "co.th", "ac.th", "go.th",
    // wildcard rules and their exceptions
    "*.ck", "!www.ck",
    "*.bd", "*.np", "*.mm", "*.pg",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    // private-section hosters (each customer subdomain is its own
    // registrable unit — exactly what a domain cap must respect)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "pages.dev", "workers.dev", "s3.amazonaws.com")

  /** Parsed: (key labels joined by '.', #labels in key, kind). The
    * key of a wildcard rule is the part AFTER `*.` (the wildcard
    * consumes one extra host label at match time); the key of an
    * exception is the full rule (its public suffix is one label
    * shorter).
    */
  private[operators] val parsed: Seq[(String, Int, String)] = rules.map {
    case r if r.startsWith("*.") =>
      val k = r.drop(2); (k, k.count(_ == '.') + 1, "wild")
    case r if r.startsWith("!") =>
      val k = r.drop(1); (k, k.count(_ == '.') + 1, "exc")
    case r => (r, r.count(_ == '.') + 1, "norm")
  }

  /** Distinct rule-key depths present in the snapshot (ascending) —
    * one broadcast join each.
    */
  private[operators] val depths: Seq[Int] =
    parsed.map(_._2).distinct.sorted

  /** Append `<out>` (registrable domain, null when the host IS a
    * public suffix) and `<out>_ps_depth` (the matched public-suffix
    * label count — kept so callers/oracles can assert the rule that
    * fired) to `df`. Hosts are assumed lowercased hostnames
    * ([[UrlOps.host]] output); IP literals are out of contract (they
    * take the default rule like any unknown name).
    */
  def withRegistrableDomain(
      df: DataFrame,
      host: String,
      out: String = "registrable_domain"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val labels = split(col(host), "\\.")
    val n = size(labels)

    // one tiny dim per depth: key -> (norm?, wild?, exc?)
    val joined = depths.foldLeft(
      df.withColumn("__psl_labels", labels).withColumn("__psl_n", n)) {
      (acc, i) =>
        val dim = parsed.filter(_._2 == i)
          .groupBy(_._1).map { case (k, rs) =>
            (k, rs.exists(_._3 == "norm"), rs.exists(_._3 == "wild"),
              rs.exists(_._3 == "exc"))
          }.toSeq
          .toDF(s"__psl_key_$i", s"__psl_norm_$i", s"__psl_wild_$i",
            s"__psl_exc_$i")
        val cand = when(col("__psl_n") >= i,
          array_join(slice(col("__psl_labels"), -i, i), "."))
        val withCand = acc.withColumn(s"__psl_cand_$i", cand)
        withCand.join(broadcast(dim),
          withCand(s"__psl_cand_$i") === dim(s"__psl_key_$i"), "left")
    }

    // prevailing rule: exception first (most labels among them),
    // else most labels among normal/wildcard matches, else the
    // implicit `*` rule (depth 1). greatest() skips nulls.
    def g(cols: Seq[Column]): Column =
      if (cols.size == 1) cols.head else greatest(cols: _*)
    val excDepth = g(depths.map(i =>
      when(col(s"__psl_exc_$i") === true, lit(i - 1))))
    val ruleDepth = g(depths.flatMap(i => Seq(
      when(col(s"__psl_norm_$i") === true, lit(i)),
      when(col(s"__psl_wild_$i") === true && col("__psl_n") > i,
        lit(i + 1)))))
    val psDepth = coalesce(excDepth, ruleDepth, lit(1))

    val reg = when(col("__psl_n") > psDepth,
      array_join(
        slice(col("__psl_labels"), -(psDepth + lit(1)), psDepth + lit(1)),
        "."))

    val helper = Seq("__psl_labels", "__psl_n") ++
      depths.flatMap(i => Seq(s"__psl_cand_$i", s"__psl_key_$i",
        s"__psl_norm_$i", s"__psl_wild_$i", s"__psl_exc_$i"))
    joined
      .withColumn(out, reg)
      .withColumn(s"${out}_ps_depth", psDepth)
      .drop(helper: _*)
  }

  /** Column-only face when the input is already a DataFrame column
    * and the caller manages the join: not offered — the operator IS
    * the join; a scalar rendering would re-broadcast the table per
    * expression. Use [[withRegistrableDomain]].
    */

  /** The snapshot as a DuckDB VALUES CTE body
    * `(key, klabels, norm, wild, exc)` — the oracle replays the
    * SAME pinned rules, so a snapshot edit that isn't mirrored
    * hash-mismatches instead of silently passing.
    */
  def rulesSqlValues: String = {
    val grouped = parsed.groupBy(p => (p._1, p._2)).toSeq
      .map { case ((k, i), rs) =>
        val kinds = rs.map(_._3).toSet
        s"('$k', $i, ${kinds("norm")}, ${kinds("wild")}, ${kinds("exc")})"
      }.sorted
    grouped.mkString(",\n    ")
  }

  /** Max candidate depth for oracle-side suffix generation. */
  def maxDepth: Int = depths.max
}
