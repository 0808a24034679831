package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.JaroWinkler

/** Blocked fuzzy record linkage (Fellegi–Sunter shape: block →
  * compare → classify) over a string key column.
  *
  * Scale design — the whole point of blocking:
  *  - The fact table first collapses to its DISTINCT name vocabulary
  *    (one map-side-combined agg). All pairwise work happens on that
  *    vocab table, which is metadata-sized relative to the fact
  *    (62 names for 200..600k part rows in the synthetic corpus; at
  *    100 TB a name/entity vocab is still ~millions, not billions).
  *  - MULTI-PASS blocking, the standard linkage practice: a
  *    candidate pair must share at least one blocking key. Two passes
  *    here — (k1) first character, favoring the Winkler prefix boost,
  *    and (k2) last whitespace token, catching shared-suffix families
  *    ('cold rod' / 'blue rod') that a prefix block misses. Each pass
  *    is an equi-join on its key (shuffle/broadcast on a vocab-sized
  *    table), never an all-pairs cross join.
  *  - Candidates dedup via `distinct` (a pair can match both passes),
  *    then the O(|a|·|b|) Jaro–Winkler verify (native codegen
  *    expression, expressions/JaroWinkler.scala) runs only on
  *    surviving candidates.
  *
  * A hot blocking key (every name starting with 's') grows one pass
  * quadratically in that block — bounded by the vocab size, not the
  * corpus; for billion-entity vocabs, cap per-block postings like
  * Dedup.DefaultMaxBucket caps MinHash bands.
  *
  * Engine parity: candidate generation is plain relational algebra
  * and the verify is DuckDB-exact (`jaro_winkler_similarity` — see
  * the expression's Scaladoc), so the linkage query rides the full
  * rows+schema+hash oracle gate.
  */
object RecordLinkage {

  private def lastToken(c: Column): Column = element_at(split(c, " "), -1)

  /** (name1, name2, jw) for every blocked distinct-value pair with
    * Jaro–Winkler ≥ `threshold`, name1 < name2.
    */
  def fuzzyNamePairs(
      df: DataFrame,
      nameCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(nameCol).as("name")).distinct()
      .withColumn("k1", substring(col("name"), 1, 1))
      .withColumn("k2", lastToken(col("name")))

    def pass(key: String): DataFrame =
      v.as("a").join(v.as("b"),
          col(s"a.$key") === col(s"b.$key") &&
            col("a.name") < col("b.name"))
        .select(col("a.name").as("name1"), col("b.name").as("name2"))

    pass("k1").union(pass("k2")).distinct()
      .withColumn("jw", JaroWinkler(col("name1"), col("name2")))
      .filter(col("jw") >= threshold)
  }

  /** Fellegi–Sunter match scoring (JASA 1969) over blocked candidate
    * pairs: per-field agreement contributes a CONFIGURED integer
    * milli-weight (+w_agree on agreement, w_disagree — typically
    * negative — otherwise), the pair's score is the exact sum, and
    * thresholds cut link / possible / non-link. Supplying weights as
    * config is the practitioner form of the log-likelihood ratios
    * log(m/u) — it is how production linkers are actually tuned, and
    * it keeps the whole decision integer-exact (no libm logs to
    * drift cross-engine). Map-only over the blocked pair table: at
    * 100 TB the blocking join bounds the pairs and the scoring adds
    * zero shuffles.
    */
  def fellegiSunter(
      pairs: DataFrame,
      fields: Seq[(Column, Long, Long)], // (agreement, wAgree, wDisagree)
      linkAt: Long,
      possibleAt: Long): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: at least one field")
    require(linkAt >= possibleAt, "fellegiSunter: linkAt < possibleAt")
    val score = fields.map { case (agree, wA, wD) =>
      when(agree, lit(wA)).otherwise(lit(wD))
    }.reduce(_ + _)
    pairs
      .withColumn("score_milli", score)
      .withColumn("decision",
        when(col("score_milli") >= linkAt, "link")
          .when(col("score_milli") >= possibleAt, "possible")
          .otherwise("nonlink"))
  }

  /** DuckDB oracle for `fuzzyNamePairs` (identical blocking passes,
    * identical JW threshold; caller appends projection/ORDER BY).
    */
  def fuzzyNamePairsOracleSql(
      table: String, nameCol: String, threshold: Double): String =
    s"""WITH v AS (
       |  SELECT DISTINCT $nameCol AS name,
       |         substr($nameCol, 1, 1) AS k1,
       |         list_extract(string_split($nameCol, ' '), -1) AS k2
       |  FROM $table),
       |cand AS (
       |  SELECT a.name AS name1, b.name AS name2
       |  FROM v a JOIN v b ON a.k1 = b.k1 AND a.name < b.name
       |  UNION
       |  SELECT a.name AS name1, b.name AS name2
       |  FROM v a JOIN v b ON a.k2 = b.k2 AND a.name < b.name)
       |SELECT name1, name2,
       |       jaro_winkler_similarity(name1, name2) AS jw
       |FROM cand
       |WHERE jaro_winkler_similarity(name1, name2) >= $threshold""".stripMargin
}
