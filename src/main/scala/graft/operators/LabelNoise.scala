package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Confident-learning label-noise audit (Northcutt, Jiang & Chuang,
  * JAIR'21 "Confident Learning") — the labeled-data QA step of a
  * finetuning pipeline: given each example's ANNOTATED class and a
  * model's per-class probabilities, estimate the joint distribution
  * of (given label, true label) and surface the off-diagonal mass as
  * candidate annotation errors. This is how curation pipelines triage
  * crowd labels before SFT: rows whose confidently-predicted class
  * disagrees with the annotation go back to review, not into the mix.
  *
  * The CL recipe, exactly: per class j, a self-confidence threshold
  * t_j = mean prob_j over examples LABELED j; each example's
  * suggested class is argmax_j prob_j among classes with prob_j ≥
  * t_j (ties to the smaller class id; examples clearing no threshold
  * are unassigned and drop out — CL's abstention); the confident
  * joint is the (given, suggested) count matrix.
  *
  * Scale shape: thresholds are ONE map-side-combined conditional agg
  * (2·C buffers — C stays small; the wide-agg codegen cliff starts
  * ~80 buffers) broadcast back as a 1-row frame; classification is
  * map-only array arithmetic; the matrix agg shuffles ≤ C² keys.
  * The fact is scanned twice (thresholds, then classify) — the
  * two-pass floor of any data-dependent-threshold rule.
  *
  * Determinism: probabilities enter as INTEGER MICROS; thresholds
  * are floor divisions of exact long sums; eligibility and the
  * struct-ordered argmax are pure integer comparisons — the oracle
  * replays every threshold and every argmax, so a drifted mean, tie
  * order, or abstention rule hash-fails. A class with no labeled
  * examples has a NULL threshold and is never suggested (div by
  * nullif-0), mirrored in the oracle.
  *
  * Output: (given, suggested, n), given/suggested ∈ 0..C-1, one row
  * per non-empty confusion cell; off-diagonal rows are the flagged
  * mass.
  */
object LabelNoise {

  def confusionAudit(df: DataFrame, labelCol: Column,
      probsMicros: Seq[Column]): DataFrame = {
    val c = probsMicros.length
    require(c >= 2, s"need >= 2 classes, got $c")
    val base = df.select(
      (labelCol.cast("int").as("y") +: probsMicros.zipWithIndex.map {
        case (p, j) => p.cast("long").as(s"p$j")
      }): _*)
    // one conditional-agg scan: per class j, Σ prob_j and count over
    // examples labeled j
    val thrAggs = (0 until c).flatMap { j =>
      Seq(sum(when(col("y") === j, col(s"p$j"))).as(s"s$j"),
        count(when(col("y") === j, lit(1))).as(s"c$j"))
    }
    val thr = base.agg(thrAggs.head, thrAggs.tail: _*)
      .select((0 until c).map { j =>
        // floorDiv over nonneg sums; nullif keeps an unseen class out
        expr(s"s$j div nullif(c$j, 0)").as(s"t$j")
      }: _*)
    // map-side classify: argmax prob among threshold-clearing classes,
    // ties to the smaller class id via max over struct(p, -j)
    val cand = filter(
      array((0 until c).map { j =>
        struct(col(s"p$j").as("p"), lit(-j).as("nj"),
          (col(s"p$j") >= col(s"t$j")).as("e"))
      }: _*),
      s => s.getField("e"))
    val best = array_max(transform(cand,
      s => struct(s.getField("p").as("p"), s.getField("nj").as("nj"))))
    base.crossJoin(broadcast(thr))
      .select(col("y").as("given"), (-best.getField("nj")).as("suggested"))
      .filter(col("suggested").isNotNull)
      .groupBy("given", "suggested")
      .agg(count(lit(1)).as("n"))
  }

  /** Oracle rendering — identical thresholds, eligibility, and
    * struct-ordered argmax; `srcSql` yields (y, p0..p{c-1}) with
    * probs already integer micros. Ends at CTE `cl(given, suggested,
    * n)`.
    */
  def oracleSql(srcSql: String, c: Int): String = {
    val thrCols = (0 until c).map(j =>
      s"""CAST(SUM(CASE WHEN y = $j THEN p$j END) AS BIGINT)
         | // NULLIF(COUNT(CASE WHEN y = $j THEN 1 END), 0) AS t$j"""
        .stripMargin).mkString(",\n")
    val unpivot = (0 until c).map(j =>
      s"SELECT rid, y, $j AS j, p$j AS p, t$j AS t FROM rowsx")
      .mkString("\n UNION ALL ")
    s"""src AS ($srcSql),
       |rowsx AS (SELECT ROW_NUMBER() OVER () AS rid, src.*, th.*
       |          FROM src CROSS JOIN (SELECT $thrCols FROM src) th),
       |el AS (SELECT rid, y, j, p FROM ($unpivot) WHERE t IS NOT NULL AND p >= t),
       |pick AS (SELECT rid, y, j,
       |           ROW_NUMBER() OVER (PARTITION BY rid
       |                              ORDER BY p DESC, j ASC) AS rn
       |         FROM el),
       |cl AS (SELECT y AS given, j AS suggested, COUNT(*) AS n
       |       FROM pick WHERE rn = 1 GROUP BY 1, 2)""".stripMargin
  }
}
