package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Drift, Expectations}
import graft.operators.Expectations.RowRule

/** CDC apply (arrival-order invariance, tombstone semantics),
  * expectations audit (planted violations + the one-scan plan
  * contract), and drift monitors (PSI/χ² zero on identical slices,
  * positive under a planted shift, finite on empty bins).
  */
class CdcExpectationsDriftSpec extends SparkSpec {
  import spark.implicits._

  // --- Cdc -------------------------------------------------------

  lazy val cdcLog = Seq(
    // key 1: upsert, upsert, delete, upsert  -> survives with v=40
    (1L, 1L, 100L, "U", 10.0),
    (1L, 2L, 101L, "U", 20.0),
    (1L, 3L, 102L, "D", 0.0),
    (1L, 4L, 103L, "U", 40.0),
    // key 2: upsert then delete -> tombstoned
    (2L, 1L, 200L, "U", 5.0),
    (2L, 2L, 201L, "D", 0.0),
    // key 3: same-seq tie broken by change id -> v=3.2 wins
    (3L, 7L, 300L, "U", 3.1),
    (3L, 7L, 301L, "U", 3.2))
    .toDF("k", "seq", "cid", "op", "v")

  private def applied(log: DataFrame): Set[(Long, Long, Long, Double, Long)] =
    Cdc.applyLatest(log, "k", Seq("seq", "cid"), "op", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
      .toSet

  test("applyLatest keeps last upsert, drops tombstoned keys, ties on id") {
    assert(applied(cdcLog) === Set(
      (1L, 4L, 103L, 40.0, 4L),
      (3L, 7L, 301L, 3.2, 2L)))
  }

  test("applyLatest is arrival-order invariant") {
    val shuffled = cdcLog.orderBy(rand(7)).repartition(5)
    assert(applied(shuffled) === applied(cdcLog))
  }

  test("a delete superseded by a later upsert does not tombstone") {
    val out = applied(cdcLog.filter(col("k") === 1L))
    assert(out.map(_._1) === Set(1L))
  }

  test("applyLatest plan is one aggregate: no window, no sort, no join") {
    val plan = Cdc.applyLatest(cdcLog, "k", Seq("seq", "cid"), "op", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  // --- Expectations ----------------------------------------------

  lazy val facts = Seq(
    (1L, 1, 10.0, "ok"),
    (1L, 2, -1.0, "ok"),   // r_neg violation
    (2L, 1, 5.0, null),    // r_null violation
    (2L, 1, 7.0, "ok"))    // pk duplicate (2,1)
    .toDF("k", "ln", "x", "tag")

  test("row rules count planted violations in one pass") {
    val out = Expectations.auditRows(facts, Seq(
        RowRule("r_neg", col("x") < 0),
        RowRule("r_null", col("tag").isNull)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("r_neg", 4L, 1L), ("r_null", 4L, 1L)))
  }

  test("N row rules share a single scan") {
    val rules = (1 to 6).map(i => RowRule(s"r$i", col("x") < i))
    val plan = Expectations.auditRows(facts, rules)
      .queryExecution.optimizedPlan.toString
    // one LocalRelation/scan leaf; no union of scans
    assert(!plan.contains("Union"), plan)
  }

  test("uniqueness rule counts every row of a duplicated key") {
    val out = Expectations.auditUnique(facts, "pk", Seq("k", "ln"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("pk", 4L, 2L)))
  }

  test("fk rule counts orphans") {
    val dim = Seq(1L).toDF("k")
    val out = Expectations.auditFk(facts, "k", dim, "k", "fk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("fk", 4L, 2L)))
  }

  // --- Drift -----------------------------------------------------

  lazy val refSlice = (1 to 100).map(i => (i % 10) + 1.0).toDF("x")

  test("PSI is zero between identical slices") {
    val out = Drift.psiNumeric(refSlice, refSlice, "x", 1.0, 11.0, 5)
      .select("psi_total").distinct().collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(0.0))
  }

  test("PSI registers a planted shift and stays finite on empty bins") {
    val cur = (1 to 100).map(i => (i % 3) + 1.0).toDF("x") // mass at 1..3
    val rows = Drift.psiNumeric(refSlice, cur, "x", 1.0, 11.0, 5).collect()
    val total = rows.head.getAs[Double]("psi_total")
    assert(total > 0.25, s"shifted slice must alarm, got $total")
    assert(rows.forall(r => !r.getAs[Double]("psi_bin").isNaN))
    assert(rows.forall(r => !r.getAs[Double]("psi_bin").isInfinite))
  }

  test("out-of-range values clamp into edge bins") {
    val cur = Seq(-100.0, 1000.0).toDF("x")
    val rows = Drift.psiNumeric(refSlice, cur, "x", 1.0, 11.0, 5)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_cur")))
      .toMap
    assert(rows(0L) === 1L && rows(4L) === 1L)
  }

  test("chi-squared is zero on identical slices, positive under drift") {
    val ref = Seq("a", "a", "b", "c").toDF("c")
    val zero = Drift.chiSquaredCategorical(ref, ref, "c")
      .select("chi2_total").distinct().collect().head.getDouble(0)
    assert(zero === 0.0)
    val cur = Seq("a", "b", "b", "b").toDF("c")
    val drift = Drift.chiSquaredCategorical(ref, cur, "c")
      .select("chi2_total").distinct().collect().head.getDouble(0)
    assert(drift > 0.0)
  }

  test("chi-squared pairs a NULL category present in both slices as " +
      "ONE row (null-safe join), and identical-with-nulls is zero") {
    val refN = Seq(Some("a"), Some("a"), None, None).toDF("c")
    val rows = Drift.chiSquaredCategorical(refN, refN, "c").collect()
    // one row per category including the null one — not two half-rows
    assert(rows.length === 2, rows.mkString("; "))
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("n_ref") === 2L)
    assert(nullRow.getAs[Long]("n_cur") === 2L)
    assert(rows.forall(_.getAs[Double]("chi2_cat") === 0.0))
  }

  test("emdFromCounts: identical distributions 0; a far shift scores " +
      "10x a near shift of the same mass (the distance PSI can't see)") {
    def emd(ref: Seq[Long], cur: Seq[Long]): Long = {
      val j = ref.indices.map(i => (i.toLong, ref(i), cur(i)))
        .toDF("bin", "n_ref", "n_cur")
      Drift.emdFromCounts(j).collect().head.getAs[Long]("emd_ppm_total")
    }
    // identical -> 0
    assert(emd(Seq(10L, 10, 10, 10), Seq(10L, 10, 10, 10)) == 0L)
    // same mass (10 of 40) moved: bin0->bin1 vs bin0->bin3.
    // near: CDF diff 0.25 at one boundary -> 250000 ppm
    // far: 0.25 at three boundaries -> 750000 ppm (3x)
    val near = emd(Seq(20L, 10, 5, 5), Seq(10L, 20, 5, 5))
    val far = emd(Seq(20L, 10, 5, 5), Seq(10L, 10, 5, 15))
    assert(near == 250000L, near)
    assert(far == 750000L, far)
    assert(far == 3 * near)
    // KS (sup-norm) can't tell them apart — both max out at 250000;
    // that contrast is why the cum table prices BOTH norms
    def ks(ref: Seq[Long], cur: Seq[Long]): Long = {
      val j = ref.indices.map(i => (i.toLong, ref(i), cur(i)))
        .toDF("bin", "n_ref", "n_cur")
      Drift.emdFromCounts(j).collect().head.getAs[Long]("ks_ppm_total")
    }
    assert(ks(Seq(20L, 10, 5, 5), Seq(10L, 20, 5, 5)) == 250000L)
    assert(ks(Seq(20L, 10, 5, 5), Seq(10L, 10, 5, 15)) == 250000L)
  }

  test("rankSumAuc: perfect separation AUC 1; hand-computed midrank " +
      "tie case 875000 ppm; symmetric swap complements to 1") {
    def auc(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
      val r = a.map(v => Tuple1(v)).toDF("x")
      val c = b.map(v => Tuple1(v)).toDF("x")
      val row = Drift.rankSumAuc(r, c, "x").collect().head
      (row.getAs[Long]("u2_cur"), row.getAs[Long]("auc_ppm"))
    }
    // B entirely above A: U = nA·nB = 9, AUC = 1
    assert(auc(Seq(1L, 2, 3), Seq(4L, 5, 6)) == ((18L, 1000000L)))
    // ties: A={1,2}, B={2,3}: midranks 1, 2.5, 2.5, 4 →
    // U_B = (2.5+4) − 3 = 3.5 → u2 = 7, AUC = 3.5/4 = 0.875
    assert(auc(Seq(1L, 2), Seq(2L, 3)) == ((7L, 875000L)))
    // antisymmetry: AUC(A,B) + AUC(B,A) = 1 (ties split evenly)
    val ab = auc(Seq(1L, 2), Seq(2L, 3))._2
    val ba = auc(Seq(2L, 3), Seq(1L, 2))._2
    assert(ab + ba == 1000000L, s"$ab + $ba")
  }
}
