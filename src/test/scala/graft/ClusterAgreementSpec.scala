package graft

import graft.operators.ClusterAgreement

/** ARI/Rand on hand-computed labelings: exact values, permutation
  * invariance, perfect agreement.
  */
class ClusterAgreementSpec extends SparkSpec {
  import spark.implicits._

  private def row(pairs: Seq[(String, String)]) =
    ClusterAgreement.ari(pairs.toDF("a", "b"), "a", "b").first()

  test("hand-computed 6-row example") {
    // A = [1,1,1,2,2,2], B = [1,1,2,2,2,2]:
    // n_ij = {(1,1):2,(1,2):1,(2,2):3} -> S_ij=4, S_a=6, S_b=7, C(6,2)=15
    // rand = (15+8-6-7)/15 = 2/3; ari = (4-2.8)/(6.5-2.8) = 1.2/3.7
    val r = row(Seq("1" -> "1", "1" -> "1", "1" -> "2",
      "2" -> "2", "2" -> "2", "2" -> "2"))
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("k_a") == 2 && r.getAs[Long]("k_b") == 2)
    assert(r.getAs[Double]("rand") == 0.666667)
    assert(r.getAs[Double]("ari") == 0.324324)
  }

  test("identical labelings score 1.0") {
    val r = row(Seq("x" -> "p", "x" -> "p", "y" -> "q", "z" -> "r"))
    assert(r.getAs[Double]("rand") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("label renaming does not change the score") {
    val base = Seq("1" -> "1", "1" -> "1", "1" -> "2",
      "2" -> "2", "2" -> "2", "2" -> "2")
    val renamed = base.map { case (a, b) => (a, if (b == "1") "Z" else "A") }
    assert(row(base).getAs[Double]("ari") == row(renamed).getAs[Double]("ari"))
  }

  private def kap(pairs: Seq[(String, String)]) =
    ClusterAgreement.cohenKappa(pairs.toDF("a", "b"), "a", "b").first()

  test("cohenKappa: textbook 2x2 fixture, exact ppm") {
    // cells: (0,0)=15 (1,1)=20 (0,1)=5 (1,0)=10 -> n=50, d=35
    // rows: a0=20, a1=30; cols: b0=25, b1=25; Σrc = 20·25+30·25 = 1250
    // po = 35/50 = 0.7; pe = 1250/2500 = 0.5; kappa = 0.2/0.5 = 0.4
    val pairs =
      Seq.fill(15)("0" -> "0") ++ Seq.fill(20)("1" -> "1") ++
      Seq.fill(5)("0" -> "1") ++ Seq.fill(10)("1" -> "0")
    val r = kap(pairs)
    assert(r.getAs[Long]("n") == 50 && r.getAs[Long]("d") == 35)
    assert(r.getAs[Long]("po_ppm") == 700000L)
    assert(r.getAs[Long]("pe_ppm") == 500000L)
    assert(r.getAs[Long]("kappa_ppm") == 400000L)
  }

  test("cohenKappa: perfect agreement is 1.0; chance-perfect margins " +
      "return 0; kappa is NOT label-permutation-invariant (ARI is)") {
    val perfect = kap(Seq("x" -> "x", "y" -> "y", "x" -> "x"))
    assert(perfect.getAs[Long]("kappa_ppm") == 1000000L)
    // one rater constant: n² = Σrc, convention 0 (not NaN/crash)
    val degen = kap(Seq("x" -> "p", "x" -> "q"))
    assert(degen.getAs[Long]("kappa_ppm") == 0L)
    // swapped labels on one side: same partition (ARI invariant) but
    // zero diagonal -> kappa goes negative (systematic disagreement)
    val swapped = kap(Seq("0" -> "1", "0" -> "1", "1" -> "0", "1" -> "0"))
    assert(swapped.getAs[Long]("kappa_ppm") < 0L)
  }
}
