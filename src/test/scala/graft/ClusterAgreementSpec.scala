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
}
