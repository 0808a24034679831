package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dominant principal component by fixed-round power iteration —
  * distributed PCA without ever materializing the d×d covariance:
  * each round is one pass computing y = Σᵢ xcᵢ (xcᵢ·v) (the scatter-
  * matrix product Sv as a data-parallel sum of rank-1 actions), then
  * a driver-side normalize of the d-vector. The corpus never leaves
  * the executors; per round only `dim` longs reach the driver (the
  * house bounded-collect exception, same as the k-means model loop).
  *
  * This is the mean-centered analog of the randomized/iterative PCA
  * used for embedding-space whitening and ABTT ("All-but-the-top",
  * Mu & Viswanath, ICLR'18) common-direction removal — the embedding
  * post-processing step of a curation pipeline.
  *
  * Determinism (the oracle unrolls every round as CTEs and must match
  * bit-for-bit):
  *  - the mean rides [[Similarity.groupCentroids]] (exact long micros
  *    sums, floor integer division), re-inlined as a literal;
  *  - per-row arithmetic (centering, the xc·v fold, the ×1e6 scaling)
  *    is fixed-order IEEE double — identical in any engine;
  *  - every CROSS-ROW sum is an exact long sum of per-row floored
  *    micros (partition-order-free); y components re-enter double
  *    only through one /1e6 per dim;
  *  - the normalize folds Σy² left-to-right in dim order, so the
  *    driver's fold equals the oracle's list_reduce exactly.
  * Long capacity: |xc·v|·|xc| ≤ ~10³ ⇒ ≤10⁹ micros/row ⇒ exact past
  * 10⁹ rows; beyond that widen the sum to decimal (same shape).
  *
  * A zero round-vector (zero-variance corpus, or v exactly orthogonal
  * to the column space) keeps the previous v — deterministic, and the
  * oracle replays the same guard.
  *
  * Output: one row per dimension `d` with the unit PC1 component in
  * micros, the dominant scatter eigenvalue λ₁ in micros, and the
  * explained-variance ratio λ₁/trace(S) in micros (trace(S) =
  * Σᵢ‖xcᵢ‖², summed exactly in micros).
  */
object Pca {

  /** The fitted model: mean, unit PC1, dominant scatter eigenvalue,
    * and trace(S) — all at full double precision (every value is the
    * deterministic result of the replayable iteration, so downstream
    * consumers like [[removeTopComponent]] stay oracle-exact).
    */
  final case class Pc1Model(mu: Array[Double], v: Array[Double],
      lambda: Double, trace: Double)

  /** Fit PC1 (see object doc). Driver traffic per round: `dim` longs. */
  def fitPC1(vecs: DataFrame, vecCol: String, dim: Int,
      rounds: Int): Pc1Model = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val asD = vecs.select(col(vecCol).cast("array<double>").as("xv"))
    val mu = Similarity.groupCentroids(
        asD.withColumn("g", lit(1)), "g", "xv")
      .select("centroid").collect()(0).getSeq[Double](0).toArray
    require(mu.length == dim, s"dim=$dim but vectors have ${mu.length}")
    val cx = asD.select(
      zip_with(col("xv"), lit(mu), (a, b) => a - b).as("xc"))

    def dot(v: Array[Double]): Column =
      aggregate(zip_with(col("xc"), lit(v), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)

    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to rounds) {
      val ym = cx.withColumn("dot", dot(v))
        .select(posexplode(col("xc")).as(Seq("d", "xcd")), col("dot"))
        .groupBy("d")
        .agg(sum(floor(col("xcd") * col("dot") * lit(1e6)).cast("long"))
          .as("ym"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ys = Array.tabulate(dim)(d => ym.getOrElse(d, 0L) / 1e6)
      val norm = math.sqrt(ys.foldLeft(0.0)((a, y) => a + y * y))
      if (norm > 0.0) {
        v = ys.map(_ / norm)
        lambda = norm
      }
    }

    val trace = cx
      .select(floor(
        aggregate(col("xc"), lit(0.0), (acc, x) => acc + x * x) * lit(1e6))
        .cast("long").as("t2m"))
      .agg(sum("t2m")).collect()(0).getLong(0) / 1e6
    Pc1Model(mu, v, lambda, trace)
  }

  def powerIterationPC1(vecs: DataFrame, vecCol: String, dim: Int,
      rounds: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val m = fitPC1(vecs, vecCol, dim, rounds)
    val evr = if (m.trace > 0.0) m.lambda / m.trace else 0.0
    m.v.zipWithIndex.map { case (c, d) =>
      (d, math.floor(c * 1e6).toLong, math.floor(m.lambda * 1e6).toLong,
        math.floor(evr * 1e6).toLong)
    }.toSeq.toDF("d", "v_micros", "lambda_micros", "evr_micros")
  }

  /** All-but-the-top common-direction removal (Mu & Viswanath,
    * ICLR'18): re-express every embedding as xc = x − μ, then strip
    * its projection on the fitted PC1 — the post-processing that
    * measurably improves cosine-similarity quality on anisotropic
    * embedding spaces ("the top direction encodes frequency, not
    * meaning"). The model rides in as plan literals (dim-sized);
    * the correction itself is MAP-ONLY — no shuffle, no collect, the
    * 100 TB path is scan → project → sink. Output: idCol, `proj`
    * (the stripped coefficient xc·v), `corrected` (micros-floored
    * corrected vector, oracle-exact).
    */
  def removeTopComponent(vecs: DataFrame, idCol: String, vecCol: String,
      model: Pc1Model): DataFrame = {
    val xc = zip_with(col(vecCol).cast("array<double>"), lit(model.mu),
      (a, b) => a - b)
    val proj = aggregate(zip_with(xc, lit(model.v), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    vecs.select(col(idCol), xc.as("xc"), proj.as("proj"))
      .select(col(idCol), col("proj"),
        transform(zip_with(col("xc"), lit(model.v),
            (c, vd) => c - col("proj") * vd),
          x => floor(x * lit(1e6)).cast("long")).as("corrected"))
  }
}
